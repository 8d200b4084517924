"""End-to-end serving ingest benchmark: pipelined vs serial npz loading.

Measures ZeroShotClassifier.infer (threaded Loader + one-deep device
pipeline) against the reference-style serial loop (load → forward → read
per batch, zero_shot.py:528-611 semantics) on REAL npz decompress IO at
production shape.  Usage:

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_pipelined_ingest.py

Knobs: INGEST_N (volumes, default 16), INGEST_WORKERS (default 4).
"""

import os
import tempfile
import time

import numpy as np


class NpzInferenceDataset:
    """CTReportInferenceDataset shape-twin over a flat npz dir: same item
    dict, same np.load + runtime crop/pad host cost."""

    def __init__(self, paths):
        self.paths = paths

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from vit_exp_tpu.data.preprocess_host import (
            load_npz_volume, runtime_volume,
        )

        return {
            "image": runtime_volume(load_npz_volume(self.paths[i])),
            "onehot": np.zeros(18, np.float32),
            "accession": os.path.basename(self.paths[i]),
        }


def main():
    import jax
    import flax.linen as nn

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.data.tokenizer import HashTokenizer
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip

    assert jax.default_backend() == "tpu"
    n = int(os.environ.get("INGEST_N", "16"))
    workers = int(os.environ.get("INGEST_WORKERS", "4"))

    arch = {
        "dim": 768, "image_size": 480, "patch_size": 20,
        "temporal_size": 240, "temporal_patch_size": 10,
        "transformer_blocks": 8, "dim_head": 32, "heads": 8,
    }
    config = ExperimentConfig.from_dict({"arch": arch})
    bert_cfg = BertConfig()
    model = build_ctclip(config, bert_config=bert_cfg,
                         attn_impl="pallas_static_int8",
                         ff_impl="pallas_int8", fuse_qkv=True)

    # stored-shape volumes (pre-runtime-crop), realistic npz inflate cost;
    # INGEST_DIR reuses a previous run's files (writing them takes ~10 min)
    tmp = os.environ.get("INGEST_DIR") or tempfile.mkdtemp(
        prefix="ingest_bench_")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    t0 = time.perf_counter()
    for i in range(n):
        p = os.path.join(tmp, f"vol{i}.npz")
        if not os.path.exists(p):
            vol = rng.standard_normal((220, 420, 420)).astype(np.float32)
            np.savez_compressed(p, arr_0=vol)
        paths.append(p)
    print(f"{n} npz volumes ready in {time.perf_counter() - t0:.0f}s "
          f"({os.path.getsize(paths[0]) / 1e6:.0f} MB each)", flush=True)
    ds = NpzInferenceDataset(paths)

    tok = HashTokenizer(vocab_size=bert_cfg.vocab_size)
    video1 = np.zeros((1, 1, 240, 480, 480), np.float32)
    import jax.numpy as jnp

    params = nn.unbox(model.init(
        jax.random.PRNGKey(0), jnp.asarray(video1),
        jnp.zeros((1, 512), jnp.int32), jnp.ones((1, 512), jnp.int32),
    ))["params"]
    engine = ZeroShotClassifier(model, params, tok, batch_size=4)
    engine.prepare()

    # warm the compile cache with one pass, then EQUALIZE the page cache
    # before either timed pass: whichever variant runs first would
    # otherwise absorb all the cold npz reads and hand the second a
    # cache-warm advantage (both timed passes below measure warm-cache
    # decode+dispatch, which is the steady-state regime anyway)
    engine.predict_batch(np.repeat(ds[0]["image"][None], 4, axis=0))
    for i in range(len(ds)):
        ds[i]

    def run_serial():
        # serial reference-style loop: load batch → forward → host read
        t0 = time.perf_counter()
        batch = []
        for i in range(len(ds)):
            batch.append(ds[i]["image"])
            if len(batch) == 4:
                engine.predict_batch(np.stack(batch))
                batch.clear()
        if batch:
            stack = np.stack(batch)
            pad = 4 - len(batch)
            stack = np.concatenate([stack, np.repeat(stack[-1:], pad, 0)])
            engine.predict_batch(stack)
        return time.perf_counter() - t0

    def run_piped():
        t0 = time.perf_counter()
        engine.infer(ds, num_workers=workers)
        return time.perf_counter() - t0

    serial = run_serial()
    piped = run_piped()

    print(f"serial   : {serial:6.1f}s  ({n / serial:5.2f} vol/s)")
    print(f"pipelined: {piped:6.1f}s  ({n / piped:5.2f} vol/s)  "
          f"[{workers} workers, {serial / piped:.2f}x]")
    if not os.environ.get("INGEST_DIR"):
        for p in paths:
            os.unlink(p)


if __name__ == "__main__":
    main()

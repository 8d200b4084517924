"""Zero-shot classification / segmentation engines.

Parity with scripts/zero_shot.py:
- 18 CT-RATE pathologies, two prompts each, "{p} is present."/"{p} is not
  present." (zero_shot.py:482-487);
- the FAST engine semantics (CTClipInferenceFast, zero_shot.py:387-627):
  36 text latents embedded ONCE per run; ONE image encode per volume; the
  pairwise score is softmax([present, absent]) over cosine×exp(temp);
- results: per-label AUROC via eval/metrics.evaluate_internal, plus raw
  predicted/labels arrays and accession list for offline artifacts.

TPU-first differences: volumes are scored in BATCHES inside one jitted
program (encode → project → 36 scores → 18 softmax pairs fused by XLA)
instead of a python loop of 18 per-pathology calls; the data loader
prefetches and pads the tail batch.  The reference's "multi-GPU" checkpoint
sweep (run_zero_shot_cls_multi_gpu_*.py) stays a driver-level loop —
eval/sweep.py.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vit_exp_tpu.eval.metrics import evaluate_internal
from vit_exp_tpu.models.ctclip import CTCLIP

PATHOLOGIES: List[str] = [
    "Medical material", "Arterial wall calcification", "Cardiomegaly",
    "Pericardial effusion", "Coronary artery wall calcification",
    "Hiatal hernia", "Lymphadenopathy", "Emphysema", "Atelectasis",
    "Lung nodule", "Lung opacity", "Pulmonary fibrotic sequela",
    "Pleural effusion", "Mosaic attenuation pattern",
    "Peribronchial thickening", "Consolidation", "Bronchiectasis",
    "Interlobular septal thickening",
]


def build_pathology_prompts(
    pathologies: Sequence[str] = PATHOLOGIES,
) -> List[str]:
    """[p0 present, p0 absent, p1 present, ...] — 2 per pathology."""
    prompts = []
    for p in pathologies:
        prompts.append(f"{p} is present.")
        prompts.append(f"{p} is not present.")
    return prompts


class _Subset:
    """First-n view of a dataset (limit support for the batched loaders)."""

    def __init__(self, dataset, n: int):
        self._dataset = dataset
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._dataset[i]


def _pipelined_batches(dataset, n: int, batch_size: int, *,
                       num_workers: int = 4):
    """Yield collated numpy batches (tail batch may be short), loading
    dataset items on background threads so host npz decode overlaps device
    compute — the reference serializes load and forward per volume
    (zero_shot.py:528-611)."""
    from vit_exp_tpu.data.loader import Loader

    yield from Loader(_Subset(dataset, n), batch_size, shuffle=False,
                      num_workers=num_workers, prefetch=2)


def _one_deep_map(dataset, n: int, batch_size: int, dispatch, *,
                  num_workers: int = 4):
    """One-deep device pipeline over `_pipelined_batches`.

    `dispatch(padded_batch, true_len, batch)` returns a payload (device
    arrays plus any host extras).  Each payload is yielded one batch LATE
    — after the next batch's dispatch — so the consumer's host reads
    overlap device compute; the final payload is flushed at the end.
    This is the single audited copy of the drain-before-reassign ordering
    all four eval engines share (classifier/segmenter infer, latents and
    encodings dumps)."""
    pending = None
    for batch in _pipelined_batches(dataset, n, batch_size,
                                    num_workers=num_workers):
        padded, k = _pad_tail(batch, batch_size, "image")
        payload = dispatch(padded, k, batch)
        if pending is not None:
            yield pending
        pending = payload
    if pending is not None:
        yield pending


def replicated_out(mesh) -> Dict:
    """jax.jit kwargs pinning every output replicated over `mesh` — {} when
    mesh is None.  Engine outputs are tiny (probs, dice rows, latents);
    replicating them is free single-host and REQUIRED multihost: a
    batch-sharded output spans non-addressable devices, so the host-side
    np.asarray read would raise.  The all-gather compiles into the
    program."""
    if mesh is None:
        return {}
    from jax.sharding import NamedSharding, PartitionSpec as P

    return {"out_shardings": NamedSharding(mesh, P())}


def shard_batch(mesh, v: jnp.ndarray) -> jnp.ndarray:
    """Shard a leading-batch-dim array over a mesh's (data, fsdp) axes;
    identity when mesh is None.  Shared by both engines and the latents
    tooling so the partition spec lives in exactly one place.

    Multihost: `v` is the full GLOBAL batch (every host loads the same
    eval data — duplicate ingest is fine for eval, and it keeps AUROC /
    dice bit-identical on every process); only this host's addressable
    shards materialize on device."""
    if mesh is None:
        return v
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(
        mesh, P(("data", "fsdp"), *([None] * (v.ndim - 1))))
    if jax.process_count() > 1:
        arr = np.asarray(v)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(v, sharding)


def _pad_tail(batch: Dict, batch_size: int, key: str):
    """Pad every leading-batch-dim array field to batch_size by repeating
    the last item; returns (padded_batch, true_length)."""
    k = len(batch[key])
    if k == batch_size:
        return batch, k
    out = {}
    for name, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == k:
            out[name] = np.concatenate(
                [v, np.repeat(v[-1:], batch_size - k, axis=0)])
        else:
            out[name] = v
    return out, k


class ZeroShotClassifier:
    """Batched FAST zero-shot engine."""

    def __init__(
        self,
        model: CTCLIP,
        params,
        tokenizer,
        *,
        pathologies: Sequence[str] = PATHOLOGIES,
        max_text_len: int = 512,
        batch_size: int = 4,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh — volumes are sharded over its
        ('data','fsdp') axes so one engine drives a whole slice (per-chip
        batch = batch_size; pass batch_size = per_chip × n_data_shards)."""
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.pathologies = list(pathologies)
        self.max_text_len = max_text_len
        self.mesh = mesh
        if mesh is not None:
            shards = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
            batch_size = batch_size * shards
        self.batch_size = batch_size

        def _text_latents(params, ids, mask):
            hidden = model.apply({"params": params}, ids, mask,
                                 method=CTCLIP.encode_text_hidden)
            return model.apply({"params": params}, hidden,
                               method=CTCLIP.text_latents_from_hidden)

        def _probs(params, video, text_latents):
            tokens = model.apply({"params": params}, video,
                                 method=CTCLIP.encode_image_tokens)
            img = model.apply({"params": params}, tokens,
                              method=CTCLIP.image_latents_from_tokens)
            temp = jnp.exp(params["temperature"])
            scores = (img @ text_latents.T) * temp
            pairs = scores.reshape(img.shape[0], len(self.pathologies), 2)
            return jax.nn.softmax(pairs, axis=-1)[..., 0]

        self._text_latents_fn = jax.jit(_text_latents,
                                        **replicated_out(mesh))
        self._probs_fn = jax.jit(_probs, **replicated_out(mesh))
        self._cached_text = None

    def set_params(self, params):
        """Swap weights WITHOUT rebuilding the engine: the jitted programs
        close over nothing but shapes (params are arguments), so in-training
        eval hooks reuse one engine across evals instead of recompiling
        (1-2 min per remote compile on the relay).  Invalidates the prompt
        cache — it was computed with the old text tower."""
        self.params = params
        self._cached_text = None

    def prepare(self):
        """Embed the 36 prompts once (prepare_infer, zero_shot.py:480-497)."""
        toks = self.tokenizer(
            build_pathology_prompts(self.pathologies),
            max_length=self.max_text_len,
        )
        self._cached_text = self._text_latents_fn(
            self.params, jnp.asarray(toks["input_ids"]),
            jnp.asarray(toks["attention_mask"]),
        )
        return self._cached_text

    def _shard(self, v: jnp.ndarray) -> jnp.ndarray:
        return shard_batch(self.mesh, v)

    def dispatch_batch(self, volumes: np.ndarray) -> jnp.ndarray:
        """Non-blocking predict: dispatches the jitted program and returns
        the device array (read it with np.asarray once the NEXT batch is in
        flight — the one-deep pipeline in infer())."""
        if self._cached_text is None:
            self.prepare()
        return self._probs_fn(self.params, self._shard(jnp.asarray(volumes)),
                              self._cached_text)

    def predict_batch(self, volumes: np.ndarray) -> np.ndarray:
        """(B, 1, D, H, W) → (B, n_pathologies) P(present)."""
        return np.asarray(self.dispatch_batch(volumes))

    def infer(
        self,
        dataset,
        *,
        results_folder: Optional[str] = None,
        limit: Optional[int] = None,
        num_workers: int = 4,
    ) -> Dict[str, float]:
        """Iterate an inference dataset, return per-label AUROC dict
        (infer_return_res_dict semantics, zero_shot.py:604-611).

        The loop is software-pipelined: batch i's host read happens while
        batch i+1 computes on device, and dataset items load on background
        threads (the reference runs load → forward → read strictly
        serially per volume)."""
        if limit is None and os.environ.get("CTCLIP_DEBUG"):
            limit = 10  # reference debug truncation (zero_shot.py:625-626)
        n = min(len(dataset), limit) if limit else len(dataset)

        preds, labels, accessions = [], [], []
        t0 = time.perf_counter()

        def dispatch(padded, k, batch):
            return (self.dispatch_batch(padded["image"]), k,
                    batch["onehot"], batch["accession"])

        for dev, k, onehots, accs in _one_deep_map(
                dataset, n, self.batch_size, dispatch,
                num_workers=num_workers):
            preds.extend(np.asarray(dev)[:k])
            labels.extend(onehots[:k])
            accessions.extend(accs[:k])

        elapsed = time.perf_counter() - t0  # inference only — the
        # sklearn AUROC pass below must not dilute the throughput metric
        y_pred = np.asarray(preds)
        y_true = np.asarray(labels)
        res = evaluate_internal(y_pred, y_true, self.pathologies)
        res["volumes_per_sec"] = n / elapsed

        if results_folder:
            from vit_exp_tpu.eval.metrics import save_inference_artifacts

            save_inference_artifacts(results_folder, y_pred, y_true,
                                     accessions, res)
        return res


class ZeroShotSegmenter:
    """Closed-set seg dice runner (CTClipInferenceSeg, zero_shot.py:908-1101)."""

    def __init__(self, model: CTCLIP, params, *, batch_size: int = 1,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh — volumes/masks shard over its
        ('data','fsdp') axes exactly like the classifier engine (per-chip
        batch = batch_size)."""
        self.model = model
        self.params = params
        self.mesh = mesh
        if mesh is not None:
            batch_size *= mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        self.batch_size = batch_size

        def _dice(params, video, seg_mask):
            from vit_exp_tpu.models.losses import dice_scores_per_sample

            logits = model.apply({"params": params}, video,
                                 method=CTCLIP.seg_forward)
            return dice_scores_per_sample(logits, seg_mask)

        self._dice_fn = jax.jit(_dice, **replicated_out(mesh))

    def set_params(self, params):
        """Swap weights without rebuilding (no recompiles — see
        ZeroShotClassifier.set_params)."""
        self.params = params

    def _shard(self, v: jnp.ndarray) -> jnp.ndarray:
        return shard_batch(self.mesh, v)

    def dice_batch(self, volumes: np.ndarray, masks: np.ndarray) -> np.ndarray:
        """(B, 1, D, H, W), (B, C, D, H, W) → (B, C) per-sample dice."""
        return np.asarray(self._dice_fn(
            self.params, self._shard(jnp.asarray(volumes)),
            self._shard(jnp.asarray(masks))))

    def infer(
        self, dataset, *, results_folder: Optional[str] = None,
        limit: Optional[int] = None, num_workers: int = 4,
    ) -> Dict[str, float]:
        """Batched dice over the dataset: volumes are stacked to
        `batch_size` and scored in ONE jitted program per batch, with the
        classifier engine's pad-tail pattern (repeat last item, slice off)
        instead of the reference's per-volume dispatch loop
        (zero_shot.py:908-1101).  Same load/compute/read pipelining as the
        classifier engine."""
        n = min(len(dataset), limit) if limit else len(dataset)
        all_dice: list = []

        def dispatch(padded, k, batch):
            return self._dice_fn(
                self.params, self._shard(jnp.asarray(padded["image"])),
                self._shard(jnp.asarray(padded["seg_mask"]))), k

        for dev, k in _one_deep_map(dataset, n, self.batch_size, dispatch,
                                    num_workers=num_workers):
            all_dice.extend(np.asarray(dev)[:k])
        dice = np.nanmean(np.stack(all_dice), axis=0)
        res = {f"dice_class_{i}": float(v) for i, v in enumerate(dice)}
        res["mean_dice"] = float(np.nanmean(dice))
        if results_folder:
            os.makedirs(results_folder, exist_ok=True)
            np.save(os.path.join(results_folder, "dice_scores.npy"),
                    np.stack(all_dice))
            with open(os.path.join(results_folder, "dice_scores.txt"), "w") as f:
                for k, v in res.items():
                    f.write(f"{k}: {v}\n")
        return res

"""Capture a jax.profiler trace of the flagship zero-shot program on the TPU.

Usage: python scripts/profile_zero_shot.py [outdir]

Builds the same batched classify program as bench.py, warms it up, then
traces a few perturbed-input dispatches.  If the axon relay forwards device
traces, an .xplane.pb appears under <outdir>/plugins/profile/...; parse it
with scripts/parse_xplane.py.
"""

import sys
import time

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zs_trace"
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.models.ctclip import CTCLIP

    assert jax.default_backend() == "tpu", "profile on the real chip"
    arch = {
        "dim": 768, "image_size": 480, "patch_size": 20,
        "temporal_size": 240, "temporal_patch_size": 10,
        "transformer_blocks": 8, "dim_head": 32, "heads": 8,
    }
    bert_cfg = BertConfig()
    batch, text_len = 4, 512
    config = ExperimentConfig.from_dict({"arch": arch})
    import os

    model = build_ctclip(
        config, bert_config=bert_cfg,
        # defaults track bench.py's serving defaults (int8) so the trace
        # profiles the program the headline number runs
        attn_impl=os.environ.get("BENCH_ATTN_IMPL", "pallas_static_int8"),
        ff_impl=os.environ.get("BENCH_FF_IMPL", "pallas_int8"),
        fuse_qkv=os.environ.get("BENCH_FUSE_QKV", "1") == "1",
    )
    a = config.arch
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 1, a.temporal_size, a.image_size,
                             a.image_size)), jnp.bfloat16)
    prompt_ids = jnp.asarray(
        rng.integers(0, bert_cfg.vocab_size, (36, text_len)), jnp.int32)
    prompt_mask = jnp.ones((36, text_len), jnp.int32)
    params = nn.unbox(model.init(
        jax.random.PRNGKey(0), video[:1], prompt_ids[:1], prompt_mask[:1]
    ))["params"]

    @jax.jit
    def cache_text(params, ids, mask):
        hidden = model.apply({"params": params}, ids, mask,
                             method=CTCLIP.encode_text_hidden)
        return model.apply({"params": params}, hidden,
                           method=CTCLIP.text_latents_from_hidden)

    @jax.jit
    def classify(params, video, text_latents):
        tokens = model.apply({"params": params}, video,
                             method=CTCLIP.encode_image_tokens)
        img = model.apply({"params": params}, tokens,
                          method=CTCLIP.image_latents_from_tokens)
        temp = jnp.exp(params["temperature"])
        scores = (img @ text_latents.T) * temp
        pairs = scores.reshape(video.shape[0], 18, 2)
        return jax.nn.softmax(pairs, axis=-1)[..., 0]

    text_latents = jax.block_until_ready(
        cache_text(params, prompt_ids, prompt_mask))
    print("warmup compile...", flush=True)
    t0 = time.perf_counter()
    float(jnp.sum(classify(params, video, text_latents)))
    print(f"compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)

    perturb = jax.jit(lambda x, s: x * s)
    print("tracing...", flush=True)
    jax.profiler.start_trace(outdir)
    for i in range(3):
        v = perturb(video, jnp.bfloat16(1.0 + 1e-4 * (i + 1)))
        float(jnp.sum(classify(params, v, text_latents)))
    jax.profiler.stop_trace()
    print("trace done", flush=True)
    import subprocess
    print(subprocess.run(["find", outdir, "-type", "f"],
                         capture_output=True, text=True).stdout)


if __name__ == "__main__":
    main()

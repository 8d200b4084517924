"""Zero-shot classify throughput vs batch size on the real TPU.

Same program as bench.py main(), measured at batch 4/8/16 with the
loop-differencing protocol.  Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_batch.py
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.models.ctclip import CTCLIP

    assert jax.default_backend() == "tpu"
    arch = {
        "dim": 768, "image_size": 480, "patch_size": 20,
        "temporal_size": 240, "temporal_patch_size": 10,
        "transformer_blocks": 8, "dim_head": 32, "heads": 8,
    }
    bert_cfg = BertConfig()
    text_len = 512
    config = ExperimentConfig.from_dict({"arch": arch})
    model = build_ctclip(config, bert_config=bert_cfg,
                         attn_impl=os.environ.get(
                             "BENCH_ATTN_IMPL", "pallas_static_int8"),
                         ff_impl=os.environ.get(
                             "BENCH_FF_IMPL", "pallas_int8"),
                         fuse_qkv=True)
    a = config.arch
    rng = np.random.default_rng(0)

    prompt_ids = jnp.asarray(
        rng.integers(0, bert_cfg.vocab_size, (36, text_len)), jnp.int32)
    prompt_mask = jnp.ones((36, text_len), jnp.int32)
    video1 = jnp.asarray(
        rng.standard_normal((1, 1, a.temporal_size, a.image_size,
                             a.image_size)), jnp.bfloat16)
    params = nn.unbox(model.init(
        jax.random.PRNGKey(0), video1, prompt_ids[:1], prompt_mask[:1]
    ))["params"]

    @jax.jit
    def cache_text(params, ids, mask):
        hidden = model.apply({"params": params}, ids, mask,
                             method=CTCLIP.encode_text_hidden)
        return model.apply({"params": params}, hidden,
                           method=CTCLIP.text_latents_from_hidden)

    text_latents = jax.block_until_ready(
        cache_text(params, prompt_ids, prompt_mask))

    def classify(params, video, text_latents):
        tokens = model.apply({"params": params}, video,
                             method=CTCLIP.encode_image_tokens)
        img = model.apply({"params": params}, tokens,
                          method=CTCLIP.image_latents_from_tokens)
        temp = jnp.exp(params["temperature"])
        scores = (img @ text_latents.T) * temp
        pairs = scores.reshape(video.shape[0], 18, 2)
        return jax.nn.softmax(pairs, axis=-1)[..., 0]

    def classify_n(n):
        @jax.jit
        def run(params, video, text_latents):
            def body(_, carry):
                acc, vid = carry
                probs = classify(params, vid, text_latents)
                s = jnp.sum(probs.astype(jnp.float32))
                vid = vid * (1.0 + 1e-9 * s).astype(vid.dtype)
                return acc + s, vid
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), video))
            return acc
        return run

    perturb = jax.jit(lambda x, s: x * s)
    for batch, iters in ((4, 5), (8, 4), (16, 3)):
        video = jnp.asarray(
            rng.standard_normal((batch, 1, a.temporal_size, a.image_size,
                                 a.image_size)), jnp.bfloat16)
        run1, runk = classify_n(1), classify_n(1 + iters)
        t0 = time.perf_counter()
        float(run1(params, video, text_latents))
        float(runk(params, video, text_latents))
        compile_s = time.perf_counter() - t0
        video2 = jax.block_until_ready(perturb(video, jnp.bfloat16(1.0009)))
        t0 = time.perf_counter()
        float(run1(params, video2, text_latents))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(runk(params, video2, text_latents))
        dk = time.perf_counter() - t0
        dt = max(dk - d1, 1e-9)
        vps = batch * iters / dt
        print(f"batch {batch:3d}: {vps:7.2f} vol/s "
              f"({dt / iters / batch * 1e3:6.1f} ms/vol, "
              f"compiles {compile_s:.0f}s, dispatch1 {d1:.2f}s)", flush=True)


if __name__ == "__main__":
    main()

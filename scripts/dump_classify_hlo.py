"""Dump the optimized (post-layout-assignment) HLO of the batched classify
program so device-trace op names (copy.N, fusion.N) can be mapped to shapes.

Usage: BENCH_ATTN_IMPL=pallas_static_int8 BENCH_FF_IMPL=pallas_int8 \
         python scripts/dump_classify_hlo.py /tmp/classify_hlo.txt
"""

import os
import sys

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/classify_hlo.txt"
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.models.ctclip import CTCLIP

    arch = {
        "dim": 768, "image_size": 480, "patch_size": 20,
        "temporal_size": 240, "temporal_patch_size": 10,
        "transformer_blocks": 8, "dim_head": 32, "heads": 8,
    }
    bert_cfg = BertConfig()
    batch = 4
    config = ExperimentConfig.from_dict({"arch": arch})
    model = build_ctclip(
        config, bert_config=bert_cfg,
        attn_impl=os.environ.get("BENCH_ATTN_IMPL", "pallas_static_int8"),
        ff_impl=os.environ.get("BENCH_FF_IMPL", "pallas_int8"),
        fuse_qkv=True,
    )
    a = config.arch
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 1, a.temporal_size, a.image_size,
                             a.image_size)), jnp.bfloat16)
    prompt_ids = jnp.asarray(rng.integers(0, bert_cfg.vocab_size, (1, 16)),
                             jnp.int32)
    prompt_mask = jnp.ones((1, 16), jnp.int32)
    params = nn.unbox(model.init(
        jax.random.PRNGKey(0), video[:1], prompt_ids, prompt_mask
    ))["params"]
    text_latents = jnp.zeros((36, 768), jnp.float32)

    def classify(params, video, text_latents):
        tokens = model.apply({"params": params}, video,
                             method=CTCLIP.encode_image_tokens)
        img = model.apply({"params": params}, tokens,
                          method=CTCLIP.image_latents_from_tokens)
        temp = jnp.exp(params["temperature"])
        scores = (img @ text_latents.T) * temp
        pairs = scores.reshape(video.shape[0], 18, 2)
        return jax.nn.softmax(pairs, axis=-1)[..., 0]

    compiled = jax.jit(classify).lower(params, video, text_latents).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} chars to {out}")


if __name__ == "__main__":
    main()

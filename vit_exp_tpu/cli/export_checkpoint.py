"""Export a trained flax checkpoint BACK to the reference torch layout.

The inverse of cli/convert_checkpoint.py: takes an orbax checkpoint from
this framework and writes a `CTClip.{step}.pt` that the reference's
`clip.load(path)` (ct_clip.py:760-774, strict load_state_dict after the
unconditional 'module.' strip) consumes — so weights trained here can be
handed to reference-tooling users, or validated on the reference GPU
stack.

Usage:
    python -m vit_exp_tpu.cli.export_checkpoint --config cfg.yaml \
        --ckpt results/x/checkpoints/ckpt_100000 --out CTClip.100000.pt \
        [--like CTClip.orig.pt] [--bert_buffers]

--like: an original reference checkpoint whose extra keys (BERT pooler /
buffers, unused CTViT3D modules) are passed through verbatim and whose
key set the export is pinned to — use when round-tripping a converted
checkpoint.  Without it, reference-init defaults are emitted (see
models/convert.export_ctclip_state_dict).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True,
                        help="orbax checkpoint dir (ckpt_<step>)")
    parser.add_argument("--out", required=True,
                        help="output .pt path (reference CTClip layout)")
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--like", default=None,
                        help="reference .pt: pins the key set, passes "
                        "through non-derived keys, and overrides the "
                        "synthesized dead-module/pooler/*_extra fills "
                        "with the original's values")
    parser.add_argument("--bert_buffers", action="store_true",
                        help="emit embeddings.position_ids/token_type_ids "
                        "buffers (older HF strict-load targets)")
    args = parser.parse_args(argv)

    import jax

    # export is pure host work — never compile on (or wait for) a TPU
    jax.config.update("jax_platforms", "cpu")

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip
    from vit_exp_tpu.models.convert import save_ctclip_checkpoint
    from vit_exp_tpu.cli.run_zero_shot_cls import load_params

    config = load_config(args.config)
    tokenizer = load_tokenizer(args.vocab)
    bert_cfg = bert_config_for(config, tokenizer)
    model = build_ctclip(config, bert_config=bert_cfg, attn_impl="xla",
                         ff_impl="xla", fuse_qkv=False)
    params = load_params(model, config, args.ckpt, bert_cfg=bert_cfg)

    like = None
    if args.like:
        import torch

        like = torch.load(args.like, map_location="cpu",
                          weights_only=True)

    a = config.arch
    grid = (a.temporal_size // a.temporal_patch_size,
            a.image_size // a.patch_size, a.image_size // a.patch_size)
    save_ctclip_checkpoint(
        args.out, params, grid=grid, heads=a.heads, bert_config=bert_cfg,
        like=like, bert_buffers=args.bert_buffers)
    print(f"wrote reference-layout checkpoint → {args.out}")


if __name__ == "__main__":
    main()

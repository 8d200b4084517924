"""Zero-shot segmentation CLI — run_zero_shot_seg_multi_gpu_2.py equivalent
(drives CTClipInferenceSeg, zero_shot.py:908-1101).

Usage:
    python -m vit_exp_tpu.cli.run_zero_shot_seg --config cfg.yaml \
        --model_path ckpt --results_folder out/ \
        [--data_folder imgs/ --mask_folder masks/] [--synthetic N]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="int8 serving path (int8-QK attention + W8A8 "
                        "FF/projections; probability parity <=0.02 vs fp32 "
                        "- tests/test_int8_parity.py).  --no-int8 for bf16")
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--results_folder", required=True)
    parser.add_argument("--data_folder", default=None)
    parser.add_argument("--mask_folder", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--torch_ckpt", action="store_true")
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--batch_size", type=int, default=1,
                        help="per-chip volumes per dice dispatch")
    parser.add_argument("--mesh", default=None, metavar="DATA,FSDP,MODEL",
                        help="shard eval over a device mesh, e.g. 8,1,1 "
                        "(-1 = all remaining devices): volumes/masks split "
                        "over the data/fsdp axes.  Default: single device")
    from vit_exp_tpu.core import multihost

    multihost.add_cli_args(parser)
    args = parser.parse_args(argv)
    multihost.initialize_from_args(args)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.eval.zero_shot import ZeroShotSegmenter
    from vit_exp_tpu.models.ctclip import CTCLIP
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    config = load_config(args.config)
    assert config.ct_clip_arch.use_seg, "config must enable use_seg"
    tokenizer = load_tokenizer(args.vocab)
    bert_cfg = bert_config_for(config, tokenizer)
    attn_impl = ("pallas_static" if jax.default_backend() == "tpu"
                 else "xla")  # inference-only static-max kernel
    ff_impl = "pallas" if attn_impl == "pallas_static" else "xla"
    if args.int8:
        # W8A8 serving: FF + static-max attention both run int8 on the MXU
        ff_impl = "pallas_int8"
        if attn_impl == "pallas_static":
            attn_impl = "pallas_static_int8"
    model = build_ctclip(config, bert_config=bert_cfg,
                         attn_impl=attn_impl, ff_impl=ff_impl,
                         fuse_qkv=attn_impl != "xla")

    a = config.arch
    video0 = jnp.zeros((1, a.channels, a.temporal_size, a.image_size,
                        a.image_size), jnp.float32)
    if args.model_path:
        from vit_exp_tpu.cli.run_zero_shot_cls import load_params

        params = load_params(model, config, args.model_path,
                             torch_ckpt=args.torch_ckpt, bert_cfg=bert_cfg)
    else:
        params = nn.unbox(
            model.init(jax.random.PRNGKey(0), video0,
                       jnp.zeros((1, 16), jnp.int32), method=CTCLIP.init_all)
        )["params"]

    if args.synthetic:
        from vit_exp_tpu.data.synthetic import SyntheticCTDataset

        dataset = SyntheticCTDataset(
            "imageseg", n=args.synthetic, arch=config.arch,
            n_classes=config.ct_clip_arch.seg_head.out_dim,
        )
    else:
        from vit_exp_tpu.data.datasets import CTSegDataset

        dataset = CTSegDataset(args.data_folder, args.mask_folder)

    from vit_exp_tpu.core.mesh import mesh_from_cli

    mesh = mesh_from_cli(config, args.mesh)
    engine = ZeroShotSegmenter(model, params, batch_size=args.batch_size,
                               mesh=mesh)
    # multihost: all processes run the collective dice programs; p0 writes
    res = engine.infer(
        dataset,
        results_folder=(args.results_folder
                        if multihost.is_main_process() else None))
    if multihost.is_main_process():
        print(json.dumps(res))


if __name__ == "__main__":
    main()

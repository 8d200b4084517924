"""Latents dump + retrieval CLI — run_zero_shot_latent.py /
run_forward_data.py / volume_to_volume_new.py equivalents.

Usage:
    python -m vit_exp_tpu.cli.run_latents --config cfg.yaml \
        --results_folder out/ [--model_path ckpt] [--synthetic N] \
        [--retrieval volume|report|both] [--topk 5]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="int8 serving kernels (the default across all "
                        "serving CLIs; --no-int8 for bf16) — dumped "
                        "latents then match production numerics")
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--torch_ckpt", action="store_true")
    parser.add_argument("--results_folder", required=True)
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--data_folder", default=None)
    parser.add_argument("--reports_csv", default=None)
    parser.add_argument("--labels_csv", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--retrieval", default="both",
                        choices=["none", "volume", "report", "both"])
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=4,
                        help="per-chip volumes per encode dispatch")
    parser.add_argument("--mesh", default=None, metavar="DATA,FSDP,MODEL",
                        help="shard encoding over a device mesh, e.g. "
                        "8,1,1 (-1 = all remaining devices).  Default: "
                        "single device")
    from vit_exp_tpu.core import multihost

    multihost.add_cli_args(parser)
    args = parser.parse_args(argv)
    multihost.initialize_from_args(args)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    from vit_exp_tpu.eval.latents import (
        dump_latents,
        report_to_volume,
        volume_to_volume,
    )
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip

    enable_compilation_cache()
    config = load_config(args.config)
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
    if args.model_path:
        from vit_exp_tpu.cli.run_zero_shot_cls import load_params

        params = load_params(model, config, args.model_path,
                             torch_ckpt=args.torch_ckpt, bert_cfg=bert_cfg)
    else:
        params = nn.unbox(
            model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, a.channels, a.temporal_size, a.image_size,
                           a.image_size), jnp.float32),
                jnp.zeros((1, 16), jnp.int32), method=CTCLIP.init_all,
            )
        )["params"]

    if args.synthetic:
        from vit_exp_tpu.data.synthetic import SyntheticInferenceDataset

        dataset = SyntheticInferenceDataset(args.synthetic, arch=config.arch)
    else:
        from vit_exp_tpu.data.datasets import CTReportInferenceDataset

        dataset = CTReportInferenceDataset(
            args.data_folder, args.reports_csv, args.labels_csv,
            tokenizer=tokenizer,
        )

    from vit_exp_tpu.core.mesh import mesh_from_cli

    mesh = mesh_from_cli(config, args.mesh)
    engine = ZeroShotClassifier(model, params, tokenizer,
                                batch_size=args.batch_size, mesh=mesh)
    out = dump_latents(engine, dataset, args.results_folder)
    write = multihost.is_main_process()  # all compute, p0 writes/prints
    summary = {"n": int(out["image_latents"].shape[0])}
    if args.retrieval in ("volume", "both"):
        v2v = volume_to_volume(out["image_latents"], k=args.topk)
        if write:
            np.savez(f"{args.results_folder}/volume_to_volume.npz",
                     **{k: v for k, v in v2v.items()})
        summary["v2v_mean_top1_sim"] = float(v2v["similarities"][:, 0].mean())
    if args.retrieval in ("report", "both"):
        r2v = report_to_volume(out["text_latents"], out["image_latents"],
                               k=args.topk)
        if write:
            np.savez(f"{args.results_folder}/report_to_volume.npz",
                     indices=r2v["indices"], similarities=r2v["similarities"])
        summary["report_to_volume_recall_at_k"] = r2v["recall_at_k"]
    if write:
        print(json.dumps(summary))


if __name__ == "__main__":
    main()

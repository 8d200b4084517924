"""Zero-shot classification CLI — run_zero_shot_cls_single_gpu.py equivalent.

Usage:
    python -m vit_exp_tpu.cli.run_zero_shot_cls --config cfg.yaml \
        --model_path ckpt --results_folder out/ [--vocab vocab.txt] \
        [--data_folder ...] [--reports_csv ...] [--labels_csv ...] \
        [--synthetic N] [--torch_ckpt CTClip.100000.pt]

Checkpoint-sweep sharding (the reference's "multi-GPU" zero-shot launchers,
run_zero_shot_cls_multi_gpu_*.py:28-54) stays a driver-level loop: pass
--model_path multiple times; each is evaluated sequentially on this chip or
sharded across hosts by your scheduler.
"""

from __future__ import annotations

import argparse
import json
import os


def load_params(model, config, path, torch_ckpt=False, bert_cfg=None):
    import jax
    import flax.linen as nn
    import jax.numpy as jnp

    from vit_exp_tpu.models.ctclip import CTCLIP

    if torch_ckpt:
        from vit_exp_tpu.models.convert import load_ctclip_checkpoint

        return load_ctclip_checkpoint(
            path, transformer_blocks=config.arch.transformer_blocks,
            bert_config=bert_cfg,
        )
    from vit_exp_tpu.train.checkpoint import CheckpointManager
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import create_train_state

    a = config.arch
    video = jnp.zeros((1, a.channels, a.temporal_size, a.image_size,
                       a.image_size), jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    boxed = model.init(jax.random.PRNGKey(0), video, ids,
                       method=CTCLIP.init_all)
    params = nn.unbox(boxed)["params"]
    mgr = CheckpointManager(os.path.dirname(path) or ".")
    step = int(os.path.basename(path).split("_")[-1])
    tx = build_optimizer(config.trainer)
    target = jax.eval_shape(lambda: create_train_state(params, tx))
    return mgr.restore(step, target).params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="int8 serving path (int8-QK attention + W8A8 "
                        "FF/projections; probability parity <=0.02 vs fp32 "
                        "- tests/test_int8_parity.py).  --no-int8 for bf16")
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_path", action="append", default=[])
    parser.add_argument("--results_folder", required=True)
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--data_folder", default=None)
    parser.add_argument("--packed_root", default=None,
                        help="packed-shard store (cli/pack_dataset.py) "
                             "instead of an npz tree — memmap ingest")
    parser.add_argument("--reports_csv", default=None)
    parser.add_argument("--labels_csv", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--planted", type=int, default=0,
                        help="held-out planted-signal eval set of N volumes "
                        "(data/planted.py, seed 1 = the singles'/hooks' "
                        "held-out seed); scores the 4 planted attributes — "
                        "use to sweep a planted run's checkpoints, e.g. "
                        "results/planted_mixed_800/checkpoints/ckpt_*")
    parser.add_argument("--torch_ckpt", action="store_true",
                        help="model_path is a reference CTClip.*.pt")
    parser.add_argument("--batch_size", type=int, default=4,
                        help="per-chip batch (4 = measured optimum)")
    parser.add_argument("--mesh", default=None, metavar="DATA,FSDP,MODEL",
                        help="shard eval over a device mesh, e.g. 8,1,1 "
                        "(-1 = all remaining devices): volumes split over "
                        "the data/fsdp axes, global batch = batch_size x "
                        "shards.  Default: single device")
    from vit_exp_tpu.core import multihost

    multihost.add_cli_args(parser)
    args = parser.parse_args(argv)
    multihost.initialize_from_args(args)

    import jax

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

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

    pathologies, max_text_len = None, 512
    if args.planted:
        from vit_exp_tpu.data import planted

        dataset = planted.PlantedInferenceDataset(
            args.planted, arch=config.arch, seed=1)
        pathologies = list(planted.PLANTED_ATTRS)
        max_text_len = 64
    elif args.synthetic:
        from vit_exp_tpu.data.synthetic import SyntheticInferenceDataset

        dataset = SyntheticInferenceDataset(args.synthetic, arch=config.arch)
    elif args.packed_root:
        from vit_exp_tpu.data.packed import CTReportPackedInferenceDataset

        dataset = CTReportPackedInferenceDataset(
            args.packed_root, args.labels_csv, args.reports_csv,
        )
    else:
        from vit_exp_tpu.data.datasets import CTReportInferenceDataset

        dataset = CTReportInferenceDataset(
            args.data_folder, args.reports_csv, args.labels_csv,
            tokenizer=tokenizer,
        )

    from vit_exp_tpu.core.mesh import mesh_from_cli

    mesh = mesh_from_cli(config, args.mesh)

    model_paths = args.model_path or [None]
    engine = None
    for path in model_paths:
        if path is None:
            import flax.linen as nn
            import jax.numpy as jnp

            from vit_exp_tpu.models.ctclip import CTCLIP

            a = config.arch
            video = jnp.zeros((1, a.channels, a.temporal_size, a.image_size,
                               a.image_size), jnp.float32)
            params = nn.unbox(
                model.init(jax.random.PRNGKey(0), video,
                           jnp.zeros((1, 16), jnp.int32),
                           method=CTCLIP.init_all)
            )["params"]
            tag = "random_init"
        else:
            params = load_params(model, config, path,
                                 torch_ckpt=args.torch_ckpt,
                                 bert_cfg=bert_cfg)
            tag = os.path.basename(path)
        # ONE engine for the whole checkpoint sweep: set_params swaps
        # weights without re-tracing the jitted programs (each remote
        # compile costs 1-2 min on the relay)
        if engine is None:
            kw = {}
            if pathologies is not None:
                kw = dict(pathologies=pathologies, max_text_len=max_text_len)
            engine = ZeroShotClassifier(
                model, params, tokenizer, batch_size=args.batch_size,
                mesh=mesh, **kw,
            )
        else:
            engine.set_params(params)
        # multihost: every process computes the identical (replicated)
        # scores; only process 0 writes the artifacts
        out = (os.path.join(args.results_folder, tag)
               if multihost.is_main_process() else None)
        res = engine.infer(dataset, results_folder=out)
        if multihost.is_main_process():
            print(json.dumps(
                {"model": tag, **{k: v for k, v in res.items()}}))


if __name__ == "__main__":
    main()

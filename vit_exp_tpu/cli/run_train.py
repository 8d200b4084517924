"""Training CLI — the scripts/run_train.py equivalent.

Usage:
    python -m vit_exp_tpu.cli.run_train --config cfg.yaml \
        [--resume ckpt_step] [--auto_resume] [--debug] [--steps N] \
        [--vocab path/to/vocab.txt] [--synthetic N]

Reference parity (scripts/run_train.py:71-218): YAML config, seeding,
image-encoder construction from `arch`, CTCLIP assembly, resume flags,
--debug switching the logger offline.  TPU-native: one process drives the
whole mesh (no accelerate launch); datasets come from `train_data_list`
(type → dataset class), or --synthetic N builds an in-memory random dataset
for smoke runs without CT-RATE on disk.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def build_datasets(config, tokenizer, synthetic: int = 0):
    from vit_exp_tpu.data.datasets import (
        CTOpenSegDataset,
        CTReportDataset,
        CTSegDataset,
    )

    if synthetic:
        from vit_exp_tpu.data.synthetic import SyntheticCTDataset

        return [
            SyntheticCTDataset(
                spec.get("type", "imagereport"), n=synthetic,
                arch=config.arch, tokenizer=tokenizer,
            )
            for spec in (config.train_data_list or [{"type": "imagereport"}])
        ]

    def _get(spec, *names):
        # both our names and the reference yaml names resolve
        # (train_data_list entries use data_train/reports_file_train/
        # seg_data_train/seg_mask_train — e.g.
        # ct_clip_vit_open_seg_hpc_v5_1_80g.yaml:21-50)
        for n in names:
            if spec.get(n) is not None:
                return spec[n]
        raise KeyError(f"dataset spec needs one of {names}: {spec}")

    datasets = []
    for spec in config.train_data_list:
        dtype = spec.get("type", "imagereport")
        if spec.get("planted"):
            # planted-signal integration datasets (data/planted.py) — the
            # offline stand-in for the reference's debug-30 smoke configs
            # (ct_clip_debug_30_v2.yaml:3-12); `n` defaults large enough
            # that short runs are single-epoch (no memorization)
            from vit_exp_tpu.data import planted

            n = int(spec.get("n", 4096))
            if dtype == "imagereport":
                datasets.append(planted.PlantedCTDataset(
                    n, arch=config.arch, tokenizer=tokenizer,
                    max_text_len=64))
            elif dtype == "imageseg":
                datasets.append(planted.PlantedSegDataset(
                    n, arch=config.arch))
            elif dtype == "imageopenseg":
                datasets.append(planted.PlantedOpenSegDataset(
                    n, arch=config.arch, tokenizer=tokenizer,
                    max_text_len=64))
            else:
                raise ValueError(f"unknown planted dataset type {dtype!r}")
            continue
        if dtype == "imagereport":
            if spec.get("packed"):
                # memmap shards written by cli/pack_dataset.py — no
                # per-sample npz inflate (data/packed.py)
                from vit_exp_tpu.data.packed import CTReportPackedDataset

                datasets.append(
                    CTReportPackedDataset(
                        _get(spec, "data_folder", "data_train"),
                        spec.get("reports_csv") or spec.get(
                            "reports_file_train"),
                        tokenizer=tokenizer,
                    )
                )
                continue
            datasets.append(
                CTReportDataset(
                    _get(spec, "data_folder", "data_train"),
                    _get(spec, "reports_csv", "reports_file_train"),
                    tokenizer=tokenizer,
                )
            )
        elif dtype == "imageseg":
            datasets.append(CTSegDataset(
                _get(spec, "data_folder", "seg_data_train"),
                _get(spec, "mask_folder", "seg_mask_train")))
        elif dtype == "imageopenseg":
            datasets.append(
                CTOpenSegDataset(
                    _get(spec, "data_folder", "seg_data_train"),
                    _get(spec, "mask_folder", "seg_mask_train"),
                    _get(spec, "seg_mask_name_table"),
                    tokenizer=tokenizer,
                    seg_mask_prompt_type=spec.get(
                        "seg_mask_prompt_type", "this_region"),
                )
            )
        else:
            raise ValueError(f"unknown dataset type {dtype!r}")
    return datasets


def mesh_config_from(config, mesh_arg=None):
    """Moved to core/mesh.py (shared with the eval/serve CLIs)."""
    from vit_exp_tpu.core.mesh import mesh_config_from as _impl

    return _impl(config, mesh_arg)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", type=int, default=None)
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--vocab", default=None, help="HF vocab.txt path")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="use N synthetic samples per dataset")
    parser.add_argument("--synthetic_eval", type=int, default=0,
                        help="use N synthetic samples for the eval/sample "
                        "hooks while TRAIN data comes from the config "
                        "(integration runs on real/packed train data "
                        "without a real valid set)")
    parser.add_argument("--attn_impl", default=None,
                        choices=["xla", "pallas", "pallas_static"])
    parser.add_argument("--ff_impl", default=None,
                        choices=["xla", "pallas"])
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize transformer blocks (memory "
                        "headroom for larger batches; ~2%% slower at bs4 "
                        "since the fused backwards)")
    parser.add_argument("--mesh", default=None, metavar="DATA,FSDP,MODEL",
                        help="device-mesh axis sizes, e.g. 4,2,1 (use -1 "
                        "for 'all remaining devices' on the data axis); "
                        "overrides the yaml `mesh:` section.  Replaces the "
                        "reference's `accelerate launch` process topology — "
                        "one process drives the whole mesh (or one per host "
                        "on pods, see --coordinator_address)")
    # shared multihost flags (each host loads its slice of the global batch)
    from vit_exp_tpu.core import multihost as _mh

    _mh.add_cli_args(parser)
    args = parser.parse_args(argv)

    import jax

    from vit_exp_tpu.core import multihost
    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip
    from vit_exp_tpu.train.trainer import CTClipTrainer

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    # before any backend touch: the coordination service must exist before
    # devices are enumerated (no-op without --coordinator_address / env)
    multihost.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
    enable_compilation_cache()

    config = load_config(args.config)
    os.makedirs(config.results_folder, exist_ok=True)
    # snapshot git state into the exp folder (run_train.py:108-112);
    # main process only — hosts share the results tree on pods
    if multihost.is_main_process():
        try:
            with open(os.path.join(config.results_folder,
                                   "git_state.txt"), "w") as f:
                for cmd in (["git", "log", "-1"], ["git", "status", "--short"]):
                    f.write(subprocess.run(cmd, capture_output=True,
                                           text=True).stdout + "\n")
        except Exception:
            pass

    np.random.seed(config.random_seed)

    tokenizer = load_tokenizer(args.vocab)
    bert_cfg = bert_config_for(config, tokenizer)
    attn_impl = args.attn_impl or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    ff_impl = args.ff_impl or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    model = build_ctclip(
        config, bert_config=bert_cfg, attn_impl=attn_impl, ff_impl=ff_impl,
        remat=args.remat,
    )

    datasets = build_datasets(config, tokenizer, synthetic=args.synthetic)

    # in-training eval/sample hooks from valid_test_list / sample_test_list
    hooks = {"eval_hooks": {}, "sample_hooks": {}}
    if config.valid_test_list or config.sample_test_list:
        from vit_exp_tpu.eval.hooks import build_eval_hooks

        cls_ds = seg_ds = open_ds = None
        cls_pathologies, cls_max_text_len = None, 512
        valid = config.extra.get("valid_data", {})
        if any(spec.get("planted")
               for spec in (config.train_data_list or [])):
            # planted integration run: held-out planted eval sets, scored
            # on the 4 planted attributes (data/planted.py)
            from vit_exp_tpu.data import planted

            cls_ds = planted.PlantedInferenceDataset(16, arch=config.arch)
            seg_ds = planted.PlantedSegInferenceDataset(8, arch=config.arch)
            if config.ct_clip_arch.use_open_seg:
                open_ds = planted.PlantedOpenSegDataset(
                    2, arch=config.arch, tokenizer=tokenizer,
                    max_text_len=64)
            cls_pathologies = list(planted.PLANTED_ATTRS)
            cls_max_text_len = 64
        elif args.synthetic or args.synthetic_eval:
            from vit_exp_tpu.data.synthetic import (
                SyntheticCTDataset,
                SyntheticInferenceDataset,
            )

            cls_ds = SyntheticInferenceDataset(
                args.synthetic_eval or max(args.synthetic // 2, 2),
                arch=config.arch,
            )
            if config.ct_clip_arch.use_open_seg:
                open_ds = SyntheticCTDataset(
                    "imageopenseg", n=2, arch=config.arch,
                    tokenizer=tokenizer, n_classes=4,
                )
        elif valid:
            from vit_exp_tpu.data.datasets import (
                CTOpenSegDataset,
                CTReportInferenceDataset,
                CTSegDataset,
            )

            if "cls" in valid:
                cls_ds = CTReportInferenceDataset(
                    valid["cls"]["data_folder"], valid["cls"]["reports_csv"],
                    valid["cls"]["labels_csv"], tokenizer=tokenizer,
                )
            if "seg" in valid:
                seg_ds = CTSegDataset(valid["seg"]["data_folder"],
                                      valid["seg"]["mask_folder"])
            if "open_seg" in valid:
                open_ds = CTOpenSegDataset(
                    valid["open_seg"]["data_folder"],
                    valid["open_seg"]["mask_folder"],
                    valid["open_seg"]["seg_mask_name_table"],
                    tokenizer=tokenizer,
                )
        hooks = build_eval_hooks(
            config, model, tokenizer, cls_dataset=cls_ds,
            seg_dataset=seg_ds, open_seg_dataset=open_ds,
            cls_pathologies=cls_pathologies,
            cls_max_text_len=cls_max_text_len,
        )

    resume = -1 if args.auto_resume else args.resume
    trainer = CTClipTrainer(model, config, datasets=datasets,
                            mesh_config=mesh_config_from(config, args.mesh),
                            resume_step=resume,
                            eval_hooks=hooks["eval_hooks"],
                            sample_hooks=hooks["sample_hooks"])
    trainer.install_preemption_handler()
    status = trainer.train(num_steps=args.steps)
    if status == "mem_exit":
        # RSS watchdog fired (host-side transfer leak / memory pressure):
        # state is saved; EX_TEMPFAIL tells the launcher to relaunch with
        # --auto_resume rather than treat the run as finished
        sys.exit(75)


if __name__ == "__main__":
    main()

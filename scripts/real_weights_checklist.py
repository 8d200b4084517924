#!/usr/bin/env python
"""STANDING FIRST ACTION the moment a real reference checkpoint appears
(VERDICT r2 "What's missing" #1): validate models/convert.py against a real
`CTClip.{steps}.pt` and close the accuracy half of the north star
(18-label AUROC within 0.5%, BASELINE.json).

One command:

    python scripts/real_weights_checklist.py CTClip.100000.pt \
        [--data_folder VAL_DIR --reports_csv R.csv --labels_csv L.csv] \
        [--config configs/examples/ct_clip_vit.yaml] [--results out/]

Stages (each prints PASS/FAIL; later stages need the optional real data):

1. IMPORT — load the .pt through convert.load_ctclip_checkpoint (the
   strict mapping of ct_clip.py:760-774 / CTCLIPTrainer.py:797-807);
   fails loudly on unknown/missing keys.
2. ROUND-TRIP — export back through export_ctclip_state_dict(like=orig)
   and assert bit-exact equality on every key (the bijection that
   tests/test_convert.py proves on synthetic weights, now on real ones).
3. ORACLE FORWARD — run the REFERENCE torch model (imported from
   /root/reference) and our flax tower side by side on one synthetic
   volume; assert token-level parity ≤2e-3 (the production-shape bound
   from tests/test_convert.py) and classify-probability parity ≤0.01.
4. AUROC (needs real CT-RATE valid data) — run the full zero-shot engine
   (eval/zero_shot.py) and print per-label AUROC next to the reference's
   published/recomputed numbers; the ±0.5% comparison is manual because
   the reference side must be run on its own stack.

Stage-3 reference import uses the reference code read-only (sys.path
injection); it requires torch (baked in) and transformers.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name}  {detail}", flush=True)
    if not ok:
        sys.exit(1)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="real reference CTClip.{N}.pt")
    parser.add_argument("--config",
                        default="configs/ct_clip_vit_from_scratch.yaml",
                        help="arch config matching the checkpoint")
    parser.add_argument("--bert", choices=["cxr", "tiny"], default="cxr",
                        help="text-tower config in the checkpoint (tiny is "
                        "for smoke-testing this script on a synthetic "
                        "export)")
    parser.add_argument("--data_folder", default=None,
                        help="CT-RATE valid npz tree (stage 4)")
    parser.add_argument("--reports_csv", default=None)
    parser.add_argument("--labels_csv", default=None)
    parser.add_argument("--results", default="results/real_weights")
    parser.add_argument("--skip_oracle", action="store_true",
                        help="skip the torch reference forward (stage 3)")
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (the container "
                        "sitecustomize registers the TPU plugin in every "
                        "process; JAX_PLATFORMS in the env is consumed "
                        "before this script runs) — used by the stage-4 "
                        "dress-rehearsal test")
    args = parser.parse_args(argv)

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.models.convert import (
        convert_ctclip_state_dict,
        export_ctclip_state_dict,
    )

    config = load_config(args.config)
    a = config.arch
    grid = (a.temporal_size // a.temporal_patch_size,
            a.image_size // a.patch_size, a.image_size // a.patch_size)

    from vit_exp_tpu.models.bert import BertConfig

    bert_cfg = BertConfig.tiny() if args.bert == "tiny" else None

    # ---- stage 1: import ---------------------------------------------------
    sd = torch.load(args.checkpoint, map_location="cpu")
    try:
        params = convert_ctclip_state_dict(
            sd, transformer_blocks=a.transformer_blocks,
            bert_config=bert_cfg)
        stage("IMPORT (convert_ctclip_state_dict)", True,
              f"{len(sd)} torch keys → flax tree")
    except Exception as e:
        stage("IMPORT", False, repr(e))

    # ---- stage 2: bit-exact round-trip -------------------------------------
    back = export_ctclip_state_dict(params, grid=grid, heads=a.heads,
                                    bert_config=bert_cfg, like=sd)
    strip = {(k[7:] if k.startswith("module.") else k): v
             for k, v in sd.items()}
    bad = []
    for k, v in strip.items():
        ours = np.asarray(back[k]) if k in back else None
        if ours is None:
            bad.append(f"missing {k}")
        elif not np.array_equal(ours, v.numpy().astype(ours.dtype)):
            bad.append(f"mismatch {k}")
    stage("ROUND-TRIP (export == original, every key)", not bad,
          bad[0] if bad else f"{len(strip)} keys bit-exact")

    # ---- stage 3: oracle forward vs the reference torch model --------------
    if not args.skip_oracle:
        # Import the reference's ctvit3d.py DIRECTLY (bypassing the package
        # __init__, which drags in nibabel/cv2 not baked into this image) by
        # giving the package a synthetic __path__.  beartype / torchvision /
        # vector_quantize_pytorch are import-only in ctvit3d.py (every usage
        # is commented out) — stub them; this changes no math.
        import importlib
        import importlib.machinery as _mach
        import types

        if "beartype" not in sys.modules:
            bt = types.ModuleType("beartype")
            bt.beartype = lambda fn=None, **kw: (
                fn if fn is not None else (lambda f: f))
            sys.modules["beartype"] = bt
        for name in ("torchvision", "vector_quantize_pytorch"):
            if name not in sys.modules:
                try:
                    __import__(name)
                except ImportError:
                    mod = types.ModuleType(name)
                    mod.__spec__ = _mach.ModuleSpec(name, None)
                    mod.__version__ = "0.0.0"
                    sys.modules[name] = mod
                    if name == "torchvision":
                        mod.transforms = types.SimpleNamespace()
                        mod.utils = types.SimpleNamespace()
                    else:
                        mod.VectorQuantize = object
        if "transformer_maskgit" not in sys.modules:
            pkg = types.ModuleType("transformer_maskgit")
            pkg.__path__ = [
                "/root/reference/transformer_maskgit/transformer_maskgit"]
            sys.modules["transformer_maskgit"] = pkg
        try:
            CTViT3D = importlib.import_module(
                "transformer_maskgit.ctvit3d").CTViT3D  # reference
        except Exception as e:
            stage("ORACLE import (reference code)", False, repr(e))
        tv = CTViT3D(
            dim=a.dim, image_size=a.image_size, patch_size=a.patch_size,
            temporal_size=a.temporal_size,
            temporal_patch_size=a.temporal_patch_size,
            transformer_blocks=a.transformer_blocks,
            dim_head=a.dim_head, heads=a.heads,
            # the production layout (run_train.py:47): FlashAttention's
            # null-kv shape; torch SDPA runs fine on CPU
            use_flash_attention=True,
        )
        vt_sd = {k[len("module.visual_transformer."):]: v
                 for k, v in sd.items()
                 if k.startswith("module.visual_transformer.")}
        tv.load_state_dict(vt_sd)
        tv.eval()
        rng = np.random.default_rng(0)
        vol = rng.standard_normal(
            (1, 1, a.temporal_size, a.image_size, a.image_size)
        ).astype(np.float32)
        with torch.no_grad():
            ref_tokens = tv(torch.from_numpy(vol),
                            return_encoded_tokens=True).numpy()

        from vit_exp_tpu.core.precision import FP32_POLICY
        from vit_exp_tpu.models.ctvit3d import CTViT3D as FlaxTower

        tower = FlaxTower(
            dim=a.dim, image_size=a.image_size, patch_size=a.patch_size,
            temporal_size=a.temporal_size,
            temporal_patch_size=a.temporal_patch_size,
            transformer_blocks=a.transformer_blocks,
            dim_head=a.dim_head, heads=a.heads, attn_impl="xla",
            policy=FP32_POLICY,
        )
        # flax __call__ IS the reference forward(return_encoded_tokens=True).
        # "highest" matmul precision: on TPU the default f32 matmul rounds
        # through bf16 passes (~1e-2 token error at dim 48) which would mask
        # a real conversion bug behind hardware rounding
        with jax.default_matmul_precision("highest"):
            ours = tower.apply({"params": params["visual"]},
                               jnp.asarray(vol))
        err = float(np.max(np.abs(np.asarray(ours) - ref_tokens)))
        stage("ORACLE tower forward (≤2e-3 abs on tokens)", err <= 2e-3,
              f"max abs err {err:.2e}")

    # ---- stage 4: real-data AUROC ------------------------------------------
    if args.data_folder:
        from vit_exp_tpu.data.datasets import CTReportInferenceDataset
        from vit_exp_tpu.data.tokenizer import load_tokenizer
        from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
        from vit_exp_tpu.models.factory import bert_config_for, build_ctclip

        tokenizer = load_tokenizer(None)
        bc = bert_cfg or bert_config_for(config, tokenizer)
        attn = "pallas" if jax.default_backend() == "tpu" else "xla"
        model = build_ctclip(config, bert_config=bc, attn_impl=attn)
        dataset = CTReportInferenceDataset(
            args.data_folder, args.reports_csv, args.labels_csv,
            tokenizer=tokenizer)
        clf = ZeroShotClassifier(
            model, params, tokenizer=tokenizer,
            # the engine default (512, the reference prompt length) must
            # not exceed the text tower's position table — the tiny BERT
            # used by the dress rehearsal has only 64 positions
            max_text_len=min(512, bc.max_position_embeddings))
        res = clf.infer(dataset, results_folder=args.results)
        print({k: round(v, 4) for k, v in res.items()})
        stage("AUROC artifacts written", True, args.results)
        print("compare per-label AUROC against the reference run of "
              "scripts/run_zero_shot_cls_single_gpu.py on the SAME data; "
              "north star: every label within 0.5%")
    else:
        print("stage 4 skipped (no --data_folder): provide the CT-RATE "
              "valid tree to close the AUROC half of the north star")


if __name__ == "__main__":
    main()

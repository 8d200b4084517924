"""Training convergence smoke on the real TPU — compiled-kernel gradients.

Three modes:

  python scripts/train_convergence.py [steps=20]          # gradient smoke
  python scripts/train_convergence.py planted [steps]     # LEARNING demo
  python scripts/train_convergence.py planted_seg [steps] # seg-path demo
                                       (held-out dice ≥ CONV_DICE_BOUND)
  python scripts/train_convergence.py planted_openseg [steps]
                                       # open-vocab twin: same planted
                                       # lesions supervised through
                                       # imageopenseg (prompt-aligned
                                       # voxel embeddings), scored by
                                       # dice of thresholded prompt-token
                                       # similarity ≥ CONV_DICE_BOUND

`planted` (VERDICT r2 #6) is the end-to-end learning demonstration the
gradient smoke cannot give: a mid-size arch (dim 384, 4 blocks) trained
through the FULL CTClipTrainer (loader threads, sampler, MultiSteps,
checkpointing) on the planted-signal task (data/planted.py — blob
anatomy ↔ reports built from the exact zero-shot prompt sentences), then
scored with the standard ZeroShotClassifier on a held-out planted set.
PASS = mean per-attribute AUROC ≥ CONV_AUROC_BOUND (default 0.8) — at
chance (0.5) for an untrained or non-learning model, so the bound can
only be met by the model actually learning the image↔text
correspondence.  Stand-in for the reference's debug-30 integration
methodology (configs/train_from_scratch/ct_clip_debug_30_v2.yaml:3-12).

The default (no-arg) smoke overfits ONE synthetic batch with the
production kernels (static-max
attention fwd + one-pass fused bwd, fused GEGLU-FF fwd+bwd, pallas patch
stats — all COMPILED, not interpret mode) and asserts the contrastive
loss drops — the end-to-end gradient check that interpret-mode unit
tests cannot give.

Default config is the "tiny" arch at batch 4: measured on v5e, it learns
0.346 → 0.21 in 20 steps with the pallas kernels, matching the XLA-path
curve.  Larger archs (CONV_ARCH=mid/reduced/full) do NOT converge from
RANDOM init on synthetic data — and neither does the pure-XLA path at
those sizes (verified): at dim 768 with ≥1728 tokens / 12-layer
random-init BERT, both towers' representations concentrate (deep random
transformer rank collapse + 13.8k-token mean pooling), the pairwise
latent similarities become identical, and the InfoNCE loss pins at
exactly ln(b)/b with ~0 gradient signal.  Real training never enters
that regime (pretrained BERT per run_train.py:129-131, real CT data).
Knobs: CONV_ARCH/CONV_ATTN/CONV_FF/CONV_STATS/CONV_BATCH/CONV_TEXT/
CONV_LR/CONV_F32.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_convergence.py [steps=20]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def planted_main(task: str = "cls"):
    """Full-trainer learning demo on the planted-signal task.

    task="cls": contrastive image↔report training scored by zero-shot
    AUROC.  task="seg": closed-set segmentation on planted lesion blobs
    at uniform random locations (data/planted.py::PlantedSegDataset),
    scored by held-out mean dice — chance ≈ 0 for a model that did not
    learn to localize the blobs (VERDICT r2 #6's "synthetic lesion blobs
    for the seg path" variant; reference surface ct_clip.py:1197-1222).
    """
    import os

    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    if task in ("seg", "openseg"):
        bound = float(os.environ.get("CONV_DICE_BOUND", 0.5))
    else:
        bound = float(os.environ.get("CONV_AUROC_BOUND", 0.8))

    import jax

    if os.environ.get("CONV_CPU"):
        # the container sitecustomize registers the TPU plugin in every
        # process (JAX_PLATFORMS in the env is already consumed) — tests
        # pin CPU via jax.config before first backend use
        jax.config.update("jax_platforms", "cpu")

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.data.planted import (
        PLANTED_ATTRS,
        PLANTED_STRUCTS,
        PlantedCTDataset,
        PlantedInferenceDataset,
        PlantedOpenSegDataset,
        PlantedOpenSegInferenceDataset,
        PlantedSegDataset,
        PlantedSegInferenceDataset,
    )
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier, ZeroShotSegmenter
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip
    from vit_exp_tpu.train.trainer import CTClipTrainer

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    out = os.environ.get(
        "CONV_OUT",
        {"seg": "./results/planted_seg",
         "openseg": "./results/planted_openseg"}.get(
            task, "./results/planted_signal"))
    size = os.environ.get("CONV_SIZE", "mid")
    # mid-size arch per the VERDICT item: dim 384, 4 blocks; 12^3 = 1728
    # tokens keeps the host-side volume generation off the critical path
    # on small hosts while still running the production kernel families
    # (ragged-n paths, covered by tests/test_kernel_shape_grid.py).
    # 120^3 voxels / patch 10 (same token grid as 240-res / patch 20 but
    # 4x fewer relay-upload bytes) buys CONTRASTIVE BATCH: at batch 8 the
    # InfoNCE loss saturates below its ln(b)/b chance floor while held-out
    # per-attribute AUROC stalls at 0.68 — within-batch discrimination is
    # solved without disentangling all four attributes.  Batch 32 at the
    # same per-step upload cost forces the finer code and is what carries
    # the demo past the bound.  CONV_SIZE=tiny is the CPU plumbing smoke.
    arch, text_enc = {
        "mid": (
            {"arch_name": "ctvit_3d", "dim": 384, "image_size": 120,
             "patch_size": 10, "temporal_size": 120,
             "temporal_patch_size": 10, "transformer_blocks": 4,
             "dim_head": 32, "heads": 8},
            # a 4-layer text tower learns the sentence patterns quickly;
            # the image side is the mid-size arch under demonstration
            {"num_hidden_layers": 4, "hidden_size": 384,
             "num_attention_heads": 6, "intermediate_size": 1536},
        ),
        "tiny": (
            {"arch_name": "ctvit_3d", "dim": 48, "image_size": 32,
             "patch_size": 8, "temporal_size": 16,
             "temporal_patch_size": 4, "transformer_blocks": 2,
             "dim_head": 8, "heads": 4},
            {"num_hidden_layers": 2, "hidden_size": 32,
             "num_attention_heads": 2, "intermediate_size": 64},
        ),
    }[size]
    # cls: batch 32 — the contrastive signal scales with batch (see the
    # arch comment above); seg: per-sample BCE, batch just amortizes
    # dispatch, and the (C, D, H, W) voxel masks add host→device bytes
    batch = int(os.environ.get(
        "CONV_BATCH", 8 if task in ("seg", "openseg") else 32))
    # open-vocab head config: 16-dim voxel/prompt embeddings (HeadConfig
    # defaults ≡ reference create_head, ct_clip.py:736-750); factor-2
    # strided downsample exercises the ct_clip.py:1101-1106 quirk while
    # keeping the (B, L, h) similarity tensor small
    # openseg demo loss: tversky (one of the reference's seven arms) — the
    # first on-chip run with cos_sim_l2 found the all-background trivial
    # optimum (loss 0.011, dice EXACTLY 0: the L2 on a ~99%-zero target
    # pushes _sim01 below the 0.5 eval threshold for every voxel); the
    # tiny-scale A/B of the imbalance-robust arms measured tversky 0.311
    # vs weighted_bce 0.257 vs cos_sim_l2's degenerate 0 (2026-08-21).
    # Demo default: the FUSION arm (reference config family
    # ct_clip_vit_open_seg_fusion_single_cls.yaml) — an MLP on
    # concat(voxel_emb, prompt_emb) classifies each (voxel, class) pair.
    # Every COSINE-based arm is structurally unable to pass this demo
    # with a random-init text tower (measured, BENCH_NOTES): the two
    # class prompts' CLS embeddings differ by ~0.03% (cos(p0,p1)=1.0000
    # after 1200-1900 steps across tversky / wbce / clip_loss→tversky
    # recipes — all plateau at dice ~0.43 with voxel-IDENTICAL class
    # maps), cosine saturation kills the separating gradient, and
    # clip_loss's dot-product separation hides in |v| magnitude that the
    # cosine eval normalizes away.  The fusion MLP amplifies the tiny
    # prompt difference with learned weights — no cosine geometry
    # required (the reference's pretrained BERT never faces this; its
    # prompts start separated).  tversky keeps the 0.6/0.4 α/β fix
    # (run-2/3 over-segmentation diagnosis) for A/B use.
    loss_type = os.environ.get("CONV_OPENSEG_LOSS", "fusion_focal_loss")
    openseg_arch = {
        "use_open_seg": True,
        "open_seg_loss_type": loss_type,
        "open_seg_loss_hyper_config": (
            {"alpha": float(os.environ.get("CONV_TVERSKY_ALPHA", 0.6)),
             "beta": float(os.environ.get("CONV_TVERSKY_BETA", 0.4))}
            if loss_type == "tversky_loss" else
            # focal alpha = POSITIVE-class weight: ~2% positive voxels
            {"alpha": float(os.environ.get("CONV_FOCAL_ALPHA", 0.75)),
             "gamma": float(os.environ.get("CONV_FOCAL_GAMMA", 2.0))}
            if loss_type in ("fusion_focal_loss", "clip_focal_loss")
            else {}),
        "open_seg_loss_down_factor": 2,
    }
    if loss_type == "fusion_focal_loss":
        # reference yaml nesting (config.py::CTClipArchConfig.from_dict);
        # in_dim = open_seg_head.out_dim + open_text_head.out_dim
        openseg_arch["fusion_head"] = {
            "type": "mlp",
            "mlp": {"n_layers": 2, "in_dim": 32, "mid_dim": 32,
                    "out_dim": 1},
        }
    config = ExperimentConfig.from_dict({
        "random_seed": 0,
        "results_folder": out,
        "trainer": {
            # cls: lr 1e-4 — the tiny-scale A/B (2026-08-21) measured
            # lr 2e-4 COLLAPSING zero-shot transfer (0.532 vs 0.758 at
            # identical ~0.77 image probes, and the 2e-4 run had the LOWER
            # train loss): the higher lr overfits the text tower to the
            # 4-sentence training reports and the single-sentence eval
            # prompts stop transferring.  The run-6 plateau is attacked
            # with MORE STEPS, not more lr.  seg/openseg: 2e-4 — pure
            # voxel losses, no prompt-transfer at stake, and the higher lr
            # fits the (from-scratch) seg heads faster.
            "lr": float(os.environ.get(
                "CONV_LR", 2e-4 if task in ("seg", "openseg") else 1e-4)),
            "warmup_steps": int(os.environ.get(
                "CONV_WARMUP", 30 if task in ("seg", "openseg") else 0)),
            "wd": 0.01,
            "num_train_steps": steps,
            "max_grad_norm": 1.0,
            # periodic async saves so a killed session resumes instead of
            # losing the run (run-5 attempt 1 died at step 128 with
            # save_model_every=0 and had to restart from scratch)
            "save_model_every": int(os.environ.get("CONV_SAVE_EVERY", 100)),
            "eval_model_every": 0,       # scored once, after training
            "balance_loss_weight": [1.0],
        },
        "arch": arch,
        "ct_clip_arch": (
            {"use_seg": True, "seg_head": {"out_dim": len(PLANTED_STRUCTS)}}
            if task == "seg" else openseg_arch if task == "openseg" else {}),
        "train_data_list": [{
            "name": "planted",
            "type": {"seg": "imageseg", "openseg": "imageopenseg"}.get(
                task, "imagereport"),
            "batch_size": batch,
            "num_workers": 2,
        }],
        "text_encoder": text_enc,
    })
    tokenizer = load_tokenizer()
    bert_cfg = bert_config_for(config, tokenizer)
    attn_impl = os.environ.get("CONV_ATTN", "pallas" if on_tpu else "xla")
    ff_impl = os.environ.get("CONV_FF", "pallas" if on_tpu else "xla")
    model = build_ctclip(config, bert_config=bert_cfg,
                         attn_impl=attn_impl, ff_impl=ff_impl)
    # train-set size >= steps*batch: samples are generated lazily per
    # index, so a large n is free — and it makes memorization impossible
    # (the first mid-size TPU run with n=64 drove train loss to 0.09 by
    # MEMORIZING the 64 volumes and scored only 0.668 held-out AUROC;
    # single-epoch data forces the model to read the planted signal)
    train_n = int(os.environ.get("CONV_TRAIN_N", max(64, steps * batch)))
    if task == "seg":
        train_ds = PlantedSegDataset(train_n, arch=config.arch, seed=0)
    elif task == "openseg":
        train_ds = PlantedOpenSegDataset(train_n, arch=config.arch,
                                         tokenizer=tokenizer,
                                         max_text_len=64, seed=0)
    else:
        # CONV_DROP_NEG (default OFF): dropping negative sentences seemed
        # like it would make the single-sentence eval prompts
        # in-distribution, but a tiny-scale CPU A/B measured the opposite
        # — 0.378 mean AUROC with p=0.5 vs 0.772 with p=0 at identical
        # image-side probes (~0.8 all four attrs).  With negatives
        # droppable the positive-sentence set alone determines the
        # labels, so the optimal contrastive text encoder IGNORES the
        # word "not" — and the untrained "X is not present." prompt axis
        # leaves the present/absent softmax arbitrarily signed (measured:
        # consistently INVERTED, all four attrs below chance).  Keeping
        # every negative forces "not" to be load-bearing.  Knob retained
        # for experiments.
        # CONV_DROP_ANY: symmetric per-sentence dropout (default OFF) —
        # the in-distribution fix for the report→single-prompt transfer
        # gap that does NOT de-load "not" (see planted_report docstring)
        train_ds = PlantedCTDataset(
            train_n, arch=config.arch, tokenizer=tokenizer,
            max_text_len=64, seed=0,
            drop_neg_p=float(os.environ.get("CONV_DROP_NEG", 0.0)),
            drop_any_p=float(os.environ.get("CONV_DROP_ANY", 0.0)))
    print(f"planted[{task}]({size}): dim {arch['dim']}/"
          f"{arch['transformer_blocks']} blocks, {steps} steps, "
          f"attn={attn_impl} ff={ff_impl}, bound={bound}", flush=True)
    # resume_step=-1 = latest checkpoint if one exists (fresh dir → None);
    # a rerun after a mid-run death continues rather than restarting
    trainer = CTClipTrainer(model, config, datasets=[train_ds],
                            resume_step=-1)
    status = trainer.train()
    if status != "completed":
        # RSS watchdog / preemption: state is saved; exit EX_TEMPFAIL so
        # an outer retry loop relaunches (auto-resume continues the run)
        print(f"training exited early ({status}) — relaunch to resume",
              flush=True)
        sys.exit(75)

    # Scoring heartbeat: the babysitter (scripts/babysit.py) watches
    # metrics.jsonl mtime for liveness, but scoring writes no metrics —
    # a >tight-limit eval would be killed as "wedged" (happened 12:14
    # 2026-08-21: healthy openseg eval killed at 379 s stale).  Touch the
    # file every 45 s while scoring, BOUNDED to 25 min so a genuinely
    # wedged eval still trips the watchdog instead of hanging forever.
    import threading

    _hb_stop = threading.Event()

    def _heartbeat():
        deadline = time.time() + 1500
        mpath = os.path.join(out, "metrics.jsonl")
        while not _hb_stop.wait(45) and time.time() < deadline:
            try:
                os.utime(mpath)
            except OSError:
                pass

    threading.Thread(target=_heartbeat, daemon=True).start()

    # score with the SERVING kernels the engine defaults to on TPU
    eval_attn = "pallas_static" if on_tpu else "xla"
    eval_model = build_ctclip(config, bert_config=bert_cfg,
                              attn_impl=eval_attn, ff_impl=ff_impl,
                              fuse_qkv=on_tpu)
    if task == "openseg":
        # dice of the training objective's own prediction surface:
        # thresholded (cos+1)/2 similarity between per-voxel embeddings
        # and the class-prompt embeddings (models/losses.py::_sim01 —
        # exactly what cos_sim_l2 regresses toward the 0/1 mask).  An
        # untrained model predicts ~half the voxels ⇒ dice ≈ 2·|G|/L ≈
        # 0.01 at these blob sizes, so the bound is only reachable by
        # learning prompt↔voxel alignment.
        import jax.numpy as jnp

        from vit_exp_tpu.models.ctclip import CTCLIP
        from vit_exp_tpu.models.losses import _sim01

        factor = config.ct_clip_arch.open_seg_loss_down_factor
        pid = jnp.asarray(train_ds.prompt_ids)
        pmask = jnp.asarray(train_ds.prompt_mask)
        fusion = config.ct_clip_arch.open_seg_loss_type == "fusion_focal_loss"

        @jax.jit
        def _open_dice(p, video, mask):
            o = eval_model.apply({"params": p}, video, pid, pmask, factor,
                                 method=CTCLIP.open_seg_forward)
            if fusion:
                # the fusion arm's own prediction surface: sigmoid of the
                # fusion MLP on concat(voxel_emb, prompt_emb) ≥ 0.5 —
                # exactly what fusion_focal_loss trains
                sp, pl = o["seg_preds"], o["prompt_logits"]
                B, L, C = sp.shape[0], sp.shape[1], pl.shape[1]
                cat = jnp.concatenate([
                    jnp.broadcast_to(sp[:, :, None, :],
                                     (B, L, C, sp.shape[-1])),
                    jnp.broadcast_to(pl[:, None, :, :],
                                     (B, L, C, pl.shape[-1])),
                ], axis=-1)
                logit = eval_model.apply(
                    {"params": p}, cat.reshape(-1, cat.shape[-1]),
                    method=CTCLIP.apply_fusion_head)
                pred = (jax.nn.sigmoid(logit.astype(jnp.float32))
                        .reshape(B, L, C) >= 0.5).astype(jnp.float32)
            else:
                pred = (_sim01(o["seg_preds"], o["prompt_logits"])
                        >= 0.5).astype(jnp.float32)          # (B, L, C)
            m = mask[:, :, ::factor, ::factor, ::factor].astype(jnp.float32)
            b, c = m.shape[:2]
            t = m.transpose(0, 2, 3, 4, 1).reshape(b, -1, c)
            inter = jnp.sum(pred * t, axis=1)
            union = jnp.sum(pred, axis=1) + jnp.sum(t, axis=1)
            return 2.0 * inter / union   # (B, C); NaN when absent from both

        eval_n = int(os.environ.get("CONV_EVAL_N", 24))
        eval_ds = PlantedOpenSegInferenceDataset(
            eval_n, arch=config.arch, seed=1)
        chunks = []
        for i0 in range(0, eval_n, 2):
            items = [eval_ds[i] for i in range(i0, min(i0 + 2, eval_n))]
            chunks.append(np.asarray(_open_dice(
                trainer.state.params,
                jnp.asarray(np.stack([it["image"] for it in items])),
                jnp.asarray(np.stack([it["seg_mask"] for it in items])))))
        d = np.concatenate(chunks)                      # (N, C)
        per_class = np.nanmean(d, axis=0)
        mean_dice = float(np.nanmean(per_class))
        os.makedirs(out, exist_ok=True)
        np.save(os.path.join(out, "dice_scores.npy"), d)
        with open(os.path.join(out, "dice_scores.txt"), "w") as f:
            for name, v in zip(PLANTED_STRUCTS, per_class):
                f.write(f"{name}: {v:.4f}\n")
                print(f"  {name}_dice: {v:.4f}", flush=True)
            f.write(f"mean_dice: {mean_dice:.4f}\n")
        print(f"  mean_dice: {mean_dice:.4f}", flush=True)
        assert np.isfinite(mean_dice)
        assert mean_dice >= bound, (
            f"planted-openseg dice {mean_dice:.3f} below the {bound} bound "
            f"(chance ≈ 0.01): the model did not learn prompt↔voxel "
            f"alignment")
        print(f"PLANTED OPENSEG LEARNING OK: mean dice {mean_dice:.3f} >= "
              f"{bound} (chance ~0.01)", flush=True)
        return
    if task == "seg":
        engine = ZeroShotSegmenter(eval_model, trainer.state.params,
                                   batch_size=2)
        eval_n = int(os.environ.get("CONV_EVAL_N", 24))
        res = engine.infer(
            PlantedSegInferenceDataset(eval_n, arch=config.arch, seed=1),
            results_folder=out)
        for k, v in sorted(res.items()):
            print(f"  {k}: {v:.4f}", flush=True)
        mean_dice = res["mean_dice"]
        assert np.isfinite(mean_dice), res
        assert mean_dice >= bound, (
            f"planted-seg dice {mean_dice:.3f} below the {bound} bound "
            f"(chance ≈ 0): the model did not learn to localize the "
            f"planted lesions")
        print(f"PLANTED SEG LEARNING OK: mean dice {mean_dice:.3f} >= "
              f"{bound} (chance ~0)", flush=True)
        return
    engine = ZeroShotClassifier(
        eval_model, trainer.state.params, tokenizer,
        pathologies=list(PLANTED_ATTRS), max_text_len=64, batch_size=4)
    engine.prepare()
    # 128 held-out samples: at 64 the per-attribute AUROC standard error
    # (~±0.07) is a meaningful fraction of the bound margin
    eval_n = int(os.environ.get("CONV_EVAL_N", 128))
    eval_ds = PlantedInferenceDataset(eval_n, arch=config.arch, seed=1)
    res = engine.infer(eval_ds, results_folder=out)
    for k, v in sorted(res.items()):
        print(f"  {k}: {v:.4f}", flush=True)

    # image-side diagnostic: per-attribute AUROC of a closed-form linear
    # probe (class-mean direction) on the IMAGE latents of the same eval
    # set.  Separates image-side feature suppression (probe ≈ 0.5 — the
    # latent never encoded the attribute) from a text/transfer failure
    # (probe high while the zero-shot score is low).  Diagnostic only —
    # fit and scored on the eval set, so it upper-bounds linear
    # decodability rather than estimating generalization.
    import jax.numpy as jnp

    from vit_exp_tpu.models.ctclip import CTCLIP

    @jax.jit
    def _img_latents(p, v):
        toks = eval_model.apply({"params": p}, v,
                                method=CTCLIP.encode_image_tokens)
        return eval_model.apply({"params": p}, toks,
                                method=CTCLIP.image_latents_from_tokens)

    zs, ys = [], []
    for i0 in range(0, eval_n, 4):
        items = [eval_ds[i] for i in range(i0, min(i0 + 4, eval_n))]
        vols = np.stack([it["image"] for it in items])
        zs.append(np.asarray(_img_latents(trainer.state.params,
                                          jnp.asarray(vols))))
        ys.append(np.stack([it["onehot"] for it in items]))
    z = np.concatenate(zs)
    y = np.concatenate(ys)

    def _rank_auroc(score, truth):
        order = np.argsort(score, kind="stable")
        rank = np.empty(len(score)); rank[order] = np.arange(1, len(score) + 1)
        pos = truth > 0.5
        n1, n0 = int(pos.sum()), int((~pos).sum())
        if n1 == 0 or n0 == 0:
            return float("nan")
        return float((rank[pos].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))

    for k, attr in enumerate(PLANTED_ATTRS):
        pos = y[:, k] > 0.5
        w = z[pos].mean(0) - z[~pos].mean(0)
        print(f"  probe_{attr}_auc: {_rank_auroc(z @ w, y[:, k]):.4f}",
              flush=True)
    mean_auc = res["mean_auc"]
    assert np.isfinite(mean_auc), res
    assert mean_auc >= bound, (
        f"planted-signal AUROC {mean_auc:.3f} below the {bound} bound "
        f"(chance = 0.5): the model did not learn the planted "
        f"correspondence")
    print(f"PLANTED LEARNING OK: mean AUROC {mean_auc:.3f} >= {bound} "
          f"(chance 0.5)", flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models import losses
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import TrainState, create_train_state

    import os

    on_tpu = jax.default_backend() == "tpu"
    arch_kind = os.environ.get("CONV_ARCH", "tiny")
    arch = {
        "full": {
            "dim": 768, "image_size": 480, "patch_size": 20,
            "temporal_size": 240, "temporal_patch_size": 10,
            "transformer_blocks": 8, "dim_head": 32, "heads": 8,
        },
        # reduced: 12^3=1728 tokens — small enough for XLA attention, big
        # enough to exercise the production kernels' real block shapes
        "reduced": {
            "dim": 768, "image_size": 240, "patch_size": 20,
            "temporal_size": 120, "temporal_patch_size": 10,
            "transformer_blocks": 4, "dim_head": 32, "heads": 8,
        },
        # mid: 24*12*12 = 3456 tokens = 3x1152 — the EXACT production
        # block tiling (static-max fwd + one-pass fused bwd, no pads)
        "mid": {
            "dim": 768, "image_size": 240, "patch_size": 20,
            "temporal_size": 240, "temporal_patch_size": 10,
            "transformer_blocks": 4, "dim_head": 32, "heads": 8,
        },
        "tiny": {
            "dim": 48, "image_size": 32, "patch_size": 8,
            "temporal_size": 16, "temporal_patch_size": 4,
            "transformer_blocks": 2, "dim_head": 8, "heads": 4,
        },
    }[arch_kind]
    batch = int(os.environ.get("CONV_BATCH", 4))
    # text 16 by default (CONV_TEXT), not the production 512: this smoke initializes BERT-base
    # RANDOMLY (no pretrained weights offline), and a random-init deep
    # transformer rank-collapses over long sequences — at 512 tokens the
    # CLS embedding is the same vector for every input (measured: loss
    # pins at exactly ln(b)/b with ~0 grads; at 16-64 tokens it learns).
    # Real training loads pretrained BERT (run_train.py:129-131) and
    # never sees this regime.
    text_len = int(os.environ.get("CONV_TEXT", 16))
    bert_cfg = BertConfig() if on_tpu else BertConfig.tiny()
    config = ExperimentConfig.from_dict(
        {"trainer": {"lr": float(__import__("os").environ.get("CONV_LR", 3e-4)), "max_grad_norm": 0.5}, "arch": arch}
    )
    attn_impl = os.environ.get(
        "CONV_ATTN", "pallas_static" if on_tpu else "xla")
    ff_impl = os.environ.get("CONV_FF", "pallas" if on_tpu else "xla")
    print(f"arch={arch_kind} attn={attn_impl} ff={ff_impl} "
          f"lr={config.trainer.lr}", flush=True)
    if os.environ.get("CONV_STATS"):
        import functools as _ft

        import vit_exp_tpu.models.ctvit3d as _m
        import vit_exp_tpu.ops.patches as _p
        _m.fused_patch_embed = _ft.partial(
            _p.fused_patch_embed, stats_impl=os.environ["CONV_STATS"])
        print(f"stats={os.environ['CONV_STATS']}", flush=True)
    pol = {}
    if os.environ.get("CONV_F32"):
        from vit_exp_tpu.core.precision import FP32_POLICY
        pol = {"policy": FP32_POLICY}
        print("fp32 compute", flush=True)
    model = build_ctclip(
        config, bert_config=bert_cfg,
        attn_impl=attn_impl, ff_impl=ff_impl, **pol,
    )
    a = config.arch
    rng = np.random.default_rng(0)
    # Macro-structure per sample: i.i.d.-voxel noise is pathological for a
    # mean-pooled patch encoder — the mean over 13.8k patch projections
    # concentrates to the SAME latent for every sample (loss pins at
    # exactly ln(b)/b chance with ~0 grads; measured).  Real CT has
    # low-frequency anatomy; emulate it with a per-sample blocky field.
    T, S = a.temporal_size, a.image_size
    coarse = rng.standard_normal((batch, 1, max(T // 40, 2),
                                  max(S // 40, 2), max(S // 40, 2)))
    lowfreq = coarse.repeat(T // coarse.shape[2], 2) \
                    .repeat(S // coarse.shape[3], 3) \
                    .repeat(S // coarse.shape[4], 4)
    video = jnp.asarray(
        0.3 * rng.standard_normal(lowfreq.shape) + lowfreq, jnp.bfloat16)
    # DISTINGUISHABLE synthetic text: 512 i.i.d.-random tokens per sample
    # concentrate BERT's CLS to a near-identical vector for every sample
    # (no contrastive signal — loss pins at exactly ln(b)/b with ~0 grads;
    # measured on both CPU and TPU).  Give each sample its own token
    # pattern instead.
    ids = np.tile(
        rng.integers(0, bert_cfg.vocab_size, (batch, 8)),
        (1, -(-text_len // 8)))[:, :text_len]
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1])
    )["params"]
    tx = build_optimizer(config.trainer)
    batch_dict = {"image": video, "input_ids": ids, "attention_mask": mask}

    def step(state, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["image"],
                              batch["input_ids"], batch["attention_mask"])
            # freeze the temperature: on random data it collapses to -inf
            # (flattening the loss at chance with vanishing grads), which
            # would mask the gradient-correctness signal this smoke is for
            return losses.infonce_loss(
                out["text_latents"], out["image_latents"],
                jax.lax.stop_gradient(out["temperature"]))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        gn = optax.global_norm(grads)
        un = optax.global_norm(updates)
        return (TrainState(optax.apply_updates(state.params, updates),
                           opt_state, state.step + 1),
                jnp.stack([loss, gn, un]))

    chunk = 10

    @__import__("functools").partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, batch):
        def body(i, carry):
            st, ls = carry
            st, l = step(st, batch)
            return st, ls.at[i].set(l)
        return jax.lax.fori_loop(
            0, chunk, body, (state, jnp.zeros((chunk, 3), jnp.float32)))

    state = create_train_state(params, tx)
    all_losses = []
    t0 = time.perf_counter()
    for c in range(-(-steps // chunk)):
        state, ls = run_chunk(state, batch_dict)
        ls = np.asarray(ls)  # host read forces execution on the relay
        all_losses += list(ls[:, 0])
        print(f"steps {c * chunk + 1}-{(c + 1) * chunk}: "
              + " ".join(f"{v:.4f}" for v in ls[:, 0]), flush=True)
        print("  gnorm: " + " ".join(f"{v:.4f}" for v in ls[:, 1])
              + "\n  upnorm: " + " ".join(f"{v:.4f}" for v in ls[:, 2]),
              flush=True)
    dt = time.perf_counter() - t0

    first, last = all_losses[0], np.mean(all_losses[-5:])
    print(f"loss {first:.4f} -> {last:.4f} over {len(all_losses)} steps "
          f"({dt:.0f}s incl. compile)", flush=True)
    assert np.isfinite(all_losses).all(), "non-finite loss"
    assert last < first * 0.75, (
        f"loss did not converge: {first:.4f} -> {last:.4f}")
    print("CONVERGENCE OK", flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["planted"]:
        planted_main("cls")
    elif sys.argv[1:2] == ["planted_seg"]:
        planted_main("seg")
    elif sys.argv[1:2] == ["planted_openseg"]:
        planted_main("openseg")
    else:
        main()

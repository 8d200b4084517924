"""Training convergence smoke on the real TPU — compiled-kernel gradients.

Two modes:

  python scripts/train_convergence.py [steps=20]      # gradient smoke
  python scripts/train_convergence.py planted [steps] # LEARNING demo

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


def planted_main():
    """Full-trainer learning demo on the planted-signal task."""
    import os

    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    bound = float(os.environ.get("CONV_AUROC_BOUND", 0.8))

    import jax

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.data.planted import (
        PLANTED_ATTRS,
        PlantedCTDataset,
        PlantedInferenceDataset,
    )
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip
    from vit_exp_tpu.train.trainer import CTClipTrainer

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    out = os.environ.get("CONV_OUT", "./results/planted_signal")
    size = os.environ.get("CONV_SIZE", "mid")
    # mid-size arch per the VERDICT item: dim 384, 4 blocks; 12^3 = 1728
    # tokens keeps the host-side volume generation off the critical path
    # on small hosts while still running the production kernel families
    # (ragged-n paths, covered by tests/test_kernel_shape_grid.py).
    # CONV_SIZE=tiny is the CPU plumbing smoke.
    arch, text_enc = {
        "mid": (
            {"arch_name": "ctvit_3d", "dim": 384, "image_size": 240,
             "patch_size": 20, "temporal_size": 120,
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
    config = ExperimentConfig.from_dict({
        "random_seed": 0,
        "results_folder": out,
        "trainer": {
            "lr": float(os.environ.get("CONV_LR", 1e-4)),
            "wd": 0.01,
            "num_train_steps": steps,
            "max_grad_norm": 1.0,
            "save_model_every": 0,       # final save only
            "eval_model_every": 0,       # scored once, after training
            "balance_loss_weight": [1.0],
        },
        "arch": arch,
        "train_data_list": [{
            "name": "planted", "type": "imagereport",
            "batch_size": int(os.environ.get("CONV_BATCH", 8)),
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
    train_ds = PlantedCTDataset(64, arch=config.arch, tokenizer=tokenizer,
                                max_text_len=64, seed=0)
    print(f"planted({size}): dim {arch['dim']}/{arch['transformer_blocks']} "
          f"blocks, {steps} steps, attn={attn_impl} ff={ff_impl}, "
          f"bound={bound}", flush=True)
    trainer = CTClipTrainer(model, config, datasets=[train_ds])
    trainer.train()

    # score with the SERVING kernels the engine defaults to on TPU
    eval_attn = "pallas_static" if on_tpu else "xla"
    eval_model = build_ctclip(config, bert_config=bert_cfg,
                              attn_impl=eval_attn, ff_impl=ff_impl,
                              fuse_qkv=on_tpu)
    engine = ZeroShotClassifier(
        eval_model, trainer.state.params, tokenizer,
        pathologies=list(PLANTED_ATTRS), max_text_len=64, batch_size=4)
    engine.prepare()
    res = engine.infer(PlantedInferenceDataset(32, arch=config.arch, seed=1),
                       results_folder=out)
    for k, v in sorted(res.items()):
        print(f"  {k}: {v:.4f}", flush=True)
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
        planted_main()
    else:
        main()

"""Jitted per-data-type train steps.

Mirrors the reference dispatch (ct_clip.py:857-867) as SEPARATE jitted
functions per data type — batch shapes differ between imagereport / imageseg
/ imageopenseg, so one compiled program per type avoids retracing storms
(SURVEY.md §7 hard-part #6).  The trainer (train/trainer.py) picks which to
call per micro-batch from the DatasetSampler schedule and lets
optax.MultiSteps apply the update every k micro-steps (the accelerate
`accumulate` equivalent, CTCLIPTrainer.py:593-600).

Sharding: params are laid out by their logical axes; batches are sharded on
(data, fsdp).  The global-batch InfoNCE is written over global latents — XLA
inserts the all-gather over ICI (replacing distributed.py:9-20) and its
transpose (the reduce-scatter backward) automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.models import losses
from vit_exp_tpu.models.ctclip import CTCLIP


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def create_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _apply_update(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1)


def make_train_steps(
    model: CTCLIP,
    tx: optax.GradientTransformation,
    config: ExperimentConfig,
    *,
    n_data_shards: int = 1,
) -> Dict[str, Callable]:
    """Returns {data_type: jitted step fn}.  Each fn:
    (state, batch_dict, loss_weight) → (state, metrics_dict)."""

    ca = config.ct_clip_arch
    text_w = ca.text_ssl_loss_weight if ca.use_mlm else 0.0
    image_w = ca.image_ssl_loss_weight if ca.use_visual_ssl else 0.0
    # reference loss combine (ct_clip.py:1761-1765): contrastive weight
    # yields to the enabled SSL terms
    cl_w = 1.0 - (text_w + image_w)

    def imagereport_loss(params, batch, rng):
        out = model.apply(
            {"params": params}, batch["image"], batch["input_ids"],
            batch.get("attention_mask"),
        )
        global_b = out["text_latents"].shape[0]
        local_b = max(global_b // n_data_shards, 1)
        loss = losses.infonce_loss(
            out["text_latents"], out["image_latents"], out["temperature"],
            local_batch_size=local_b,
            # ct_clip.py:1366-1368 — positive pair masked out of the
            # denominator when decoupled_contrastive_learning is set
            decoupled=ca.decoupled_contrastive_learning,
        )
        metrics = {"cl_loss": loss}
        if text_w == 0.0 and image_w == 0.0:
            return loss, metrics
        total = cl_w * loss
        mlm_rng, ssl_rng = jax.random.split(rng)
        if ca.use_mlm:
            from vit_exp_tpu.models import mlm as mlm_mod

            corrupted, loss_mask = mlm_mod.mlm_corrupt(
                mlm_rng, batch["input_ids"],
                mask_token_id=ca.mlm_mask_token_id,
                vocab_size=model.bert_config.vocab_size,
                mask_prob=ca.mlm_mask_prob,
            )
            logits = model.apply(
                {"params": params}, corrupted, batch.get("attention_mask"),
                method=CTCLIP.mlm_logits,
            )
            t_loss = mlm_mod.mlm_loss(logits, batch["input_ids"], loss_mask)
            metrics["text_ssl_loss"] = t_loss
            total = total + text_w * t_loss
        if ca.use_visual_ssl:
            from vit_exp_tpu.models import visual_ssl as vssl

            r1, r2 = jax.random.split(ssl_rng)
            v1 = vssl.random_augment_3d(r1, batch["image"])
            v2 = vssl.random_augment_3d(r2, batch["image"])

            def project(v):
                return model.apply({"params": params}, v,
                                   method=CTCLIP.ssl_project)

            z1, z2 = project(v1), project(v2)
            if ca.visual_ssl_type == "simsiam":
                def predict(z):
                    return model.apply({"params": params}, z,
                                       method=CTCLIP.ssl_predict)

                i_loss = vssl.simsiam_loss(predict(z1), z1, predict(z2), z2)
            elif ca.visual_ssl_type == "simclr":
                i_loss = vssl.nt_xent_loss(z1, z2)
            else:
                raise ValueError(
                    f"unknown visual_ssl_type {ca.visual_ssl_type!r}")
            metrics["image_ssl_loss"] = i_loss
            total = total + image_w * i_loss
        return total, metrics

    def imageseg_loss(params, batch, rng):
        del rng
        seg_logits = model.apply(
            {"params": params}, batch["image"], method=CTCLIP.seg_forward
        )
        loss = losses.seg_bce_loss(seg_logits, batch["seg_mask"])
        return loss, {"seg_loss": loss}

    def imageopenseg_loss(params, batch, rng):
        del rng
        out = model.apply(
            {"params": params}, batch["image"], batch["prompt_ids"],
            batch.get("prompt_mask"),
            method=CTCLIP.open_seg_forward,
        )
        factor = config.ct_clip_arch.open_seg_loss_down_factor
        seg_mask = batch["seg_mask"]
        if factor > 1:
            seg_mask = seg_mask[:, :, ::factor, ::factor, ::factor]
        b, c = seg_mask.shape[:2]
        seg_mask_flat = seg_mask.transpose(0, 2, 3, 4, 1).reshape(b, -1, c)

        fusion_apply = None
        if config.ct_clip_arch.fusion_head is not None:
            def fusion_apply(x):
                return model.apply(
                    {"params": params}, x, method=CTCLIP.apply_fusion_head
                )

        loss = losses.open_seg_loss(
            out["seg_preds"], seg_mask_flat, out["prompt_logits"],
            loss_type=config.ct_clip_arch.open_seg_loss_type,
            hyper=config.ct_clip_arch.open_seg_loss_hyper_config,
            fusion_head_apply=fusion_apply,
        )
        return loss, {"open_seg_loss": loss}

    loss_fns = {
        "imagereport": imagereport_loss,
        "imageseg": imageseg_loss,
        "imageopenseg": imageopenseg_loss,
    }

    steps = {}
    for name, loss_fn in loss_fns.items():

        def step(state: TrainState, batch, loss_weight, _loss_fn=loss_fn):
            # deterministic per-step rng for SSL corruption/augmentation
            rng = jax.random.fold_in(
                jax.random.PRNGKey(config.random_seed), state.step
            )

            def weighted(params):
                loss, metrics = _loss_fn(params, batch, rng)
                # per-dataset balance_loss_weight (CTCLIPTrainer.py:603-606)
                return loss * loss_weight, metrics

            (loss, metrics), grads = jax.value_and_grad(
                weighted, has_aux=True
            )(state.params)
            new_state = _apply_update(state, grads, tx)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return new_state, metrics

        steps[name] = jax.jit(step, donate_argnums=(0,))
    return steps

"""Optimizer factory (optax), matching transformer_maskgit/optimizer.py:10-34:

- wd == 0 → Adam(betas=(0.9, 0.99), eps=1e-8);
- wd > 0  → AdamW with weight decay applied only to params of ndim >= 2
  (separate_weight_decayable_params, optimizer.py:3-8);
- plus grad clipping (clip_grad_norm_, CTCLIPTrainer.py:711-712) and the
  trainer's placeholder StepLR(gamma=1.0) ≡ constant schedule
  (CTCLIPTrainer.py:410-416), with an optional linear warmup extension.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from vit_exp_tpu.core.config import TrainerConfig


def weight_decay_mask(params):
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def build_optimizer(
    config: TrainerConfig,
    *,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    if schedule is None:
        if config.warmup_steps > 0:
            schedule = optax.linear_schedule(
                0.0, config.lr, config.warmup_steps
            )
        else:
            schedule = optax.constant_schedule(config.lr)

    if config.wd == 0:
        opt = optax.adam(schedule, b1=0.9, b2=0.99, eps=1e-8)
    else:
        opt = optax.adamw(
            schedule, b1=0.9, b2=0.99, eps=1e-8,
            weight_decay=config.wd, mask=weight_decay_mask,
        )

    chain = []
    if config.max_grad_norm and config.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(config.max_grad_norm))
    chain.append(opt)
    tx = optax.chain(*chain)

    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=config.gradient_accumulation_steps
        )
    return tx

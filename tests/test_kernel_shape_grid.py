"""Shape-grid differentials for the attention kernel families.

The kernels carry shape-dependent dispatch (block planning, lane/sublane
padding, heads-packed support, combined-kv slicing) and the one real
wrong-values bug found in review lived exactly on such an edge (the
combined-kv fallback at heads·d % 128 != 0).  This module sweeps a
curated grid of odd shapes — ragged sequence lengths, head dims that
don't divide the 128-lane granule, odd head counts, q/kv length
mismatches — through every forward family in interpret mode and checks
each against a plain-XLA oracle.  Complements the targeted tests in
test_flash_attention.py / test_attention.py (reference parity, grads,
null-kv strategies) with breadth across the shape space.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_exp_tpu.ops.attention import (cosine_attention,
                                       cosine_attention_packed)
from vit_exp_tpu.ops.flash_attention import flash_attention, hp_supported


def _mk(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _sdpa_ref(q, k, v, scale=None):
    scale = scale or 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, v)


# (b, h, nq, nkv, d, n_null): ragged lengths vs the 32-blocks, lane-pad
# head dims (24, 40), odd head counts, q/kv mismatches, null kv
GRID = [
    (1, 1, 32, 32, 8, 0),      # minimal, exact blocks
    (1, 3, 65, 65, 16, 0),     # odd heads, ragged both
    (2, 2, 100, 100, 24, 0),   # d=24: lane padding (dp != d)
    (1, 2, 48, 80, 16, 0),     # nq != nkv, both ragged
    (1, 2, 64, 33, 32, 0),     # ragged kv only
    (1, 1, 96, 96, 40, 2),     # padded d + null kv
    (2, 3, 65, 64, 8, 2),      # odd heads + ragged q + null kv
]


@pytest.mark.parametrize("b,h,nq,nkv,d,n_null", GRID)
def test_flash_attention_online_shape_grid(b, h, nq, nkv, d, n_null):
    q = _mk((b, h, nq, d), seed=nq * 7 + d)
    k = _mk((b, h, nkv, d), seed=nkv * 11 + d)
    v = _mk((b, h, nkv, d), seed=nkv * 13 + d)
    kw = {}
    kr, vr = k, v
    if n_null:
        nk = _mk((b, h, n_null, d), seed=17)
        nv = _mk((b, h, n_null, d), seed=19)
        kw = dict(null_k=nk, null_v=nv)
        kr = jnp.concatenate([nk, k], axis=2)
        vr = jnp.concatenate([nv, v], axis=2)
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True,
                          **kw)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sdpa_ref(q, kr, vr)),
                               atol=3e-5, err_msg=f"{(b, h, nq, nkv, d)}")


@pytest.mark.parametrize("b,h,nq,nkv,d,n_null", GRID)
def test_cosine_attention_static_max_shape_grid(b, h, nq, nkv, d, n_null):
    """The bounded-logit (static-max) forward across the same grid, with
    the full cosine prologue (l2norm + learned per-dim scales)."""
    rng = np.random.default_rng(d * 31 + nq)
    q = _mk((b, h, nq, d), seed=nq * 3 + d)
    k = _mk((b, h, nkv, d), seed=nkv * 5 + d)
    v = _mk((b, h, nkv, d), seed=nkv * 9 + d)
    kw = dict(
        q_scale=jnp.asarray((1 + 0.1 * rng.standard_normal(d)
                             ).astype(np.float32)),
        k_scale=jnp.asarray((1 + 0.1 * rng.standard_normal(d)
                             ).astype(np.float32)),
        scale=None,
    )
    if n_null:
        kw["null_k"] = _mk((h, n_null, d), seed=23)
        kw["null_v"] = _mk((h, n_null, d), seed=29)
    ref = cosine_attention(q, k, v, impl="xla", **kw)
    out = cosine_attention(q, k, v, impl="pallas", static_max=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, err_msg=f"{(b, h, nq, nkv, d)}")
    out8 = cosine_attention(q, k, v, impl="pallas", static_max=True,
                            quantized=True, **kw)
    ref_np, out8_np = np.asarray(ref), np.asarray(out8)
    rel = np.abs(out8_np - ref_np).max() / np.abs(ref_np).max()
    assert rel < 0.08, f"{(b, h, nq, nkv, d)}: int8 rel err {rel}"


# packed layout: (heads, d, n) — both sides of the hp shape contract.
# hp-eligible rows need heads·d % 128 == 0, d | 128, and a block plan with
# no row padding (n <= the default block, or divisible by the 1152 edge)
PACKED_GRID = [
    (16, 8, 64, True),     # hd=128, hp kernel
    (8, 16, 96, True),     # hd=128, d=16
    (4, 32, 64, True),     # production-like d=32
    (8, 16, 65, True),     # sub-block n clamps block to 65 — still hp
    (3, 16, 64, False),    # hd=48: falls back (lane-granule violation)
    (8, 16, 1025, False),  # n > block and ragged: falls back (row pad)
    (2, 24, 64, False),    # d doesn't divide 128: falls back
]


@pytest.mark.parametrize("heads,d,n,want_hp", PACKED_GRID)
@pytest.mark.parametrize("quantized", [False, True])
def test_packed_matches_transpose_path_shape_grid(heads, d, n, want_hp,
                                                  quantized):
    """cosine_attention_packed == the (b,h,n,d) transpose path on every
    grid point — via the hp kernel where the contract holds (asserted),
    via the documented fallback elsewhere (never silent wrong values)."""
    assert hp_supported(n, n, heads, d) == want_hp
    rng = np.random.default_rng(heads * 41 + d + n)
    b, hd = 1, heads * d
    q = _mk((b, n, hd), seed=n + d)
    k = _mk((b, n, hd), seed=n + d + 1)
    v = _mk((b, n, hd), seed=n + d + 2)
    kw = dict(
        null_k=_mk((heads, 2, d), seed=37),
        null_v=_mk((heads, 2, d), seed=43),
        q_scale=jnp.asarray((1 + 0.1 * rng.standard_normal(d)
                             ).astype(np.float32)),
        k_scale=jnp.asarray((1 + 0.1 * rng.standard_normal(d)
                             ).astype(np.float32)),
        scale=None,
    )
    out = cosine_attention_packed(q, k, v, heads, quantized=quantized, **kw)
    assert out.shape == (b, n, hd)

    def unpack(t):
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    ref = cosine_attention(unpack(q), unpack(k), unpack(v), impl="xla", **kw)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(b, n, hd))
    out_np = np.asarray(out)
    if quantized:
        rel = np.abs(out_np - ref).max() / np.abs(ref).max()
        assert rel < 0.08, f"{(heads, d, n)}: int8 rel err {rel}"
    elif want_hp:
        # the hp kernel keeps p/PV in bf16 by design (BENCH_NOTES
        # "int8 redesign") — bf16-level tolerance, not fp32
        rel = np.abs(out_np - ref).max() / np.abs(ref).max()
        assert rel < 0.02, f"{(heads, d, n)}: bf16 rel err {rel}"
    else:
        np.testing.assert_allclose(out_np, ref, atol=3e-5,
                                   err_msg=f"{(heads, d, n)}")


# gradient grid: hits BOTH backward kernels — exact tiling selects the
# one-pass fused bwd (incl. the q-block doubling at nq % 2·block == 0),
# ragged/mismatched lengths select the concat bwd, null kv adds the
# outside-the-kernel einsum terms
GRAD_GRID = [
    (1, 2, 64, 64, 16, 0),     # fused bwd, bq doubles (64 % 64 == 0)
    (1, 1, 96, 96, 24, 0),     # fused bwd (96 % 32), padded d
    (1, 3, 65, 65, 16, 0),     # concat bwd (ragged)
    (1, 2, 48, 80, 16, 0),     # concat bwd (nq != nkv, both ragged)
    (2, 2, 64, 64, 8, 2),      # fused bwd + null-kv gradient terms
    (1, 2, 100, 100, 16, 2),   # concat bwd + null-kv gradient terms
]


@pytest.mark.parametrize("b,h,nq,nkv,d,n_null", GRAD_GRID)
def test_flash_attention_grad_shape_grid(b, h, nq, nkv, d, n_null):
    q = _mk((b, h, nq, d), seed=nq + d)
    k = _mk((b, h, nkv, d), seed=nkv + d + 1)
    v = _mk((b, h, nkv, d), seed=nkv + d + 2)
    cot = _mk((b, h, nq, d), seed=nkv + d + 3)
    nk = nv = None
    if n_null:
        nk = _mk((b, h, n_null, d), seed=53)
        nv = _mk((b, h, n_null, d), seed=59)

    def loss_flash(q, k, v, nk, nv):
        kw = dict(null_k=nk, null_v=nv) if n_null else {}
        out = flash_attention(q, k, v, block_q=32, block_k=32,
                              interpret=True, **kw)
        return jnp.vdot(out, cot)

    def loss_ref(q, k, v, nk, nv):
        kr, vr = k, v
        if n_null:
            kr = jnp.concatenate([nk, k], axis=2)
            vr = jnp.concatenate([nv, v], axis=2)
        return jnp.vdot(_sdpa_ref(q, kr, vr), cot)

    argnums = (0, 1, 2, 3, 4) if n_null else (0, 1, 2)
    ours = jax.grad(loss_flash, argnums=argnums)(q, k, v, nk, nv)
    refs = jax.grad(loss_ref, argnums=argnums)(q, k, v, nk, nv)
    for o, r, name in zip(ours, refs, ("dq", "dk", "dv", "dnk", "dnv")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=5e-5, rtol=1e-4,
            err_msg=f"{name} {(b, h, nq, nkv, d, n_null)}")


@pytest.mark.parametrize("b,h,nq,nkv,d,n_null",
                         [(1, 2, 64, 64, 16, 0), (1, 3, 65, 65, 16, 2)])
def test_static_max_grad_shape_grid(b, h, nq, nkv, d, n_null):
    """Static-max (bounded-logit) gradients == the xla cosine path on a
    fused-bwd and a concat-bwd shape, with the full cosine prologue."""
    rng = np.random.default_rng(d + nq)
    q = _mk((b, h, nq, d), seed=nq + d + 4)
    k = _mk((b, h, nkv, d), seed=nkv + d + 5)
    v = _mk((b, h, nkv, d), seed=nkv + d + 6)
    cot = _mk((b, h, nq, d), seed=nkv + d + 7)
    q_scale = jnp.asarray((1 + 0.1 * rng.standard_normal(d)
                           ).astype(np.float32))
    k_scale = jnp.asarray((1 + 0.1 * rng.standard_normal(d)
                           ).astype(np.float32))
    nk = nv = None
    if n_null:
        nk = _mk((h, n_null, d), seed=61)
        nv = _mk((h, n_null, d), seed=67)

    def loss(impl, static_max):
        def f(q, k, v):
            kw = dict(null_k=nk, null_v=nv) if n_null else {}
            out = cosine_attention(q, k, v, impl=impl,
                                   static_max=static_max,
                                   q_scale=q_scale, k_scale=k_scale,
                                   scale=None, **kw)
            return jnp.vdot(out, cot)
        return f

    ours = jax.grad(loss("pallas", True), argnums=(0, 1, 2))(q, k, v)
    refs = jax.grad(loss("xla", False), argnums=(0, 1, 2))(q, k, v)
    for o, r, name in zip(ours, refs, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=5e-5, rtol=1e-4,
            err_msg=f"{name} {(b, h, nq, nkv, d, n_null)}")


@pytest.mark.parametrize("m,dim,inner", [(65, 16, 24), (33, 40, 8)])
def test_geglu_ff_odd_split_shape_grid(m, dim, inner):
    """fused GEGLU-FF fwd+bwd at val/gate split boundaries that are not
    lane multiples (inner 24, 8) and lane-padded dims (40)."""
    from vit_exp_tpu.ops.geglu_ff import fused_geglu_ff

    rng = np.random.default_rng(m + dim)
    x = jnp.asarray(rng.standard_normal((1, m, dim)).astype(np.float32))
    gamma = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(dim)).astype(np.float32))
    beta = jnp.asarray((0.1 * rng.standard_normal(dim)).astype(np.float32))
    w1 = jnp.asarray(
        rng.standard_normal((dim, 2 * inner)).astype(np.float32)
        / np.sqrt(dim))
    w2 = jnp.asarray(
        rng.standard_normal((inner, dim)).astype(np.float32)
        / np.sqrt(inner))
    cot = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def ref(x, gamma, beta, w1, w2):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        val, gate = jnp.split(y @ w1, 2, axis=-1)
        return jnp.vdot((jax.nn.gelu(gate, approximate=False) * val) @ w2,
                        cot)

    def ours(x, gamma, beta, w1, w2):
        return jnp.vdot(
            fused_geglu_ff(x, gamma, beta, w1, w2, block_m=32), cot)

    np.testing.assert_allclose(
        float(ours(x, gamma, beta, w1, w2)),
        float(ref(x, gamma, beta, w1, w2)), rtol=1e-5)
    ref_g = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w1, w2)
    our_g = jax.grad(ours, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w1, w2)
    for r, o, name in zip(ref_g, our_g,
                          ("dx", "dgamma", "dbeta", "dw1", "dw2")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


@pytest.mark.parametrize("m,dim,fq,fkv", [(65, 24, 40, 16), (32, 16, 8, 72)])
def test_fused_ln_qkv_odd_widths_shape_grid(m, dim, fq, fkv):
    """fused LN→qkv projection at q/kv output widths that are not lane
    multiples — the q/kv split boundary must land exactly."""
    from vit_exp_tpu.ops.fused_proj import fused_ln_qkv

    rng = np.random.default_rng(m + fq)
    x = jnp.asarray(rng.standard_normal((2, m, dim)).astype(np.float32))
    gamma = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(dim)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((dim, fq)).astype(np.float32))
    wkv = jnp.asarray(rng.standard_normal((dim, fkv)).astype(np.float32))
    q, kv = fused_ln_qkv(x, gamma, wq, wkv)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma
    np.testing.assert_allclose(np.asarray(q), np.asarray(y @ wq),
                               atol=3e-5, rtol=1e-5)
    # kv projects from the RAW (pre-norm) input — the reference binds
    # kv_input before x = self.norm(x) (attention.py:240-244)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(x @ wkv),
                               atol=3e-5, rtol=1e-5)


def test_combined_kv_width_mismatch_raises():
    """A combined-kv tensor whose width is neither heads·d nor 2·heads·d
    must raise, not be silently sliced (the review-found bug class)."""
    heads, d, n = 3, 16, 65  # fallback path (both contract violations)
    hd = heads * d
    q = _mk((1, n, hd), seed=1)
    k = _mk((1, n, hd), seed=2)
    v_bad = _mk((1, n, hd + 8), seed=3)
    with pytest.raises(ValueError, match="combined kv"):
        cosine_attention_packed(q, k, v_bad, heads, scale=None)

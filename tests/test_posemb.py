"""3D sincos position embedding parity (vs ctvit3d.py:121-169 semantics)."""

import numpy as np

from vit_exp_tpu.ops.posemb import sincos_pos_embed_3d


def _oracle_1d(dim, positions):
    half = dim // 2
    omega = 1.0 / 10000 ** (np.arange(half) / half)
    out = np.zeros((len(positions), dim))
    for m, p in enumerate(positions):
        out[m, :half] = np.sin(p * omega)
        out[m, half:] = np.cos(p * omega)
    return out


def _oracle(embed_dim, n_t, n_h, n_w):
    """Loop-based oracle reproducing the reference's meshgrid('xy') + reshape
    buffer reinterpretation, written independently of both implementations."""
    # np.meshgrid(t, w, h) with 'xy' indexing: outputs shaped (n_w, n_t, n_h),
    # element [i, j, k] = (t[j], w[i], h[k]) for the three outputs resp.
    g_t = np.empty((n_w, n_t, n_h))
    g_w = np.empty((n_w, n_t, n_h))
    g_h = np.empty((n_w, n_t, n_h))
    for i in range(n_w):
        for j in range(n_t):
            for k in range(n_h):
                g_t[i, j, k] = j
                g_w[i, j, k] = i
                g_h[i, j, k] = k
    part = embed_dim // 3
    # reference encodes [t-grid, h-slot gets grid[1]=w-values, w-slot gets
    # grid[2]=h-values] then flattens each C-order
    return np.concatenate(
        [
            _oracle_1d(part, g_t.reshape(-1)),
            _oracle_1d(part, g_w.reshape(-1)),
            _oracle_1d(part, g_h.reshape(-1)),
        ],
        axis=1,
    )


def test_matches_oracle_cube():
    emb = sincos_pos_embed_3d(24, (4, 4, 4))
    oracle = _oracle(24, 4, 4, 4)
    np.testing.assert_allclose(emb, oracle, atol=1e-6)


def test_matches_oracle_noncube():
    emb = sincos_pos_embed_3d(12, (3, 2, 2))
    # non-cube: the reshape reinterprets the (n_w, n_t, n_h) buffer as
    # (n_t, n_w, n_h) — flat C-order is identical, so the oracle still holds
    oracle = _oracle(12, 3, 2, 2)
    assert emb.shape == (12, 12)
    np.testing.assert_allclose(emb, oracle, atol=1e-6)


def test_shape_and_dtype():
    emb = sincos_pos_embed_3d(768, (24, 24, 24))
    assert emb.shape == (24 ** 3, 768)
    assert emb.dtype == np.float32
    # first position is all sin(0)=0 / cos(0)=1 halves per third
    third = 768 // 3
    for s in range(3):
        seg = emb[0, s * third:(s + 1) * third]
        np.testing.assert_allclose(seg[: third // 2], 0.0, atol=1e-7)
        np.testing.assert_allclose(seg[third // 2:], 1.0, atol=1e-7)


def test_traced_posemb_matches_numpy():
    """The jnp-traced table (no HLO literal) == the float64 numpy table to
    fp32 sin/cos accuracy, production grid included."""
    import jax
    from vit_exp_tpu.ops.posemb import sincos_pos_embed_3d_traced

    for dim, grid in ((48, (4, 3, 2)), (768, (24, 24, 24))):
        a = sincos_pos_embed_3d(dim, grid)
        b = np.asarray(jax.jit(
            lambda d=dim, g=grid: sincos_pos_embed_3d_traced(d, g))())
        np.testing.assert_allclose(a, b, atol=5e-5)

"""Pallas flash attention vs the XLA einsum path (forward + gradients).

Runs in interpret mode on CPU (kernels compile natively on TPU); formalizes
the reference's naive-vs-SDPA self-check (attention.py:455-483) as real tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_exp_tpu.ops.attention import cosine_attention
from vit_exp_tpu.ops.flash_attention import flash_attention


def _mk(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    ]


def _sdpa_ref(q, k, v, scale=None):
    import math

    scale = scale or 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, v)


@pytest.mark.parametrize("n,block", [(64, 32), (96, 32), (100, 32)])
def test_forward_parity(n, block):
    q, k, v = _mk(1, 2, n, 16, seed=n)
    out = flash_attention(q, k, v, block_q=block, block_k=block, interpret=True)
    ref = _sdpa_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_null_kv():
    q, k, v = _mk(2, 2, 64, 16, seed=7)
    rng = np.random.default_rng(8)
    nk = jnp.asarray(rng.standard_normal((2, 2, 2, 16)).astype(np.float32))
    nv = jnp.asarray(rng.standard_normal((2, 2, 2, 16)).astype(np.float32))
    out = flash_attention(q, k, v, null_k=nk, null_v=nv,
                          block_q=32, block_k=32, interpret=True)
    ref = _sdpa_ref(
        q, jnp.concatenate([nk, k], axis=2), jnp.concatenate([nv, v], axis=2)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grad_parity():
    q, k, v = _mk(1, 2, 64, 16, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=32, block_k=32, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_ref(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_grad_parity_ragged_kv():
    """kv length not a block multiple (the null-kv case) + q padding."""
    q, k, v = _mk(1, 1, 48, 16, seed=4)
    k = k[:, :, :42]
    v = v[:, :, :42]

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, block_q=32, block_k=32, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_ref(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_cosine_attention_pallas_impl_matches_xla():
    rng = np.random.default_rng(11)
    q, k, v = _mk(1, 2, 64, 16, seed=11)
    nk = jnp.asarray(rng.standard_normal((2, 2, 16)).astype(np.float32))
    nv = jnp.asarray(rng.standard_normal((2, 2, 16)).astype(np.float32))
    qs = jnp.asarray((rng.standard_normal(16) ** 2 + 0.5).astype(np.float32))
    ks = jnp.asarray((rng.standard_normal(16) ** 2 + 0.5).astype(np.float32))
    kwargs = dict(null_k=nk, null_v=nv, q_scale=qs, k_scale=ks)
    out_p = cosine_attention(q, k, v, impl="pallas", **kwargs)
    out_x = cosine_attention(q, k, v, impl="xla", **kwargs)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=2e-5
    )


def test_fast_softmax_close_to_fp32():
    q, k, v = _mk(1, 2, 64, 16, seed=21)
    out_fast = flash_attention(q, k, v, block_q=32, block_k=32,
                               interpret=True, fast_softmax=True)
    out_fp32 = flash_attention(q, k, v, block_q=32, block_k=32,
                               interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_fp32), atol=5e-3
    )


def test_static_max_matches_running_max():
    """Static-bound inference kernel == online-softmax kernel (+ null kv,
    ragged tail) when the bound genuinely dominates the logits."""
    rng = np.random.default_rng(31)
    q, k, v = _mk(2, 2, 100, 16, seed=31)  # ragged vs block 32
    nk = jnp.asarray(rng.standard_normal((2, 2, 2, 16)).astype(np.float32))
    nv = jnp.asarray(rng.standard_normal((2, 2, 2, 16)).astype(np.float32))
    # normalize rows so a unit bound is sound (mirrors cosine attention)
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    nkn = nk / jnp.linalg.norm(nk, axis=-1, keepdims=True)
    scale = 1.0 / np.sqrt(16)
    bound = jnp.float32(scale)
    out_static = flash_attention(
        qn, kn, v, null_k=nkn, null_v=nv, scale=scale, block_q=32,
        block_k=32, interpret=True, logit_bound=bound,
    )
    out_online = flash_attention(
        qn, kn, v, null_k=nkn, null_v=nv, scale=scale, block_q=32,
        block_k=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_static), np.asarray(out_online), atol=2e-5
    )


def test_cosine_attention_static_max_matches_xla():
    rng = np.random.default_rng(41)
    q, k, v = _mk(1, 2, 64, 16, seed=41)
    nk = jnp.asarray(rng.standard_normal((2, 2, 16)).astype(np.float32))
    nv = jnp.asarray(rng.standard_normal((2, 2, 16)).astype(np.float32))
    qs = jnp.asarray((rng.standard_normal(16) ** 2 + 0.5).astype(np.float32))
    ks = jnp.asarray((rng.standard_normal(16) ** 2 + 0.5).astype(np.float32))
    kwargs = dict(null_k=nk, null_v=nv, q_scale=qs, k_scale=ks)
    out_s = cosine_attention(q, k, v, impl="pallas", static_max=True, **kwargs)
    out_x = cosine_attention(q, k, v, impl="xla", **kwargs)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_x), atol=2e-5
    )


def test_static_max_init_nulls_matches_online():
    """Static kernel with null_strategy='init' (nulls seed the accumulator,
    kv keeps its real length) == online kernel with concat nulls."""
    rng = np.random.default_rng(51)
    for n in (96, 100):  # divisible and ragged vs block 32
        q, k, v = _mk(2, 2, n, 16, seed=51)
        nk = jnp.asarray(rng.standard_normal((2, 2, 2, 16)).astype(np.float32))
        nv = jnp.asarray(rng.standard_normal((2, 2, 2, 16)).astype(np.float32))
        qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        nkn = nk / jnp.linalg.norm(nk, axis=-1, keepdims=True)
        scale = 1.0 / np.sqrt(16)
        out_static = flash_attention(
            qn, kn, v, null_k=nkn, null_v=nv, scale=scale, block_q=32,
            block_k=32, interpret=True, logit_bound=jnp.float32(scale),
            null_strategy="init",
        )
        out_online = flash_attention(
            qn, kn, v, null_k=nkn, null_v=nv, scale=scale, block_q=32,
            block_k=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_static), np.asarray(out_online), atol=2e-5,
            err_msg=f"n={n}",
        )


def test_static_max_grad_parity():
    """Gradients through the static-max forward == gradients through the
    online kernel (same backward kernels, lse = bound + log l)."""
    rng = np.random.default_rng(61)
    q, k, v = _mk(1, 2, 96, 16, seed=61)
    nk = jnp.asarray(rng.standard_normal((1, 2, 2, 16)).astype(np.float32))
    nv = jnp.asarray(rng.standard_normal((1, 2, 2, 16)).astype(np.float32))

    def norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    scale = 1.0 / np.sqrt(16)

    def loss_static(q, k, v, nk, nv):
        out = flash_attention(
            norm(q), norm(k), v, null_k=norm(nk), null_v=nv, scale=scale,
            block_q=32, block_k=32, interpret=True,
            logit_bound=jnp.float32(scale), null_strategy="init",
        )
        return jnp.sum(out ** 2)

    def loss_online(q, k, v, nk, nv):
        out = flash_attention(
            norm(q), norm(k), v, null_k=norm(nk), null_v=nv, scale=scale,
            block_q=32, block_k=32, interpret=True,
        )
        return jnp.sum(out ** 2)

    gs = jax.grad(loss_static, argnums=(0, 1, 2, 3, 4))(q, k, v, nk, nv)
    go = jax.grad(loss_online, argnums=(0, 1, 2, 3, 4))(q, k, v, nk, nv)
    for a, b in zip(gs, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_static_int8_close_to_fp():
    """W8A8 static-max serving forward ≈ the xla cosine attention (per-row
    q/k int8, fixed-scale p ∈ (0,1] int8, per-channel v int8, int32 PV
    accumulate), including null kv."""
    from vit_exp_tpu.ops.attention import cosine_attention

    rng = np.random.default_rng(21)
    b, h, n, d = 1, 2, 64, 8
    q, k, v = [
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    ]
    null_k = jnp.asarray(rng.standard_normal((h, 2, d)).astype(np.float32))
    null_v = jnp.asarray(rng.standard_normal((h, 2, d)).astype(np.float32))
    q_scale = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(d)).astype(np.float32))
    k_scale = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(d)).astype(np.float32))

    # the int8 path requires the production SDPA scale convention
    # (scale=None → 1/√d): with scale=8 the bounded-logit gap exceeds the
    # int8 p-grid's dynamic range (see _fwd_kernel_static_int8 docstring)
    kw = dict(null_k=null_k, null_v=null_v, q_scale=q_scale,
              k_scale=k_scale, scale=None)
    ref = cosine_attention(q, k, v, impl="xla", **kw)
    out = cosine_attention(q, k, v, impl="pallas", static_max=True,
                           quantized=True, **kw)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    scale = np.abs(ref_np).max()
    assert np.abs(out_np - ref_np).max() / scale < 0.06
    c = np.corrcoef(out_np.ravel(), ref_np.ravel())[0, 1]
    assert c > 0.998, c

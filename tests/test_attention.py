"""Cosine-sim attention parity vs a torch oracle (attention.py:94-284 math)."""

import math

import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vit_exp_tpu.ops.attention import cosine_attention, l2norm


def _torch_oracle(q, k, v, null_k, null_v, q_scale, k_scale, scale):
    """Naive torch reimplementation of the reference attention semantics:
    concat null kv → l2norm q,k → per-dim scales → softmax(qk^T · scale)v."""
    q, k, v = map(torch.tensor, (q, k, v))
    b = q.shape[0]
    nk = torch.tensor(null_k)[None].expand(b, -1, -1, -1)
    nv = torch.tensor(null_v)[None].expand(b, -1, -1, -1)
    k = torch.cat([nk, k], dim=2)
    v = torch.cat([nv, v], dim=2)
    q = F.normalize(q, dim=-1) * torch.tensor(q_scale)
    k = F.normalize(k, dim=-1) * torch.tensor(k_scale)
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * scale
    attn = sim.softmax(dim=-1)
    return torch.einsum("bhij,bhjd->bhid", attn, v).numpy()


def _make_inputs(b=2, h=3, n=16, d=8, n_null=2, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: rng.standard_normal(s).astype(np.float32)
    return dict(
        q=mk(b, h, n, d), k=mk(b, h, n, d), v=mk(b, h, n, d),
        null_k=mk(h, n_null, d), null_v=mk(h, n_null, d),
        q_scale=mk(d) ** 2 + 0.5, k_scale=mk(d) ** 2 + 0.5,
    )


def test_xla_matches_torch_sdpa_scale():
    inp = _make_inputs()
    d = inp["q"].shape[-1]
    ours = np.asarray(
        cosine_attention(
            jnp.asarray(inp["q"]), jnp.asarray(inp["k"]), jnp.asarray(inp["v"]),
            null_k=jnp.asarray(inp["null_k"]), null_v=jnp.asarray(inp["null_v"]),
            q_scale=jnp.asarray(inp["q_scale"]), k_scale=jnp.asarray(inp["k_scale"]),
            scale=None, impl="xla",
        )
    )
    oracle = _torch_oracle(
        inp["q"], inp["k"], inp["v"], inp["null_k"], inp["null_v"],
        inp["q_scale"], inp["k_scale"], 1.0 / math.sqrt(d),
    )
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_xla_matches_torch_naive_scale8():
    inp = _make_inputs(seed=1)
    ours = np.asarray(
        cosine_attention(
            jnp.asarray(inp["q"]), jnp.asarray(inp["k"]), jnp.asarray(inp["v"]),
            null_k=jnp.asarray(inp["null_k"]), null_v=jnp.asarray(inp["null_v"]),
            q_scale=jnp.asarray(inp["q_scale"]), k_scale=jnp.asarray(inp["k_scale"]),
            scale=8.0, impl="xla",
        )
    )
    oracle = _torch_oracle(
        inp["q"], inp["k"], inp["v"], inp["null_k"], inp["null_v"],
        inp["q_scale"], inp["k_scale"], 8.0,
    )
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_l2norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 7)).astype(np.float32)
    x[0] = 0.0  # degenerate row exercises the eps clamp
    ours = np.asarray(l2norm(jnp.asarray(x)))
    oracle = F.normalize(torch.tensor(x), dim=-1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_mask_blocks_attention():
    inp = _make_inputs(seed=3)
    mask = np.ones((2, 1, 1, 16), dtype=bool)
    mask[..., 8:] = False
    out_masked = cosine_attention(
        jnp.asarray(inp["q"]), jnp.asarray(inp["k"]), jnp.asarray(inp["v"]),
        null_k=jnp.asarray(inp["null_k"]), null_v=jnp.asarray(inp["null_v"]),
        mask=jnp.asarray(mask), impl="xla",
    )
    # masking the second half must equal shrinking kv to the first half
    out_short = cosine_attention(
        jnp.asarray(inp["q"]), jnp.asarray(inp["k"][:, :, :8]),
        jnp.asarray(inp["v"][:, :, :8]),
        null_k=jnp.asarray(inp["null_k"]), null_v=jnp.asarray(inp["null_v"]),
        impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_short), atol=1e-6
    )


def test_fused_geglu_ff_matches_module():
    """ops/geglu_ff fused kernel == BiasLayerNorm→wi→GEGLU→wo module path,
    including param-tree compatibility of the two GEGLUFeedForward impls."""
    from vit_exp_tpu.core.precision import Policy
    from vit_exp_tpu.models.layers import GEGLUFeedForward

    fp32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                  reduce_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 40, 24)).astype(np.float32))
    ref_mod = GEGLUFeedForward(dim=24, policy=fp32, impl="xla")
    params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    # perturb params away from init so the test is not trivially zeros
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.float32(1.0), params)
    ref = ref_mod.apply({"params": params}, x)
    fused_mod = GEGLUFeedForward(dim=24, policy=fp32, impl="pallas")
    ours = fused_mod.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=3e-5, rtol=1e-5
    )


def test_fused_geglu_ff_grads_match_xla():
    """The fused Pallas backward (dx, dγ, dβ, dw1, dw2) == jax.grad of the
    XLA module path, including a token count that is not a block multiple
    (pad rows must not leak into the weight grads)."""
    from vit_exp_tpu.ops.geglu_ff import fused_geglu_ff

    rng = np.random.default_rng(11)
    D, inner = 24, 32
    x = jnp.asarray(rng.standard_normal((2, 37, D)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((D, 2 * inner)).astype(np.float32)
                     / np.sqrt(D))
    w2 = jnp.asarray(rng.standard_normal((inner, D)).astype(np.float32)
                     / np.sqrt(inner))
    cot = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def ref(x, gamma, beta, w1, w2):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        y = xn * gamma + beta
        h = y @ w1
        val, gate = jnp.split(h, 2, axis=-1)
        act = jax.nn.gelu(gate, approximate=False) * val
        return jnp.vdot(act @ w2, cot)

    def ours(x, gamma, beta, w1, w2):
        return jnp.vdot(
            fused_geglu_ff(x, gamma, beta, w1, w2, block_m=16), cot)

    ref_grads = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w1, w2)
    our_grads = jax.grad(ours, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w1, w2)
    for r, o, name in zip(ref_grads, our_grads,
                          ("dx", "dgamma", "dbeta", "dw1", "dw2")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=2e-4, rtol=2e-4,
            err_msg=name,
        )


def test_fused_geglu_ff_module_grads():
    """Module-level grads through GEGLUFeedForward(impl="pallas") == the
    xla impl, exercising the param-cast paths used by the real towers."""
    from vit_exp_tpu.core.precision import Policy
    from vit_exp_tpu.models.layers import GEGLUFeedForward

    fp32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                  reduce_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 19, 24)).astype(np.float32))
    ref_mod = GEGLUFeedForward(dim=24, policy=fp32, impl="xla")
    params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.float32(1.0), params)
    fused_mod = GEGLUFeedForward(dim=24, policy=fp32, impl="pallas")

    def loss(mod, p):
        return jnp.sum(jnp.square(mod.apply({"params": p}, x)))

    g_ref = jax.grad(lambda p: loss(ref_mod, p))(params)
    g_ours = jax.grad(lambda p: loss(fused_mod, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4),
        g_ref, g_ours,
    )


def test_patch_dropout():
    """PatchDropout parity with ct_clip.py:189-206: keeps
    max(1, int(n·(1−p))) random tokens per sample, rows drawn from the
    input; identity when deterministic or p=0."""
    from vit_exp_tpu.models.layers import PatchDropout

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 10, 4)).astype(np.float32))
    mod = PatchDropout(prob=0.5)
    out = mod.apply({}, x, deterministic=False,
                    rngs={"patch_dropout": jax.random.PRNGKey(1)})
    assert out.shape == (3, 5, 4)
    # every kept row exists in the source sample
    for b in range(3):
        for row in np.asarray(out[b]):
            assert any(np.allclose(row, r) for r in np.asarray(x[b]))
    # no duplicate tokens kept (top-k of distinct scores)
    for b in range(3):
        rows = {tuple(np.round(r, 5)) for r in np.asarray(out[b])}
        assert len(rows) == 5

    np.testing.assert_array_equal(
        np.asarray(mod.apply({}, x, deterministic=True)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(PatchDropout(prob=0.0).apply(
            {}, x, deterministic=False,
            rngs={"patch_dropout": jax.random.PRNGKey(1)})),
        np.asarray(x))


def test_fused_geglu_ff_int8_close_to_fp():
    """W8A8 serving FF ≈ the fp path (weight-only error ~1/255 per channel
    + per-token activation quant); module impl='pallas_int8' wires up."""
    from vit_exp_tpu.core.precision import Policy
    from vit_exp_tpu.models.layers import GEGLUFeedForward

    fp32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                  reduce_dtype=jnp.float32)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 40, 24)).astype(np.float32))
    ref_mod = GEGLUFeedForward(dim=24, policy=fp32, impl="xla")
    params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.float32(1.0), params)
    ref = ref_mod.apply({"params": params}, x)
    q_mod = GEGLUFeedForward(dim=24, policy=fp32, impl="pallas_int8")
    ours = q_mod.apply({"params": params}, x)
    err = np.abs(np.asarray(ours) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.05, err.max() / scale
    # and well-correlated overall
    c = np.corrcoef(np.asarray(ours).ravel(), np.asarray(ref).ravel())[0, 1]
    assert c > 0.999


def test_fused_ln_qkv_matches_unfused():
    """ops/fused_proj: LN→[q|kv] fused kernel == ScaleLayerNorm + two
    PDense matmuls — values and grads (dx, dγ, dWq, dWkv)."""
    from vit_exp_tpu.ops.fused_proj import fused_ln_qkv

    rng = np.random.default_rng(13)
    M, D, Fq, Fkv = 37, 24, 8, 16
    x = jnp.asarray(rng.standard_normal((2, M, D)).astype(np.float32))
    gamma = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(D)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((D, Fq)).astype(np.float32)
                     / np.sqrt(D))
    wkv = jnp.asarray(rng.standard_normal((D, Fkv)).astype(np.float32)
                      / np.sqrt(D))
    cq = jnp.asarray(rng.standard_normal((2, M, Fq)).astype(np.float32))
    ckv = jnp.asarray(rng.standard_normal((2, M, Fkv)).astype(np.float32))

    def ref(x, gamma, wq, wkv):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma
        # kv from the RAW input (reference attention.py:240-244 quirk)
        return jnp.vdot(y @ wq, cq) + jnp.vdot(x @ wkv, ckv)

    def ours(x, gamma, wq, wkv):
        q, kv = fused_ln_qkv(x, gamma, wq, wkv, block_m=16)
        return jnp.vdot(q, cq) + jnp.vdot(kv, ckv)

    np.testing.assert_allclose(
        np.asarray(ours(x, gamma, wq, wkv)),
        np.asarray(ref(x, gamma, wq, wkv)), rtol=2e-5)
    g_ref = jax.grad(ref, argnums=(0, 1, 2, 3))(x, gamma, wq, wkv)
    g_ours = jax.grad(ours, argnums=(0, 1, 2, 3))(x, gamma, wq, wkv)
    for a, r, name in zip(g_ours, g_ref, ("dx", "dgamma", "dwq", "dwkv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_cosine_attention_module_fused_proj_parity():
    """CosineSelfAttention with a pallas impl (fused LN+qkv prologue) ==
    the xla impl with the same params."""
    from vit_exp_tpu.core.precision import Policy
    from vit_exp_tpu.models.ctvit3d import CosineSelfAttention

    fp32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                  reduce_dtype=jnp.float32)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((1, 32, 16)).astype(np.float32))
    ref_mod = CosineSelfAttention(dim=16, heads=2, dim_head=8,
                                  attn_impl="xla", policy=fp32)
    params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.float32(1.0), params)
    ref = ref_mod.apply({"params": params}, x)
    fused_mod = CosineSelfAttention(dim=16, heads=2, dim_head=8,
                                    attn_impl="pallas", fuse_qkv=True,
                                    policy=fp32)
    ours = fused_mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_alibi_bias_matches_torch_oracle():
    """AlibiPositionalBias parity (attention.py:291-333): slopes series for
    pow2 and non-pow2 head counts, and the -|j-i| distance grid with the
    arange(j-i, j) query offset."""
    import math

    import torch

    from vit_exp_tpu.ops.attention import alibi_bias, alibi_slopes

    def oracle_slopes(heads):
        def pow2(n):
            start = 2 ** (-(2 ** -(math.log2(n) - 3)))
            return [start * start ** i for i in range(n)]

        if math.log2(heads).is_integer():
            return pow2(heads)
        c = 2 ** math.floor(math.log2(heads))
        return pow2(c) + pow2(2 * c)[0::2][: heads - c]

    for heads in (8, 6, 12):
        np.testing.assert_allclose(
            np.asarray(alibi_slopes(heads)), oracle_slopes(heads), rtol=1e-6
        )

    for (i, j) in ((5, 5), (3, 9)):
        i_arange = torch.arange(j - i, j)
        j_arange = torch.arange(j)
        dist = -torch.abs(j_arange.view(1, 1, -1) - i_arange.view(1, -1, 1))
        ref = (dist * torch.tensor(oracle_slopes(4)).view(4, 1, 1)).numpy()
        np.testing.assert_allclose(np.asarray(alibi_bias(4, i, j)), ref,
                                   rtol=1e-6)


def test_alibi_bias_feeds_attention():
    """attn_bias plumbs through cosine_attention (xla path) with null kv:
    null columns get zero bias (F.pad semantics, attention.py:169-171)."""
    from vit_exp_tpu.ops.attention import alibi_bias, cosine_attention

    rng = np.random.default_rng(0)
    b, h, n, d = 2, 4, 6, 8
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    nk = jnp.asarray(rng.standard_normal((h, 2, d)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((h, 2, d)), jnp.float32)
    bias = alibi_bias(h, n, n)
    out = cosine_attention(q, k, v, null_k=nk, null_v=nv,
                           attn_bias=bias, impl="xla")
    assert out.shape == (b, h, n, d)
    base = cosine_attention(q, k, v, null_k=nk, null_v=nv, impl="xla")
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-5


def test_fused_ln_qkv_int8_close_to_fp32():
    """W8A8 serving qkv prologue: per-token/per-channel quantization error
    stays within the int8 envelope of the fp32 reference."""
    from vit_exp_tpu.ops.fused_proj import fused_ln_qkv_int8

    rng = np.random.default_rng(5)
    M, D, Fq, Fkv = 37, 24, 8, 16
    x = jnp.asarray(rng.standard_normal((2, M, D)).astype(np.float32))
    gamma = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(D)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((D, Fq)).astype(np.float32)
                     / np.sqrt(D))
    wkv = jnp.asarray(rng.standard_normal((D, Fkv)).astype(np.float32)
                      / np.sqrt(D))

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma
    # kv from the RAW input (reference attention.py:240-244 quirk)
    q_ref, kv_ref = y @ wq, x @ wkv

    q, kv = fused_ln_qkv_int8(x, gamma, wq, wkv, block_m=16)
    for got, ref in ((q, q_ref), (kv, kv_ref)):
        scale = float(jnp.max(jnp.abs(ref)))
        err = float(jnp.max(jnp.abs(got - ref))) / scale
        assert err < 0.03, err


@pytest.mark.parametrize("offset", [5.0, 50.0, 500.0])
def test_fused_ln_qkv_int8_offset_robust(offset):
    """Pin the precision envelope under a large constant activation offset
    (ADVICE r3): the kernels quantize the CENTERED input, so the int8 step
    tracks the centered std, not |x| — error must stay flat in the offset.
    Before the centered-quantization fix, q error at offset 50 was 53% of
    the output std (the per-token scale grew with |x| and the LN identity's
    cancellation amplified it)."""
    from vit_exp_tpu.ops.fused_proj import fused_ln_qkv, fused_ln_qkv_int8

    rng = np.random.default_rng(11)
    M, D, Fq, Fkv = 64, 64, 128, 256
    x = jnp.asarray(
        (offset + rng.standard_normal((M, D))).astype(np.float32))
    gamma = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(D)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((D, Fq)).astype(np.float32)
                     / np.sqrt(D))
    wkv = jnp.asarray(rng.standard_normal((D, Fkv)).astype(np.float32)
                      / np.sqrt(D))

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma
    q_ref, kv_ref = y @ wq, x @ wkv

    # envelope relative to the output SPREAD (the offset inflates |kv|
    # itself; error vs max|ref| would let huge absolute errors pass)
    q8, kv8 = fused_ln_qkv_int8(x, gamma, wq, wkv, block_m=16)
    assert float(jnp.max(jnp.abs(q8 - q_ref))) / float(jnp.std(q_ref)) < 0.1
    assert (float(jnp.max(jnp.abs(kv8 - kv_ref))) / float(jnp.std(kv_ref))
            < 0.1)
    # the bf16 fused path must also hold (it computes mu from the same
    # input, so the cancellation is exact w.r.t. the rounded x)
    qb, kvb = fused_ln_qkv(x, gamma, wq, wkv, block_m=16)
    assert float(jnp.max(jnp.abs(qb - q_ref))) / float(jnp.std(q_ref)) < 0.1


def test_int8_proj_close_to_fp32():
    from vit_exp_tpu.ops.fused_proj import int8_proj

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((3, 29, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32)
                    / 4.0)
    ref = x @ w
    got = int8_proj(x, w, block_m=16)
    err = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 0.03, err


def _pack(t):
    """(b, h, n, d) → packed (b, n, h·d)."""
    b, h, n, d = t.shape
    return jnp.asarray(t).transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _unpack(t, h):
    b, n, hd = t.shape
    return np.asarray(t).reshape(b, n, h, hd // h).transpose(0, 2, 1, 3)


def test_fused_ln_qkv3_int8_matches_2out():
    """3-output W8A8 qkv kernel == column splits of the 2-output one
    (identical quantization → identical values; only the in-kernel copy
    pattern differs)."""
    from vit_exp_tpu.ops.fused_proj import (
        fused_ln_qkv3_int8,
        fused_ln_qkv_int8,
    )

    rng = np.random.default_rng(7)
    B, M, D, Fq = 2, 33, 64, 128
    Fkv = 2 * Fq
    x = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    gamma = jnp.asarray((1 + 0.1 * rng.standard_normal(D)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((D, Fq)).astype(np.float32)
                     / np.sqrt(D))
    wkv = jnp.asarray(rng.standard_normal((D, Fkv)).astype(np.float32)
                      / np.sqrt(D))
    q2, kv2 = fused_ln_qkv_int8(x, gamma, wq, wkv, block_m=16)
    k2, v2 = jnp.split(kv2, 2, axis=-1)
    q3, k3, v3 = fused_ln_qkv3_int8(x, gamma, wq, wkv, block_m=16)
    for got, ref in ((q3, q2), (k3, k2), (v3, v2)):
        assert got.shape == (B, M, Fq)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


def test_cosine_attention_packed_matches_transpose_path():
    """Heads-packed serving entry (in-kernel lane-slice head separation)
    vs the transpose-layout int8 static kernel.  Both quantize q per row
    per head and k with one global scale, but the hp path computes the
    row scales AFTER packing while the transpose path computes them on
    (b,h,n,d) — identical values, so outputs agree to numerical noise."""
    from vit_exp_tpu.ops.attention import cosine_attention_packed

    ins = _make_inputs(b=2, h=4, n=64, d=32, seed=11)
    b, h, n, d = ins["q"].shape
    ref = cosine_attention(
        jnp.asarray(ins["q"]), jnp.asarray(ins["k"]), jnp.asarray(ins["v"]),
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]), k_scale=jnp.asarray(ins["k_scale"]),
        impl="pallas", static_max=True, quantized=True,
    )
    got = cosine_attention_packed(
        _pack(ins["q"]), _pack(ins["k"]), _pack(ins["v"]), h,
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]), k_scale=jnp.asarray(ins["k_scale"]),
        quantized=True,
    )
    np.testing.assert_allclose(_unpack(got, h), np.asarray(ref), atol=2e-2,
                               rtol=1e-2)


def test_cosine_attention_packed_bf16_matches_torch():
    """Heads-packed bf16 static-max path (quantized=False) vs the torch
    oracle at bf16 tolerance."""
    from vit_exp_tpu.ops.attention import cosine_attention_packed

    ins = _make_inputs(b=1, h=4, n=32, d=32, seed=13)
    b, h, n, d = ins["q"].shape
    ref = _torch_oracle(scale=1.0 / math.sqrt(d), **ins)
    got = cosine_attention_packed(
        _pack(ins["q"]), _pack(ins["k"]), _pack(ins["v"]), h,
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]), k_scale=jnp.asarray(ins["k_scale"]),
        quantized=False,
    )
    np.testing.assert_allclose(
        _unpack(got, h).astype(np.float32), ref, atol=3e-2, rtol=3e-2)


def test_cosine_attention_packed_no_null_kv():
    """hp kernel's zero-init path (no null kv) vs the torch oracle."""
    from vit_exp_tpu.ops.attention import cosine_attention_packed

    ins = _make_inputs(b=1, h=4, n=32, d=32, seed=19, n_null=0)
    b, h, n, d = ins["q"].shape
    ref = _torch_oracle(scale=1.0 / math.sqrt(d), **ins)
    got = cosine_attention_packed(
        _pack(ins["q"]), _pack(ins["k"]), _pack(ins["v"]), h,
        q_scale=jnp.asarray(ins["q_scale"]), k_scale=jnp.asarray(ins["k_scale"]),
        quantized=False,
    )
    np.testing.assert_allclose(
        _unpack(got, h).astype(np.float32), ref, atol=3e-2, rtol=3e-2)


def test_cosine_attention_packed_v_group_offset():
    """v read in place out of a combined kv tensor (v_group_offset) ==
    passing the v half explicitly — the production serving wiring."""
    from vit_exp_tpu.ops.attention import cosine_attention_packed

    ins = _make_inputs(b=2, h=4, n=64, d=32, seed=29)
    b, h, n, d = ins["q"].shape
    kw = dict(
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]),
        k_scale=jnp.asarray(ins["k_scale"]), quantized=True,
    )
    kp, vp = _pack(ins["k"]), _pack(ins["v"])
    kv = jnp.concatenate([kp, vp], axis=-1)
    ref = cosine_attention_packed(_pack(ins["q"]), kp, vp, h, **kw)
    got = cosine_attention_packed(
        _pack(ins["q"]), kv[..., :h * d], kv, h,
        v_group_offset=h * d // 128, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_cosine_attention_packed_fallback_on_odd_head_dim():
    """d=20 violates the lane-granule contract → packed entry point
    silently falls back to the transpose path with identical semantics."""
    from vit_exp_tpu.ops.attention import cosine_attention_packed

    ins = _make_inputs(b=1, h=2, n=16, d=20, seed=17)
    b, h, n, d = ins["q"].shape
    ref = cosine_attention(
        jnp.asarray(ins["q"]), jnp.asarray(ins["k"]), jnp.asarray(ins["v"]),
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]), k_scale=jnp.asarray(ins["k_scale"]),
        impl="pallas", static_max=True, quantized=True,
    )
    got = cosine_attention_packed(
        _pack(ins["q"]), _pack(ins["k"]), _pack(ins["v"]), h,
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]), k_scale=jnp.asarray(ins["k_scale"]),
        quantized=True,
    )
    np.testing.assert_allclose(_unpack(got, h), np.asarray(ref), atol=1e-6)


def test_cosine_attention_packed_fallback_combined_kv_odd_dim():
    """Combined kv + a head dim violating the 128-lane granule: the
    fallback must slice the v HALF of kv (by shape), not
    v_group_offset·128 — which truncates to 0 for heads·d < 128 and
    silently attended with the k half as values (review regression)."""
    from vit_exp_tpu.ops.attention import cosine_attention_packed

    ins = _make_inputs(b=1, h=2, n=16, d=20, seed=31)
    b, h, n, d = ins["q"].shape
    kw = dict(
        null_k=jnp.asarray(ins["null_k"]), null_v=jnp.asarray(ins["null_v"]),
        q_scale=jnp.asarray(ins["q_scale"]),
        k_scale=jnp.asarray(ins["k_scale"]), quantized=True,
    )
    kp, vp = _pack(ins["k"]), _pack(ins["v"])
    ref = cosine_attention_packed(_pack(ins["q"]), kp, vp, h, **kw)
    kv = jnp.concatenate([kp, vp], axis=-1)
    got = cosine_attention_packed(
        _pack(ins["q"]), kv[..., :h * d], kv, h,
        v_group_offset=h * d // 128, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    with pytest.raises(ValueError, match="combined kv width"):
        cosine_attention_packed(
            _pack(ins["q"]), kv[..., :h * d], kv[..., :h * d + 8], h, **kw)


def test_quantized_flag_never_silently_ignored():
    """quantized=True off the int8 serving kernel path raises instead of
    silently running fp (misreports numbers AND throughput)."""
    ins = _make_inputs(b=1, h=2, n=16, d=16, seed=37)
    args = (jnp.asarray(ins["q"]), jnp.asarray(ins["k"]),
            jnp.asarray(ins["v"]))
    for kw in ({"impl": "xla"}, {"impl": "pallas", "static_max": False}):
        with pytest.raises(ValueError, match="only implemented"):
            cosine_attention(*args, quantized=True, **kw)


def test_packed_int8_module_param_tree_matches_bf16():
    """The packed serving branch creates the SAME param tree as the bf16
    fused path — int8 and bf16 checkpoints stay interchangeable — and its
    output stays within the int8 envelope of the bf16 fused path."""
    from vit_exp_tpu.models.ctvit3d import CosineSelfAttention

    rng = np.random.default_rng(23)
    b, n, dim, heads, dim_head = 1, 32, 64, 4, 32
    x = jnp.asarray(rng.standard_normal((b, n, dim)).astype(np.float32))

    kw = dict(dim=dim, heads=heads, dim_head=dim_head, scale=None,
              fuse_qkv=True)
    m8 = CosineSelfAttention(attn_impl="pallas_static_int8", **kw)
    m16 = CosineSelfAttention(attn_impl="pallas_static", **kw)
    p8 = m8.init(jax.random.PRNGKey(0), x)["params"]
    p16 = m16.init(jax.random.PRNGKey(0), x)["params"]
    t8 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), p8)
    t16 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), p16)
    assert t8 == t16

    out8 = m8.apply({"params": p16}, x)
    out16 = m16.apply({"params": p16}, x)
    scale = float(jnp.max(jnp.abs(out16)))
    err = float(jnp.max(jnp.abs(out8 - out16))) / max(scale, 1e-6)
    assert err < 0.05, err

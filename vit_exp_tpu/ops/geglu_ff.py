"""Pallas TPU fused GEGLU feed-forward (fwd + fused one-pass bwd).

One kernel for the transformer FF block LN → wi → GEGLU → wo
(transformer_maskgit/attention.py:45-58 semantics, minus the residual):
the (tokens, 2·inner) intermediate — 453 MB/dispatch at the production
shape — never touches HBM, and both matmuls run at full MXU depth
(K = 768 / 2048).

Split of work with XLA:
- XLA computes the per-token LN statistics (μ, 1/σ) — they fuse into the
  producing residual add for free;
- the LN scale γ folds into w1 (w1' = γ⊙w1) and the shift contributes a
  constant row d1 = β@w1, both precomputed per dispatch (tiny);
- the kernel normalizes the x block in VMEM, then h = x̂@w1' + d1,
  out = (gelu(gate)·val) @ w2, with val/gate = h[:, :I] / h[:, I:]
  matching GEGLUFeedForward's jnp.split order.

Weights stay resident in VMEM across grid steps (constant index_map):
w1 6.3 MB + w2 3.1 MB bf16 at the production shape; block_m=256 keeps the
working set ≈ 13 MB < the 16 MB scoped limit.

DIFFERENTIABLE: a custom VJP runs `_ff_bwd_kernel`, a single backward
sweep over token blocks that recomputes h in VMEM (never materializing
the 453 MB (tokens, 2I) intermediate or its cotangent in HBM) and
produces dx per block plus dw1/dw2/dγ/dβ in full-size fp32 VMEM
accumulators flushed on the last grid step — the same accumulator
pattern as flash_attention._flash_bwd_fused.  8 MXU passes per block
(vs the ~8 XLA pays too, but each of XLA's is HBM-bound on the wide
intermediates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_M = 256


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x):
    """fp32 erf from exp (Abramowitz–Stegun 7.1.26, |err| ≤ 1.5e-7 — five
    decades below bf16 activation resolution).  Mosaic lowers neither
    lax.erf nor erfc, but exp it has."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ff_kernel(x_ref, mu_ref, inv_ref, w1_ref, d1_ref, w2_ref, o_ref,
               *, inner):
    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    h = jax.lax.dot_general(
        xn.astype(w1_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + d1_ref[...]
    h = h.astype(x_ref.dtype)
    val = h[:, :inner]
    gate = h[:, inner:].astype(jnp.float32)
    gelu = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    act = gelu.astype(val.dtype) * val
    o_ref[...] = jax.lax.dot_general(
        act, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _ln_stats(x2: jnp.ndarray, eps: float):
    """fp32 LN statistics, shaped (M, 1) for lane-1 TPU blocks."""
    x32 = x2.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return mu, inv


def _pad_rows(a: jnp.ndarray, pad_m: int, value: float = 0.0) -> jnp.ndarray:
    m = a.shape[0]
    if pad_m == m:
        return a
    return jnp.pad(a, ((0, pad_m - m), (0, 0)), constant_values=value)


def _ff_fwd_impl(x2, mu, inv, gamma, beta, w1, w2, block_m, interpret):
    M, D = x2.shape
    I2 = w1.shape[1]
    inner = I2 // 2

    w1p = (w1.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None]
           ).astype(x2.dtype)
    d1 = (beta.astype(jnp.float32) @ w1.astype(jnp.float32))[None, :]
    w2c = w2.astype(x2.dtype)

    pad_m = -(-M // block_m) * block_m
    xp = _pad_rows(x2, pad_m)
    mup = _pad_rows(mu, pad_m)
    # keep padded-row stats finite (outputs are sliced off)
    invp = _pad_rows(inv, pad_m, value=1.0)

    out = pl.pallas_call(
        functools.partial(_ff_kernel, inner=inner),
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((D, I2), lambda i: (0, 0)),
            pl.BlockSpec((1, I2), lambda i: (0, 0)),
            pl.BlockSpec((inner, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, D), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xp, mup, invp, w1p, d1, w2c)
    return out[:M]


def _ff_bwd_kernel(x_ref, mu_ref, inv_ref, g_ref, b_ref, w1_ref, w2_ref,
                   do_ref, dx_ref, dw1_ref, dw2_ref, dg_ref, db_ref,
                   dw1a, dw2a, dga, dba, *, inner):
    """Backward over one token block; dw1/dw2/dγ/dβ accumulate in fp32 VMEM
    scratch across the (sequential) grid and flush on the last step."""
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _zero():
        dw1a[...] = jnp.zeros_like(dw1a)
        dw2a[...] = jnp.zeros_like(dw2a)
        dga[...] = jnp.zeros_like(dga)
        dba[...] = jnp.zeros_like(dba)

    gamma = g_ref[...].astype(jnp.float32)   # (1, D)
    beta = b_ref[...].astype(jnp.float32)

    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    y = (xn * gamma + beta).astype(w1_ref.dtype)
    h = jax.lax.dot_general(
        y, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    val = h[:, :inner]
    gate = h[:, inner:]
    cdf = 0.5 * (1.0 + _erf(gate * (2.0 ** -0.5)))
    gelu = gate * cdf

    do = do_ref[...]
    dact = jax.lax.dot_general(
        do, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dval = dact * gelu
    # gelu'(g) = Φ(g) + g·φ(g)
    pdf = jnp.exp(-0.5 * gate * gate) * np.float32(0.3989422804014327)
    dgate = dact * val * (cdf + gate * pdf)
    dh32 = jnp.concatenate([dval, dgate], axis=1)
    dh = dh32.astype(w1_ref.dtype)

    act = (gelu * val).astype(do.dtype)
    dw2a[...] += jax.lax.dot_general(
        act, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dw1a[...] += jax.lax.dot_general(
        y, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dy = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dga[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dba[...] += jnp.sum(dy, axis=0, keepdims=True)

    dxn = dy * gamma
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    dx_ref[...] = (inv_ref[...] * (dxn - m1 - xn * m2)).astype(dx_ref.dtype)

    @pl.when(i == n_i - 1)
    def _flush():
        dw1_ref[...] = dw1a[...]
        dw2_ref[...] = dw2a[...]
        dg_ref[...] = dga[...]
        db_ref[...] = dba[...]


def _ff_bwd_impl(x2, mu, inv, gamma, beta, w1, w2, dout, block_m, interpret):
    M, D = x2.shape
    I2 = w1.shape[1]
    inner = I2 // 2

    cdt = x2.dtype
    w1c = w1.astype(cdt)
    w2c = w2.astype(cdt)
    g2 = gamma.astype(jnp.float32)[None, :]
    b2 = beta.astype(jnp.float32)[None, :]

    pad_m = -(-M // block_m) * block_m
    xp = _pad_rows(x2, pad_m)
    mup = _pad_rows(mu, pad_m)
    invp = _pad_rows(inv, pad_m, value=1.0)
    # zero cotangent on pad rows → they contribute nothing to dw/dγ/dβ
    dop = _pad_rows(dout.astype(cdt), pad_m)

    dx, dw1, dw2, dg, db = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, inner=inner),
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, I2), lambda i: (0, 0)),
            pl.BlockSpec((inner, D), lambda i: (0, 0)),
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((D, I2), lambda i: (0, 0)),
            pl.BlockSpec((inner, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_m, D), x2.dtype),
            jax.ShapeDtypeStruct((D, I2), jnp.float32),
            jax.ShapeDtypeStruct((inner, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, I2), jnp.float32),
            pltpu.VMEM((inner, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # fp32 dw1/dw2 accumulators (19 MB at the production shape)
            # + resident weights + the (block_m, 2I) fp32 temporaries
            # exceed the 16 MB default scoped-vmem cap
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, mup, invp, g2, b2, w1c, w2c, dop)
    return dx[:M], dw1, dw2, dg[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ff_core(x2, gamma, beta, w1, w2, eps, block_m, interpret):
    mu, inv = _ln_stats(x2, eps)
    return _ff_fwd_impl(x2, mu, inv, gamma, beta, w1, w2, block_m, interpret)


def _ff_core_fwd(x2, gamma, beta, w1, w2, eps, block_m, interpret):
    mu, inv = _ln_stats(x2, eps)
    out = _ff_fwd_impl(x2, mu, inv, gamma, beta, w1, w2, block_m, interpret)
    return out, (x2, mu, inv, gamma, beta, w1, w2)


def _ff_core_bwd(eps, block_m, interpret, res, dout):
    x2, mu, inv, gamma, beta, w1, w2 = res
    dx, dw1, dw2, dg, db = _ff_bwd_impl(
        x2, mu, inv, gamma, beta, w1, w2, dout, block_m, interpret
    )
    return (dx.astype(x2.dtype), dg.astype(gamma.dtype),
            db.astype(beta.dtype), dw1.astype(w1.dtype),
            dw2.astype(w2.dtype))


_ff_core.defvjp(_ff_core_fwd, _ff_core_bwd)


def fused_geglu_ff(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """LN(γ,β) → x@w1 → GEGLU → @w2 for x: (..., M, D) tokens.

    w1: (D, 2·I) laid out [val | gate] on the out axis; w2: (I, D).
    Returns the FF output (same shape as x) in x.dtype; the caller adds the
    residual.  Differentiable (fused Pallas backward, see module doc)."""
    if interpret is None:
        interpret = _interpret_default()
    orig_shape = x.shape
    D = x.shape[-1]
    x2 = x.reshape(-1, D)
    out = _ff_core(x2, gamma, beta, w1, w2, eps, block_m, interpret)
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# int8 serving path (weight + dynamic per-token activation quantization)
# ---------------------------------------------------------------------------


def quantize_per_channel(w: jnp.ndarray):
    """Symmetric per-output-channel int8: w ≈ w_q · scale[None, :]."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return wq, scale


def _quant_rows(y):
    """(..., d) fp → (int8, per-last-axis scale (..., 1) f32): symmetric
    row quantization (amax/127 with a 1e-8 floor).  CANONICAL int8
    envelope — fused_proj and flash_attention reuse this so the serving
    paths that tests/test_int8_parity.py gates share ONE definition."""
    y = y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return q, s


def _ff_int8_kernel(x_ref, mu_ref, inv_ref, g_ref, b_ref, w1_ref, s1_ref,
                    w2_ref, s2_ref, o_ref, *, inner):
    """W8A8 GEGLU-FF: both matmuls run int8×int8→int32 on the MXU (2× the
    bf16 rate on v5e); activations quantize per token row in VMEM.  LN γ
    applies to the activation (per-input-dim — it cannot fold into the
    per-output-channel weight scales)."""
    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    y = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    yq, ys = _quant_rows(y)
    acc = jax.lax.dot_general(
        yq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = acc * ys * s1_ref[...]
    val = h[:, :inner]
    gate = h[:, inner:]
    gelu = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    act = gelu * val
    aq, as_ = _quant_rows(act)
    acc2 = jax.lax.dot_general(
        aq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    o_ref[...] = (acc2 * as_ * s2_ref[...]).astype(o_ref.dtype)


def fused_geglu_ff_int8(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Serving-only W8A8 variant of fused_geglu_ff (no VJP): weights are
    per-channel int8 (quantized per dispatch — cheap and checkpoint-layout
    preserving), activations per-token int8."""
    if interpret is None:
        interpret = _interpret_default()
    orig_shape = x.shape
    D = x.shape[-1]
    I2 = w1.shape[1]
    inner = I2 // 2
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    mu, inv = _ln_stats(x2, eps)

    w1q, s1 = quantize_per_channel(w1)
    w2q, s2 = quantize_per_channel(w2)
    g2 = gamma.astype(jnp.float32)[None, :]
    b2 = beta.astype(jnp.float32)[None, :]

    pad_m = -(-M // block_m) * block_m
    xp = _pad_rows(x2, pad_m)
    mup = _pad_rows(mu, pad_m)
    invp = _pad_rows(inv, pad_m, value=1.0)

    out = pl.pallas_call(
        functools.partial(_ff_int8_kernel, inner=inner),
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, I2), lambda i: (0, 0)),
            pl.BlockSpec((1, I2), lambda i: (0, 0)),
            pl.BlockSpec((inner, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xp, mup, invp, g2, b2, w1q, s1[None, :], w2q, s2[None, :])
    return out[:M].reshape(orig_shape)

"""Pallas TPU fused GEGLU feed-forward (inference).

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

INFERENCE ONLY: no VJP (training keeps the XLA path, whose fusions are
what autodiff needs anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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
    residual."""
    if interpret is None:
        interpret = _interpret_default()
    orig_shape = x.shape
    D = x.shape[-1]
    I2 = w1.shape[1]
    inner = I2 // 2
    x2 = x.reshape(-1, D)
    M = x2.shape[0]

    # fp32 LN statistics, shaped (M, 1) for lane-1 TPU blocks
    x32 = x2.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)

    w1p = (w1.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None]
           ).astype(x.dtype)
    d1 = (beta.astype(jnp.float32) @ w1.astype(jnp.float32))[None, :]
    w2c = w2.astype(x.dtype)

    pad_m = -(-M // block_m) * block_m
    if pad_m != M:
        x2 = jnp.pad(x2, ((0, pad_m - M), (0, 0)))
        mu = jnp.pad(mu, ((0, pad_m - M), (0, 0)))
        # keep padded-row stats finite (outputs are sliced off)
        inv = jnp.pad(inv, ((0, pad_m - M), (0, 0)), constant_values=1.0)

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
        out_shape=jax.ShapeDtypeStruct((pad_m, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, mu, inv, w1p, d1, w2c)
    return out[:M].reshape(orig_shape)

"""Fused attention-prologue projection (Pallas): q = ScaleLN_γ(x) @ Wq,
kv = x @ Wkv — in ONE packed matmul.

Reference semantics (attention.py:240-244, both the naive Attention and
FlashAttention classes): `kv_input = default(context, x)` binds BEFORE
`x = self.norm(x)`, so for self-attention the k/v projections read the
PRE-LayerNorm input and only q sees the normed activations.  Production
checkpoints are trained with exactly this, so the kernel must reproduce it
(caught by scripts/real_weights_checklist.py stage 3 against the actual
reference module — the earlier kernel normed both).

Run separately, XLA materializes the LN output (85 MB bf16/layer at
production shape) and the two narrow matmuls tile poorly (~27% MFU
measured).  The fusion identity: with γ folded into Wq
(W'q = γ ⊙ Wq, no shift — ScaleLayerNorm has no β),

    LN_γ(x) @ Wq = ((x − μ)·inv) @ W'q = inv · (x @ W'q − μ · colsum(W'q))

so ONE packed matmul x @ [W'q | Wkv] (six full 128-lane output tiles at
production shape) followed by a per-row affine correction applied to the q
columns only.  LN statistics (μ, 1/σ) come from XLA (they fuse into the
producing residual add).

Differentiable: the custom VJP is plain XLA (training uses the UNFUSED
path by default — fuse_qkv is a serving switch — so the backward's only
job is correctness for tests and opt-in training runs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_exp_tpu.ops.flash_attention import LANES
from vit_exp_tpu.ops.geglu_ff import (DEFAULT_BLOCK_M, _interpret_default,
                                      _ln_stats, _pad_rows)


def _fwd_kernel(x_ref, mu_ref, inv_ref, w_ref, c_ref, a_ref, o_ref):
    t = jax.lax.dot_general(
        x_ref[...].astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # q columns (a=1): inv·(t − μ·c); kv columns (a=0, c=0): t unchanged
    a = a_ref[...]
    o_ref[...] = (t * (1.0 - a)
                  + a * inv_ref[...] * (t - mu_ref[...] * c_ref[...])
                  ).astype(o_ref.dtype)


def _fwd_impl(x2, mu, inv, wf, c, a, block_m, interpret):
    M, D = x2.shape
    F = wf.shape[1]
    pad_m = -(-M // block_m) * block_m
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, F), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), _pad_rows(mu, pad_m),
      _pad_rows(inv, pad_m, value=1.0), wf, c, a)
    return out[:M]


def _qkv_consts(wqf, n_kv, dtype):
    """Per-column affine constants: c = colsum of the (cast) folded Wq for
    the q columns, 0 for kv; a = 1 on q columns, 0 on kv."""
    fq = wqf.shape[1]
    c = jnp.concatenate([
        jnp.sum(wqf.astype(dtype).astype(jnp.float32), axis=0),
        jnp.zeros((n_kv,), jnp.float32),
    ])[None]
    a = jnp.concatenate([jnp.ones((fq,), jnp.float32),
                         jnp.zeros((n_kv,), jnp.float32)])[None]
    return c, a


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _core(x2, gamma, wq, wkv, eps, block_m, interpret):
    mu, inv = _ln_stats(x2, eps)
    wqf = (wq.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None])
    wf = jnp.concatenate(
        [wqf.astype(x2.dtype), wkv.astype(x2.dtype)], axis=1)
    c, a = _qkv_consts(wqf, wkv.shape[1], x2.dtype)
    return _fwd_impl(x2, mu, inv, wf, c, a, block_m, interpret)


def _core_fwd(x2, gamma, wq, wkv, eps, block_m, interpret):
    out = _core(x2, gamma, wq, wkv, eps, block_m, interpret)
    return out, (x2, gamma, wq, wkv)


def _core_bwd(eps, block_m, interpret, res, dout):
    """Plain-XLA backward: q = (xn·γ)@Wq with xn = (x−μ)·inv, kv = x@Wkv."""
    x2, gamma, wq, wkv = res
    fq = wq.shape[1]
    mu, inv = _ln_stats(x2, eps)
    xf = x2.astype(jnp.float32)
    xn = (xf - mu) * inv
    g32 = gamma.astype(jnp.float32)
    do = dout.astype(jnp.float32)
    do_q, do_kv = do[:, :fq], do[:, fq:]

    dwq = (xn * g32).T @ do_q
    dwqp = do_q @ wq.astype(jnp.float32).T          # (M, D): d(out_q)/d(xn·γ)
    dgamma = jnp.sum(dwqp * xn, axis=0)
    dxn = dwqp * g32
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    dx = inv * (dxn - m1 - xn * m2) + do_kv @ wkv.astype(jnp.float32).T
    dwkv = xf.T @ do_kv
    return (dx.astype(x2.dtype), dgamma.astype(gamma.dtype),
            dwq.astype(wq.dtype), dwkv.astype(wkv.dtype))


_core.defvjp(_core_fwd, _core_bwd)


def fused_ln_qkv(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    wq: jnp.ndarray,
    wkv: jnp.ndarray,
    *,
    eps: float = 1e-5,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool | None = None,
):
    """q = ScaleLayerNorm_γ(x) @ Wq, kv = x @ Wkv — one packed kernel.

    x: (..., M, D); wq: (D, Fq); wkv: (D, Fkv).
    Returns (q (..., M, Fq), kv (..., M, Fkv)) in x.dtype."""
    if interpret is None:
        interpret = _interpret_default()
    orig = x.shape
    D = x.shape[-1]
    Fq = wq.shape[1]
    out = _core(x.reshape(-1, D), gamma, wq, wkv, eps, block_m, interpret)
    out = out.reshape(orig[:-1] + (out.shape[-1],))
    return out[..., :Fq], out[..., Fq:]


# ---------------------------------------------------------------------------
# int8 serving variants (no VJP) — W8A8 on the MXU at 2× the bf16 rate,
# mirroring ops/geglu_ff.py's quantization scheme: per-output-channel int8
# weights (quantized per dispatch, checkpoint-layout preserving) and
# per-token dynamic int8 activations.  The affine q-correction uses the
# colsums of the DEQUANTIZED folded Wq so the LN identity holds exactly for
# the weights actually multiplied.
# ---------------------------------------------------------------------------


def _fwd_int8_kernel(x_ref, mu_ref, inv_ref, w_ref, s_ref, c_ref, a_ref,
                     o_ref):
    # Quantize the CENTERED input: per-token int8 step scales with the
    # centered std, not |x| — a constant activation offset would otherwise
    # blow the q path's step size (and the LN identity's cancellation)
    # linearly (measured 53% of output std at offset 50).  q becomes the
    # exact inv·(x−μ)@W'q with no correction; kv recovers the raw-x
    # projection by ADDING μ·colsum(Wkv) — a well-conditioned addition.
    xf = x_ref[...].astype(jnp.float32) - mu_ref[...]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sr = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(xf / sr), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    deq = acc.astype(jnp.float32) * sr * s_ref[...]
    a = a_ref[...]
    o_ref[...] = (a * inv_ref[...] * deq
                  + (1.0 - a) * (deq + mu_ref[...] * c_ref[...])
                  ).astype(o_ref.dtype)


def _int8_weights(gamma, wq, wkv):
    from vit_exp_tpu.ops.geglu_ff import quantize_per_channel

    wqf = (wq.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None])
    wf = jnp.concatenate([wqf, wkv.astype(jnp.float32)], axis=1)
    w8, sc = quantize_per_channel(wf)
    fq = wq.shape[1]
    # exact colsums of the weights actually multiplied (dequantized) — the
    # centered-input kernels correct the KV columns (+μ·colsum(Wkv)); the
    # q columns need none (LN of the centered input is exact)
    deq_cols = jnp.sum(w8.astype(jnp.float32), axis=0) * sc
    c = jnp.concatenate([jnp.zeros((fq,), jnp.float32),
                         deq_cols[fq:]])[None]
    a = jnp.concatenate([jnp.ones((fq,), jnp.float32),
                         jnp.zeros((wkv.shape[1],), jnp.float32)])[None]
    return w8, sc, c, a


def fused_ln_qkv_int8(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    wq: jnp.ndarray,
    wkv: jnp.ndarray,
    *,
    eps: float = 1e-5,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool | None = None,
):
    """Serving-only W8A8 fused_ln_qkv: γ folds into Wq BEFORE per-channel
    quantization; the CENTERED activations (x−μ) quantize per token inside
    the kernel so the int8 step tracks the centered std rather than |x|
    (offset-robust — see ADVICE r3), q = inv·deq exactly, and kv recovers
    the raw-x projection via the affine epilogue +μ·colsum(Wkv)."""
    if interpret is None:
        interpret = _interpret_default()
    orig = x.shape
    D = x.shape[-1]
    Fq = wq.shape[1]
    w8, sc, c, a = _int8_weights(gamma, wq, wkv)
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    F = w8.shape[1]
    mu, inv = _ln_stats(x2, eps)
    pad_m = -(-M // block_m) * block_m
    out = pl.pallas_call(
        _fwd_int8_kernel,
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), _pad_rows(mu, pad_m),
      _pad_rows(inv, pad_m, value=1.0), w8, sc[None, :], c, a)
    out = out[:M].reshape(orig[:-1] + (F,))
    return out[..., :Fq], out[..., Fq:]


def _fwd_int8_kernel_3out(x_ref, mu_ref, inv_ref, w_ref, s_ref, c_ref,
                          oq_ref, ok_ref, ov_ref, *, fq, fk):
    # centered-input quantization (see _fwd_int8_kernel): q is exact
    # inv·(x−μ)@W'q; k/v recover the raw-x projection via +μ·colsum(Wkv)
    xf = x_ref[...].astype(jnp.float32) - mu_ref[...]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sr = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(xf / sr), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    deq = acc.astype(jnp.float32) * sr * s_ref[...]
    # lane-ALIGNED splits of the accumulator (fq/fk are 128-multiples —
    # Mosaic accepts these; the (m,h·d)→(h,m,d) in-kernel head transpose
    # does NOT lower: "infer-vector-layout: unsupported shape cast").
    mu = mu_ref[...]
    oq_ref[...] = (inv_ref[...] * deq[:, :fq]).astype(oq_ref.dtype)
    ok_ref[...] = (deq[:, fq:fq + fk] + mu * c_ref[:, :fk]
                   ).astype(ok_ref.dtype)
    ov_ref[...] = (deq[:, fq + fk:] + mu * c_ref[:, fk:]
                   ).astype(ov_ref.dtype)


def fused_ln_qkv3_int8(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    wq: jnp.ndarray,
    wkv: jnp.ndarray,
    *,
    eps: float = 1e-5,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool | None = None,
):
    """`fused_ln_qkv_int8` emitting SEPARATE packed q, k, v — (…, Fq),
    (…, Fk), (…, Fk).

    The two-output variant returns a combined (M, Fq+Fkv) array whose k/v
    halves the serving attention then splits — XLA materializes the split
    as a full-tensor HBM copy.  Here the split happens on the kernel's
    VMEM accumulator at lane-aligned offsets (Fq, Fk must be multiples of
    128), and the packed tensors flow straight into the heads-packed
    serving attention (flash_attention.py::flash_attention_serving_hp)
    with zero XLA-side relayout.  Serving-only (no VJP).

    Identical quantization to fused_ln_qkv_int8 (per-token activations,
    per-channel folded-γ weights) — outputs are bit-identical to column
    splits of the 2-output form."""
    if interpret is None:
        interpret = _interpret_default()
    orig = x.shape
    D = x.shape[-1]
    Fq = wq.shape[1]
    Fkv = wkv.shape[1]
    assert Fkv % 2 == 0
    Fk = Fkv // 2
    assert Fq % LANES == 0 and Fk % LANES == 0, (
        "3-output splits must be lane-aligned; use fused_ln_qkv_int8"
    )
    w8, sc, c, _a = _int8_weights(gamma, wq, wkv)
    ckv = c[:, Fq:]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    F = w8.shape[1]
    mu, inv = _ln_stats(x2, eps)
    pad_m = -(-M // block_m) * block_m
    q, k, v = pl.pallas_call(
        functools.partial(_fwd_int8_kernel_3out, fq=Fq, fk=Fk),
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((1, Fkv), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, Fq), lambda i: (i, 0)),
            pl.BlockSpec((block_m, Fk), lambda i: (i, 0)),
            pl.BlockSpec((block_m, Fk), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_m, Fq), x.dtype),
            jax.ShapeDtypeStruct((pad_m, Fk), x.dtype),
            jax.ShapeDtypeStruct((pad_m, Fk), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), _pad_rows(mu, pad_m),
      _pad_rows(inv, pad_m, value=1.0), w8, sc[None, :], ckv)
    return (q[:M].reshape(orig[:-1] + (Fq,)),
            k[:M].reshape(orig[:-1] + (Fk,)),
            v[:M].reshape(orig[:-1] + (Fk,)))


def _proj_int8_kernel(x_ref, w_ref, s_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sr = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(xf / sr), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (acc.astype(jnp.float32) * sr * s_ref[...]).astype(
        o_ref.dtype)


def int8_proj(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Serving-only W8A8 bias-free projection x @ w (per-token activation
    scales, per-channel weight scales) — used for the attention
    out-projection under --int8."""
    from vit_exp_tpu.ops.geglu_ff import quantize_per_channel

    if interpret is None:
        interpret = _interpret_default()
    orig = x.shape
    D = x.shape[-1]
    F = w.shape[1]
    w8, sc = quantize_per_channel(w.astype(jnp.float32))
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    pad_m = -(-M // block_m) * block_m
    out = pl.pallas_call(
        _proj_int8_kernel,
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), w8, sc[None, :])
    return out[:M].reshape(orig[:-1] + (F,))

"""Fused ScaleLayerNorm → combined q/kv projection (Pallas).

The attention prologue in CTViT3D is LN(γ-only) → to_q (768→256) →
to_kv (768→512) (ctvit3d.py:66-78).  Run separately, XLA materializes the
LN output (85 MB bf16/layer at production shape) and the two narrow
matmuls tile poorly (~27% MFU measured).  Here:
- the LN scale γ folds into the weights (no shift: ScaleLayerNorm has no
  β), exactly like ops/geglu_ff.py's folding;
- Wq and Wkv concatenate into ONE (768, 768) matmul — six full 128-lane
  output tiles;
- LN statistics (μ, 1/σ) come from XLA (they fuse into the producing
  residual add).

Differentiable: the custom VJP mirrors the GEGLU-FF backward minus the
nonlinearity — recompute y, dW = yᵀ@dy, dγ from the unfolded form, dx via
the LN backward; dW accumulates in fp32 VMEM scratch.
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


def _fwd_kernel(x_ref, mu_ref, inv_ref, w_ref, o_ref):
    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    o_ref[...] = jax.lax.dot_general(
        xn.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _fwd_impl(x2, mu, inv, wf, block_m, interpret):
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
        ],
        out_specs=pl.BlockSpec((block_m, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, F), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), _pad_rows(mu, pad_m),
      _pad_rows(inv, pad_m, value=1.0), wf)
    return out[:M]


def _bwd_kernel(x_ref, mu_ref, inv_ref, g_ref, w_ref, do_ref,
                dx_ref, dw_ref, dg_ref, dwa, dga):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _zero():
        dwa[...] = jnp.zeros_like(dwa)
        dga[...] = jnp.zeros_like(dga)

    gamma = g_ref[...].astype(jnp.float32)       # (1, D)
    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    y = (xn * gamma).astype(w_ref.dtype)
    do = do_ref[...]
    dwa[...] += jax.lax.dot_general(
        y, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dy = jax.lax.dot_general(
        do, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dga[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dxn = dy * gamma
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    dx_ref[...] = (inv_ref[...] * (dxn - m1 - xn * m2)).astype(dx_ref.dtype)

    @pl.when(i == n_i - 1)
    def _flush():
        dw_ref[...] = dwa[...]
        dg_ref[...] = dga[...]


def _bwd_impl(x2, mu, inv, gamma, w, dout, block_m, interpret):
    M, D = x2.shape
    F = w.shape[1]
    cdt = x2.dtype
    pad_m = -(-M // block_m) * block_m
    dx, dw, dg = pl.pallas_call(
        _bwd_kernel,
        grid=(pad_m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((block_m, F), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pad_m, D), x2.dtype),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, F), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), _pad_rows(mu, pad_m),
      _pad_rows(inv, pad_m, value=1.0),
      gamma.astype(jnp.float32)[None, :], w.astype(cdt),
      _pad_rows(dout.astype(cdt), pad_m))
    return dx[:M], dw, dg[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _core(x2, gamma, wf, eps, block_m, interpret):
    mu, inv = _ln_stats(x2, eps)
    wq = (wf.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None]
          ).astype(x2.dtype)
    return _fwd_impl(x2, mu, inv, wq, block_m, interpret)


def _core_fwd(x2, gamma, wf, eps, block_m, interpret):
    out = _core(x2, gamma, wf, eps, block_m, interpret)
    return out, (x2, gamma, wf)


def _core_bwd(eps, block_m, interpret, res, dout):
    x2, gamma, wf = res
    mu, inv = _ln_stats(x2, eps)
    dx, dw, dg = _bwd_impl(x2, mu, inv, gamma, wf, dout, block_m, interpret)
    return dx.astype(x2.dtype), dg.astype(gamma.dtype), dw.astype(wf.dtype)


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
    """ScaleLayerNorm(γ) → [x@Wq | x@Wkv] in one kernel.

    x: (..., M, D); wq: (D, Fq); wkv: (D, Fkv).
    Returns (q (..., M, Fq), kv (..., M, Fkv)) in x.dtype."""
    if interpret is None:
        interpret = _interpret_default()
    orig = x.shape
    D = x.shape[-1]
    Fq = wq.shape[1]
    wf = jnp.concatenate([wq, wkv], axis=1)
    out = _core(x.reshape(-1, D), gamma, wf, eps, block_m, interpret)
    out = out.reshape(orig[:-1] + (out.shape[-1],))
    return out[..., :Fq], out[..., Fq:]


# ---------------------------------------------------------------------------
# int8 serving variants (no VJP) — W8A8 on the MXU at 2× the bf16 rate,
# mirroring ops/geglu_ff.py's quantization scheme: per-output-channel int8
# weights (quantized per dispatch, checkpoint-layout preserving) and
# per-token dynamic int8 activations.
# ---------------------------------------------------------------------------


def _fwd_int8_kernel(x_ref, mu_ref, inv_ref, w_ref, s_ref, o_ref):
    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    amax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
    sr = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(xn / sr), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (acc.astype(jnp.float32) * sr * s_ref[...]).astype(
        o_ref.dtype)


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
    """Serving-only W8A8 fused_ln_qkv: γ folds into the weights BEFORE
    per-channel quantization, the LN'd activations quantize per token
    inside the kernel."""
    from vit_exp_tpu.ops.geglu_ff import quantize_per_channel

    if interpret is None:
        interpret = _interpret_default()
    orig = x.shape
    D = x.shape[-1]
    Fq = wq.shape[1]
    wf = jnp.concatenate([wq, wkv], axis=1)
    wf = (wf.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None])
    w8, sc = quantize_per_channel(wf)
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    F = wf.shape[1]
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
        ],
        out_specs=pl.BlockSpec((block_m, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(_pad_rows(x2, pad_m), _pad_rows(mu, pad_m),
      _pad_rows(inv, pad_m, value=1.0), w8, sc[None, :])
    out = out[:M].reshape(orig[:-1] + (F,))
    return out[..., :Fq], out[..., Fq:]


def _fwd_int8_kernel_3out(x_ref, mu_ref, inv_ref, w_ref, s_ref,
                          oq_ref, ok_ref, ov_ref, *, fq, fk):
    xn = (x_ref[...].astype(jnp.float32) - mu_ref[...]) * inv_ref[...]
    amax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
    sr = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(xn / sr), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    deq = acc.astype(jnp.float32) * sr * s_ref[...]
    # lane-ALIGNED splits of the accumulator (fq/fk are 128-multiples —
    # Mosaic accepts these; the (m,h·d)→(h,m,d) in-kernel head transpose
    # does NOT lower: "infer-vector-layout: unsupported shape cast")
    oq_ref[...] = deq[:, :fq].astype(oq_ref.dtype)
    ok_ref[...] = deq[:, fq:fq + fk].astype(ok_ref.dtype)
    ov_ref[...] = deq[:, fq + fk:].astype(ov_ref.dtype)


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
    from vit_exp_tpu.ops.geglu_ff import quantize_per_channel

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
    wf = jnp.concatenate([wq, wkv], axis=1)
    wf = (wf.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None])
    w8, sc = quantize_per_channel(wf)
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    F = wf.shape[1]
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
      _pad_rows(inv, pad_m, value=1.0), w8, sc[None, :])
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

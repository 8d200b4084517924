"""Ring attention over a sequence mesh axis == full attention (8 CPU devs)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

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


def test_flash_with_lse_outputs_and_grads():
    """flash_attention_with_lse: lse matches the naive logsumexp, and grads
    through BOTH outputs match autodiff of the naive form (the lse
    cotangent folds into delta in the shared backward kernels)."""
    import math

    from vit_exp_tpu.ops.flash_attention import flash_attention_with_lse

    rng = np.random.default_rng(3)
    q, k, v = [
        jnp.asarray(rng.standard_normal((1, 2, 24, 8)).astype(np.float32))
        for _ in range(3)
    ]
    cot_o = jnp.asarray(rng.standard_normal((1, 2, 24, 8)).astype(np.float32))
    cot_l = jnp.asarray(rng.standard_normal((1, 2, 24)).astype(np.float32))
    scale = 1.0 / math.sqrt(8)

    def naive(q, k, v):
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid",
                         jax.nn.softmax(logits, axis=-1), v)
        return jnp.vdot(out, cot_o) + jnp.vdot(lse, cot_l)

    def ours(q, k, v):
        out, lse = flash_attention_with_lse(q, k, v, scale=scale,
                                            block_q=8, block_k=8)
        return jnp.vdot(out, cot_o) + jnp.vdot(lse, cot_l)

    out, lse = flash_attention_with_lse(q, k, v, scale=scale,
                                        block_q=8, block_k=8)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(jax.scipy.special.logsumexp(logits, -1)),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(jnp.einsum("bhij,bhjd->bhid",
                              jax.nn.softmax(logits, -1), v)),
        atol=2e-5)

    g_ref = jax.grad(naive, argnums=(0, 1, 2))(q, k, v)
    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=f"d{name}")


def test_ring_pallas_chunks_match_full_and_grad():
    """impl="pallas" ring attention (flash chunks, no local logits) ==
    full attention, forward and gradient."""
    rng = np.random.default_rng(5)
    q, k, v = [
        jnp.asarray(rng.standard_normal((1, 2, 64, 8)).astype(np.float32))
        for _ in range(3)
    ]
    mesh = _mesh()
    spec = P(None, None, "seq", None)

    # check_vma=False: pallas_call does not declare varying-mesh-axes info
    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq",
                                       impl="pallas"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    out = jax.jit(ring)(q, k, v)
    ref = _full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.square(ring(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_full_attention(q, k, v)))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=f"d{name}")


def test_cosine_attention_ring_impl_with_nulls():
    """cosine_attention(impl="ring") inside shard_map — including null kv
    (combined outside the ring) and learned q/k scales — == the xla impl
    on the full sequence, forward and gradient."""
    from vit_exp_tpu.ops.attention import cosine_attention

    rng = np.random.default_rng(7)
    b, h, n, d = 1, 2, 32, 8
    q, k, v = [
        jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        for _ in range(3)
    ]
    null_k = jnp.asarray(rng.standard_normal((h, 2, d)).astype(np.float32))
    null_v = jnp.asarray(rng.standard_normal((h, 2, d)).astype(np.float32))
    q_scale = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(d)).astype(np.float32))
    k_scale = jnp.asarray(
        (1 + 0.1 * rng.standard_normal(d)).astype(np.float32))

    mesh = _mesh()
    tok = P(None, None, "seq", None)
    rep3 = P(None, None, None)
    rep1 = P(None)

    def local(q, k, v, nk, nv, qs, ks):
        return cosine_attention(
            q, k, v, null_k=nk, null_v=nv, q_scale=qs, k_scale=ks,
            scale=8.0, impl="ring", ring_chunk_impl="pallas",
        )

    ring = shard_map(
        local, mesh=mesh,
        in_specs=(tok, tok, tok, rep3, rep3, rep1, rep1),
        out_specs=tok, check_vma=False,
    )
    out = jax.jit(ring)(q, k, v, null_k, null_v, q_scale, k_scale)
    ref = cosine_attention(
        q, k, v, null_k=null_k, null_v=null_v, q_scale=q_scale,
        k_scale=k_scale, scale=8.0, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    g_ring = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(jnp.square(
            ring(q, k, v, null_k, null_v, q_scale, k_scale))),
        argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jnp.square(cosine_attention(
            q, k, v, null_k=null_k, null_v=null_v, q_scale=q_scale,
            k_scale=k_scale, scale=8.0, impl="xla"))),
        argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, err_msg=f"d{name}")


def test_ctvit3d_seq_sharded_encode():
    """Full CTViT3D encode with seq_axis set, run under shard_map ==
    the unsharded tower with the SAME params — value and parameter
    gradients (tower-level sequence parallelism)."""
    from vit_exp_tpu.core.precision import Policy
    from vit_exp_tpu.models.ctvit3d import CTViT3D

    fp32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                  reduce_dtype=jnp.float32)
    kw = dict(dim=24, image_size=8, patch_size=4, temporal_size=8,
              temporal_patch_size=4, transformer_blocks=2, dim_head=4,
              heads=2, policy=fp32)
    ref_model = CTViT3D(attn_impl="xla", **kw)
    ring_model = CTViT3D(attn_impl="ring", seq_axis="seq",
                         ring_chunk_impl="xla", **kw)

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((1, 1, 8, 8, 8)).astype(np.float32))
    import flax.linen as nn

    params = nn.unbox(
        ref_model.init(jax.random.PRNGKey(0), video))["params"]

    mesh = _mesh()  # 4-device ('seq',) mesh; 2·2·2 = 8 tokens → chunk 2
    sharded = jax.jit(shard_map(
        lambda p, v: ring_model.apply({"params": p}, v),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(),
        check_vma=False,
    ))
    out_ring = sharded(params, video)
    out_ref = ref_model.apply({"params": params}, video)
    assert out_ring.shape == out_ref.shape == (1, 2, 2, 2, 24)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref),
                               atol=3e-5)

    g_ring = jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.square(sharded(p, video)))))(params)
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.square(ref_model.apply({"params": p},
                                                     video))))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4),
        g_ring, g_ref,
    )

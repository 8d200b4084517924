"""3D patch extraction and the segmentation un-patchify.

Pure reshape/transpose ops — XLA folds these into surrounding fusions, so no
Pallas kernel is needed; what matters is exact index-order parity with the
reference (SURVEY.md §7 hard-part #4), which these functions reproduce:

- patchify_3d: einops 'b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)'
  (ctvit3d.py:239-244).
- unpatchify_heads: per-token head output (b, d, w, h, pd*pw*ph*C) → voxel
  grid (b, C, D, W, H) via view + permute(0,7,1,4,2,5,3,6)
  (ct_clip.py:1206-1207 / 1118-1119).  NOTE the reference names the token
  grid dims (d, w, h) and divides p_h, p_w, p_d = H//h, W//w, D//d — for the
  production cube these all coincide; we follow the same axis naming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_f32(x, k, strides, dn):
    """conv_general_dilated with fp32 accumulation AND a working VJP.

    lax.conv with preferred_element_type=f32 on bf16 operands produces an
    f32 cotangent that the transposed-conv gradient rules reject (dtype
    mismatch bf16 vs f32); here the backward casts the cotangent to the
    operand dtype first — the grads round like every other bf16 matmul."""
    return jax.lax.conv_general_dilated(
        x, k, strides, "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def _conv_f32_fwd(x, k, strides, dn):
    return _conv_f32(x, k, strides, dn), (x, k)


def _conv_f32_bwd(strides, dn, res, gy):
    x, k = res
    _, vjp = jax.vjp(
        lambda a, b: jax.lax.conv_general_dilated(
            a, b, strides, "VALID", dimension_numbers=dn
        ),
        x, k,
    )
    return vjp(gy.astype(x.dtype))


_conv_f32.defvjp(_conv_f32_fwd, _conv_f32_bwd)


def _stats_kernel(x_ref, mu_ref, sq_ref, *, cpt, p1, p2):
    """Per-patch Σx and Σx² for one (c·pt, H, W) slab via block-diagonal
    ones matmuls: the W-window sums ride the MXU (bf16 in, fp32 accum —
    exact for Σx since the inputs are bf16 values), then cheap cpt/H
    reductions.  One pass over the bf16 video — replaces the profiled
    f32 materialization (3.7 ms) + strided reduce_windows (3.7 ms) of the
    "window" stats path."""
    x = x_ref[0]                                  # (cpt, H, W)
    H, W = x.shape[1], x.shape[2]
    hs, ws = H // p1, W // p2
    n = cpt * p1 * p2

    Mw = (jax.lax.broadcasted_iota(jnp.int32, (W, ws), 0) // p2
          == jax.lax.broadcasted_iota(jnp.int32, (W, ws), 1)
          ).astype(x.dtype)
    xr = x.reshape(cpt * H, W)
    xf = xr.astype(jnp.float32)
    # x² rounds to bf16 before the sum: per-element relative error ≤ 2⁻⁸,
    # averaging over n ≈ 4000 puts the Σx² error orders below LN tolerance
    x2 = (xf * xf).astype(x.dtype)
    sw = jax.lax.dot_general(
        xr, Mw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                             # (cpt·H, ws)
    qw = jax.lax.dot_general(
        x2, Mw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sw = jnp.sum(sw.reshape(cpt, H, ws), axis=0)  # (H, ws)
    qw = jnp.sum(qw.reshape(cpt, H, ws), axis=0)
    Mh = (jax.lax.broadcasted_iota(jnp.int32, (H, hs), 0) // p1
          == jax.lax.broadcasted_iota(jnp.int32, (H, hs), 1)
          ).astype(jnp.float32)
    s = jax.lax.dot_general(
        Mh, sw, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                             # (hs, ws)
    q = jax.lax.dot_general(
        Mh, qw, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mu_ref[0] = s / n
    sq_ref[0] = q


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _patch_stats_pallas(x, cpt, p1, p2, interpret):
    """x: (bt, cpt, H, W) → (μ, Σx²) each (bt, hs, ws) fp32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bt, _, H, W = x.shape
    hs, ws = H // p1, W // p2
    mu, sq = pl.pallas_call(
        functools.partial(_stats_kernel, cpt=cpt, p1=p1, p2=p2),
        grid=(bt,),
        in_specs=[pl.BlockSpec((1, cpt, H, W), lambda i: (i, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, hs, ws), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hs, ws), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, hs, ws), jnp.float32),
            jax.ShapeDtypeStruct((bt, hs, ws), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x)
    return mu, sq


def _patch_stats_fwd(x, cpt, p1, p2, interpret):
    return _patch_stats_pallas(x, cpt, p1, p2, interpret), (x,)


def _patch_stats_bwd(cpt, p1, p2, interpret, res, cts):
    (x,) = res
    dmu, dsq = cts
    n = cpt * p1 * p2

    def up(g):  # (bt, hs, ws) → (bt, 1, H, W) broadcast over cpt
        g = jnp.repeat(jnp.repeat(g, p1, axis=1), p2, axis=2)
        return g[:, None, :, :]

    dx = (up(dmu) / n + 2.0 * x.astype(jnp.float32) * up(dsq)).astype(x.dtype)
    return (dx,)


_patch_stats_pallas.defvjp(_patch_stats_fwd, _patch_stats_bwd)


def patchify_3d(video: jnp.ndarray, pt: int, p1: int, p2: int) -> jnp.ndarray:
    """(b, c, T, H, W) → (b, t, h, w, c*pt*p1*p2) with reference feature order."""
    b, c, T, H, W = video.shape
    t, h, w = T // pt, H // p1, W // p2
    x = video.reshape(b, c, t, pt, h, p1, w, p2)
    # target feature order is (c, pt, p1, p2) per patch
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, t, h, w, c * pt * p1 * p2)


def fused_patch_embed(
    video: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    pt: int,
    p1: int,
    p2: int,
    *,
    eps: float = 1e-5,
    compute_dtype=jnp.bfloat16,
    stats_impl: str = None,
) -> jnp.ndarray:
    """Patchify → LayerNorm(patch) → Linear, as ONE strided conv + fixups.

    Semantically identical to ``patchify_3d(v) |> LN(γ,β) |> Dense(W,b)``
    (the reference's to_patch_emb Sequential, ctvit3d.py:239-247) but
    restructured for TPU: the naive chain materializes the transposed patch
    tensor in fp32 (profiled at ~47 ms/dispatch for a (4,1,240,480,480)
    volume — 62% of non-attention time), while this form never builds it.

    Algebra: for a patch vector x with LN statistics (μ, σ),
        [(x−μ)/σ ⊙ γ + β] @ W + b = (x @ (γ⊙W) − μ·ΣᵢγᵢWᵢⱼ)/σ + (β@W + b)
    so the only heavy op is x @ (γ⊙W), computed as a strided conv straight
    off the video — XLA lowers a kernel==stride conv onto the MXU without an
    explicit im2col transpose.  The 3D patching is expressed as a 2D conv
    whose INPUT CHANNELS are the (c, pt) slab — for c==1 the
    (b,1,T,H,W)→(b·t, pt, H, W) regrouping is a free reshape, and a 2D NCHW
    conv with O(100) channels is the layout TPU convs are tuned for (a
    channels-last 3D conv with c==1 lane-pads the video ×128 and OOMs).
    Patch sums ride along as one extra conv output channel; Σx² comes from a
    second ones-kernel conv, giving σ via E[x²]−μ² (fp32 accumulation).

    video: (b, c, T, H, W); gamma/beta: (c*pt*p1*p2,) in reference feature
    order (c, pt, p1, p2); kernel: (c*pt*p1*p2, D); bias: (D,).
    Returns (b, t, h, w, D) in compute_dtype.
    """
    b, c, T, H, W = video.shape
    t = T // pt
    D = kernel.shape[1]
    n = c * pt * p1 * p2

    kf = kernel.astype(jnp.float32) * gamma.astype(jnp.float32)[:, None]
    csum = jnp.sum(kf, axis=0)  # (D,)
    dvec = beta.astype(jnp.float32) @ kernel.astype(jnp.float32) + bias
    # (c, pt, p1, p2, D) → OIHW (D, c*pt, p1, p2)
    kc = kf.reshape(c * pt, p1, p2, D).transpose(3, 0, 1, 2)

    # (b, c, t, pt, H, W) → (b·t, c·pt, H, W); free when c == 1
    x = video.reshape(b, c, t, pt, H, W)
    if c != 1:
        x = x.transpose(0, 2, 1, 3, 4, 5)
    else:
        x = jnp.moveaxis(x, 1, 2)  # no-op data movement for c == 1
    x = x.reshape(b * t, c * pt, H, W).astype(compute_dtype)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, kc.shape, ("NCHW", "OIHW", "NHWC")
    )

    if stats_impl is None:
        stats_impl = ("pallas" if jax.default_backend() == "tpu"
                      else "window")
    if stats_impl == "pallas":
        mu_g, sq_g = _patch_stats_pallas(
            x, c * pt, p1, p2, jax.default_backend() != "tpu")
        mu = mu_g.astype(jnp.float32)[..., None]     # (b·t, h, w, 1)
        sq = sq_g.astype(jnp.float32)[..., None]
        y = _conv_f32(x, kc.astype(compute_dtype), (p1, p2), dn)
    elif stats_impl == "window":
        # Σx / Σx² via strided reduce_window straight off x's natural
        # layout — the conv route forces an extra video-sized layout copy
        # of BOTH x and x² into the conv's preferred input layout (2×2.6 ms
        # + a 2.1 ms x² materialization at the production shape)
        def psum(v):
            return jax.lax.reduce_window(
                v.astype(jnp.float32), 0.0, jax.lax.add,
                (1, c * pt, p1, p2), (1, c * pt, p1, p2), "VALID",
            )  # (b·t, 1, h, w)

        s = psum(x)
        sq = psum(x * x)
        mu = jnp.moveaxis(s, 1, -1) / n       # (b·t, h, w, 1)
        sq = jnp.moveaxis(sq, 1, -1)
        y = _conv_f32(x, kc.astype(compute_dtype), (p1, p2), dn)
    else:  # "conv": stats as extra conv channels
        ones_k = jnp.ones((1, c * pt, p1, p2), compute_dtype)
        kca = jnp.concatenate([kc.astype(compute_dtype), ones_k], axis=0)
        y = _conv_f32(x, kca, (p1, p2), dn)       # (b·t, h, w, D+1) fp32
        sq = _conv_f32(x * x, ones_k, (p1, p2), dn)  # (b·t, h, w, 1)
        mu = y[..., D:] / n
        y = y[..., :D]

    var = jnp.maximum(sq / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    tokens = (y - mu * csum) * inv + dvec
    h, w = tokens.shape[1], tokens.shape[2]
    return tokens.reshape(b, t, h, w, D).astype(compute_dtype)


def unpatchify_heads(
    tokens: jnp.ndarray, p_d: int, p_w: int, p_h: int
) -> jnp.ndarray:
    """(b, d, w, h, p_d*p_w*p_h*C) head output → (b, C, D, W, H) voxel logits.

    Inverse of the reference's ``seg_logits.view(b, d, w, h, p_d, p_w, p_h,
    -1).permute(0, 7, 1, 4, 2, 5, 3, 6)`` (ct_clip.py:1206-1207).  The head's
    out-feature axis is laid out as (p_d, p_w, p_h, C).
    """
    b, d, w, h, f = tokens.shape
    C = f // (p_d * p_w * p_h)
    x = tokens.reshape(b, d, w, h, p_d, p_w, p_h, C)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, C, d * p_d, w * p_w, h * p_h)

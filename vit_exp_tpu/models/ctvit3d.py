"""CTViT3D — the production 3D ViT image tower, TPU-native.

Capability parity with transformer_maskgit/ctvit3d.py:175-490:
- 3D patch embedding 'b c (t pt)(h p1)(w p2) → b t h w (c·pt·p1·p2)' followed
  by LN → Linear → LN (ctvit3d.py:239-244);
- fixed 3D sin-cos position embedding (ctvit3d.py:121-169, ops/posemb.py);
- one joint transformer over all t·h·w tokens (ctvit3d.py:258): depth ×
  [cosine-sim attention with 2 null kv, GEGLU feedforward], residual, final
  gamma-only layernorm (attention.py:386-452);
- `patch_voxel_nums` property for the segmentation un-patchify
  (ctvit3d.py:221).

TPU-first choices: attention runs through the Pallas flash kernel
(ops/flash_attention.py) or the XLA einsum path; all matmuls bf16 on the MXU
with fp32 softmax/layernorm; heads/mlp carry logical axes for optional tensor
parallelism; the decode/VQGAN paths of the reference (dead-coded there) are
deliberately not ported — CTViT3D is encoder-only in every production config.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.layers import (
    BiasLayerNorm,
    DenseParams,
    GEGLUFeedForward,
    LNParams,
    PDense,
    ScaleLayerNorm,
    _logical_init,
)
from vit_exp_tpu.ops.attention import cosine_attention
from vit_exp_tpu.ops.flash_attention import FLASH_REMAT_POLICY
from vit_exp_tpu.ops.patches import fused_patch_embed
from vit_exp_tpu.ops.posemb import sincos_pos_embed_3d_traced


# param-declaration helpers (LNParams/DenseParams) live in models/layers.py


class CosineSelfAttention(nn.Module):
    """QK-l2norm self-attention with learned per-dim q/k scales and null kv.

    Parity: transformer_maskgit/attention.py:189-284 (FlashAttention class;
    scale=None → the SDPA 1/sqrt(dim_head) convention production checkpoints
    use).  Set scale=8.0 for the naive-path convention (attention.py:94-187).
    """

    dim: int
    heads: int = 8
    dim_head: int = 32
    num_null_kv: int = 2
    scale: Optional[float] = None
    attn_impl: str = "xla"
    # inference-only: fuse LN+q/kv projections into one Pallas kernel.
    # Training keeps the unfused path — XLA's big-K dW matmuls beat the
    # kernel's serial accumulator backward (1.56 vs 1.50 steps/s measured)
    fuse_qkv: bool = False
    ring_axis: str = "seq"          # mesh axis for attn_impl="ring"
    ring_chunk_impl: str = "pallas"
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, context=None, attn_bias=None):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        fuse_proj = (self.fuse_qkv and context is None
                     and attn_bias is None
                     and self.attn_impl in ("pallas", "pallas_static",
                                            "pallas_static_int8"))
        if fuse_proj:
            # ScaleLayerNorm + to_q + to_kv as ONE kernel (ops/fused_proj):
            # γ folds into the weights, the two narrow matmuls become one
            # (768, 768) six-tile matmul, the LN output never hits HBM.
            # Param tree identical to the unfused path.  Under the int8
            # serving impl the same kernel runs W8A8 (γ folded before
            # per-channel weight quantization).
            from vit_exp_tpu.models.layers import ScaleLNParams
            from vit_exp_tpu.ops.fused_proj import (
                fused_ln_qkv,
                fused_ln_qkv_int8,
            )
            from vit_exp_tpu.ops.flash_attention import hp_supported

            gamma_ln = ScaleLNParams(x.shape[-1], policy=self.policy,
                                     name="norm")()
            wq = DenseParams(x.shape[-1], inner, axes=("embed", "heads"),
                             use_bias=False, policy=self.policy,
                             name="to_q")()
            wkv = DenseParams(x.shape[-1], inner * 2,
                              axes=("embed", "heads"), use_bias=False,
                              policy=self.policy, name="to_kv")()
            if (self.attn_impl == "pallas_static_int8" and mask is None
                    and inner % 128 == 0
                    and hp_supported(n, n, self.heads, self.dim_head)):
                # heads-packed serving fast path: the qkv kernel emits
                # separate packed (b, n, inner) q/k/v (lane-aligned VMEM
                # splits), the attention kernel separates heads with
                # in-kernel lane slices, and the packed output feeds the
                # W8A8 out-projection directly — no head transposes / kv
                # splits ever hit HBM (the device trace showed them at
                # ~2.2 GB per batch-4 classify dispatch).  Param tree
                # identical.
                return self._packed_int8_attention(
                    x, gamma_ln, wq, wkv, b, n, inner)
            proj = (fused_ln_qkv_int8
                    if self.attn_impl == "pallas_static_int8"
                    else fused_ln_qkv)
            q, kv = proj(
                x.astype(self.policy.compute_dtype), gamma_ln, wq, wkv)
        else:
            # Reference quirk (attention.py:240-244, BOTH the naive and the
            # FlashAttention classes): `kv_input = default(context, x)` binds
            # BEFORE `x = self.norm(x)`, so self-attention k/v project from
            # the PRE-LayerNorm input; only q sees the normed x.  Real
            # checkpoints are trained with exactly this, so it is parity,
            # not a bug to fix (caught by scripts/real_weights_checklist.py
            # stage 3 against the actual reference module).
            kv_input = x
            x = ScaleLayerNorm(policy=self.policy, name="norm")(x)
            if context is not None:
                # cross-attention variant (attention.py:142-146 context norm)
                kv_input = ScaleLayerNorm(policy=self.policy,
                                          name="context_norm")(context)
            q = PDense(inner, axes=("embed", "heads"), use_bias=False,
                       policy=self.policy, name="to_q")(x)
            kv = PDense(inner * 2, axes=("embed", "heads"), use_bias=False,
                        policy=self.policy, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(
                b, t.shape[1], self.heads, self.dim_head
            ).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)

        null_k, null_v, q_scale, k_scale = self._attn_params()

        impl = self.attn_impl
        # "pallas_static": static-max kernel (logits bounded by the
        # cosine-sim structure; differentiable — bound cotangent is 0);
        # "pallas_static_int8": W8A8 serving forward (no VJP)
        static_max = impl in ("pallas_static", "pallas_static_int8")
        quantized = impl == "pallas_static_int8"
        if static_max:
            impl = "pallas"
        if attn_bias is not None and impl == "pallas":
            impl = "xla"  # bias path not in the kernel yet
        out = cosine_attention(
            q, k, v,
            null_k=null_k, null_v=null_v,
            q_scale=q_scale, k_scale=k_scale,
            scale=self.scale, mask=mask, attn_bias=attn_bias, impl=impl,
            static_max=static_max, quantized=quantized,
            ring_axis=self.ring_axis, ring_chunk_impl=self.ring_chunk_impl,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if quantized and self.fuse_qkv:
            # serving: W8A8 out-projection too (per-token activation scales)
            from vit_exp_tpu.ops.fused_proj import int8_proj

            w_out = DenseParams(inner, self.dim, axes=("heads", "embed"),
                                use_bias=False, policy=self.policy,
                                name="to_out")()
            return int8_proj(out.astype(self.policy.compute_dtype), w_out)
        return PDense(self.dim, axes=("heads", "embed"), use_bias=False,
                      policy=self.policy, name="to_out")(out)

    def _attn_params(self):
        """null kv + learned per-dim scales — ONE creation site shared by
        the transpose and heads-packed paths so the param tree (names,
        shapes, init) cannot fork between them (checkpoints stay
        interchangeable; tests/test_int8_parity.py asserts it)."""
        null_kv = self.param(
            "null_kv",
            _logical_init(nn.initializers.normal(1.0), ("heads", None, "kv")),
            (self.heads, 2 * self.num_null_kv, self.dim_head),
            self.policy.param_dtype,
        )
        # layout parity with attention.py:152: 'h (n r) d' with r=2 → unbind
        # the r axis: k rows are the even entries, v rows the odd ones
        nkv = null_kv.reshape(self.heads, self.num_null_kv, 2, self.dim_head)
        q_scale = self.param(
            "q_scale", _logical_init(nn.initializers.ones_init(), ("kv",)),
            (self.dim_head,), self.policy.param_dtype,
        )
        k_scale = self.param(
            "k_scale", _logical_init(nn.initializers.ones_init(), ("kv",)),
            (self.dim_head,), self.policy.param_dtype,
        )
        return nkv[:, :, 0], nkv[:, :, 1], q_scale, k_scale

    def _packed_int8_attention(self, x, gamma_ln, wq, wkv, b, n, inner):
        """Zero-relayout serving attention: packed q/k/v from the
        3-output W8A8 qkv kernel → heads-packed int8 attention → W8A8
        out-projection.  Creates the SAME params (null_kv, q_scale,
        k_scale, to_out) as the transpose path, so checkpoints are
        interchangeable.  (The alternative 2-out + v_group_offset wiring
        measured 0.5 ms/layer SLOWER end-to-end: the strided v reads out
        of the wide kv array cost more than the 3-output producer's
        extra ms — see scripts/ablate_hp_serving.py.)"""
        from vit_exp_tpu.ops.attention import cosine_attention_packed
        from vit_exp_tpu.ops.fused_proj import fused_ln_qkv3_int8, int8_proj

        q, k, v = fused_ln_qkv3_int8(
            x.astype(self.policy.compute_dtype), gamma_ln, wq, wkv)

        null_k, null_v, q_scale, k_scale = self._attn_params()
        out = cosine_attention_packed(
            q, k, v, self.heads,
            null_k=null_k, null_v=null_v,
            q_scale=q_scale, k_scale=k_scale, scale=self.scale,
            quantized=True,
        )
        w_out = DenseParams(inner, self.dim, axes=("heads", "embed"),
                            use_bias=False, policy=self.policy,
                            name="to_out")()
        return int8_proj(out.astype(self.policy.compute_dtype), w_out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    scale: Optional[float]
    attn_impl: str
    ff_impl: str = "xla"  # "pallas" = fused GEGLU kernel (fwd + fused bwd)
    ff_mult: float = 4.0
    fuse_qkv: bool = False
    ring_axis: str = "seq"
    ring_chunk_impl: str = "pallas"
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, mask=None, attn_bias=None):
        x = x + CosineSelfAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            scale=self.scale, attn_impl=self.attn_impl, policy=self.policy,
            fuse_qkv=self.fuse_qkv,
            ring_axis=self.ring_axis, ring_chunk_impl=self.ring_chunk_impl,
            name="attn",
        )(x, mask=mask, attn_bias=attn_bias)
        x = x + GEGLUFeedForward(
            dim=self.dim, mult=self.ff_mult, policy=self.policy, name="ff",
            impl=self.ff_impl,
        )(x)
        return x


class CTViT3D(nn.Module):
    dim: int = 768
    image_size: int = 480
    patch_size: int = 20
    temporal_size: int = 240
    temporal_patch_size: int = 10
    transformer_blocks: int = 8
    dim_head: int = 32
    heads: int = 8
    channels: int = 1
    # None → SDPA 1/sqrt(dim_head) convention (production); 8.0 → naive path
    attn_scale: Optional[float] = None
    attn_impl: str = "xla"
    ff_impl: str = "xla"
    fuse_qkv: bool = False   # inference-only fused LN+q/kv prologue
    remat: bool = False
    # Sequence parallelism: set seq_axis (and attn_impl="ring") and run the
    # whole apply inside shard_map with that mesh axis bound — tokens are
    # sliced per shard after the (replicated) patch embed, the blocks run
    # ring attention + local FF/LN, and the full token grid is re-gathered
    # at the end.  Token count must divide the ring size.
    seq_axis: Optional[str] = None
    ring_chunk_impl: str = "pallas"
    policy: Policy = DEFAULT_POLICY

    @property
    def grid(self) -> tuple[int, int, int]:
        return (
            self.temporal_size // self.temporal_patch_size,
            self.image_size // self.patch_size,
            self.image_size // self.patch_size,
        )

    @property
    def patch_voxel_nums(self) -> int:
        return self.patch_size * self.patch_size * self.temporal_patch_size

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """video: (b, c, T, H, W) → encoded tokens (b, t, h, w, dim).

        Equivalent of reference forward(..., return_encoded_tokens=True)
        (ctvit3d.py:431-490) — the only forward mode the CLIP stack uses.
        """
        b = video.shape[0]
        n_t, n_h, n_w = self.grid
        patch_dim = self.channels * self.patch_voxel_nums
        gamma, beta = LNParams(patch_dim, policy=self.policy,
                               name="patch_norm_in")()
        kernel, bias = DenseParams(patch_dim, self.dim, axes=(None, "embed"),
                                   policy=self.policy, name="patch_proj")()
        x = fused_patch_embed(
            video, gamma, beta, kernel, bias,
            self.temporal_patch_size, self.patch_size, self.patch_size,
            compute_dtype=self.policy.compute_dtype,
        )
        x = BiasLayerNorm(policy=self.policy, name="patch_norm_out")(x)

        x = x.reshape(b, n_t * n_h * n_w, self.dim)
        pos = sincos_pos_embed_3d_traced(self.dim, (n_t, n_h, n_w))
        x = x + pos.astype(self.policy.compute_dtype)[None]

        if self.seq_axis is not None:
            import jax

            ring = jax.lax.axis_size(self.seq_axis)
            n_tok = x.shape[1]
            assert n_tok % ring == 0, (
                f"{n_tok} tokens not divisible by {ring} seq shards")
            chunk = n_tok // ring
            idx = jax.lax.axis_index(self.seq_axis)
            x = jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=1)

        block = TransformerBlock
        if self.remat:
            # save the flash-attention out+lse across the remat boundary:
            # the backward replay then skips the forward attention kernel
            # (17.3 ms/layer at production shape) and rebuilds only the
            # cheap projections; with xla attention the names never match
            # and this degrades to plain full remat
            block = nn.remat(TransformerBlock, prevent_cse=False,
                             policy=FLASH_REMAT_POLICY)
        for i in range(self.transformer_blocks):
            x = block(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                scale=self.attn_scale, attn_impl=self.attn_impl,
                ff_impl=self.ff_impl, policy=self.policy, name=f"block{i}",
                fuse_qkv=self.fuse_qkv,
                ring_axis=self.seq_axis or "seq",
                ring_chunk_impl=self.ring_chunk_impl,
            )(x)
        x = ScaleLayerNorm(policy=self.policy, name="norm_out")(x)
        if self.seq_axis is not None:
            import jax

            x = jax.lax.all_gather(x, self.seq_axis, axis=1, tiled=True)
        return x.reshape(b, n_t, n_h, n_w, self.dim)

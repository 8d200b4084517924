"""CTViT — the legacy factorized tower (original CT-CLIP / GenerateCT).

Capability parity with transformer_maskgit/ctvit.py:118-525:
- first-frame patch embedding (b c 1 (h p1)(w p2)) separate from the
  temporal-patched rest frames (ctvit.py:163-168);
- encode: per-frame SPATIAL transformer '(b t) (h w) d' then per-position
  TEMPORAL transformer '(b h w) t d' (ctvit.py:282-307);
- cosine-sim VectorQuantize codebook (ctvit.py:188, models/vq.py);
- encode AND decode spatial transformers take the ContinuousPositionBias
  additive bias (ctvit.py:293-295, 333-335); to_pixels decode
  (ctvit.py:309-351);
- reference attention conventions for the legacy tower: the NAIVE path
  (ctvit.py:177-187 passes no use_flash_attention) — scale=8
  (attention.py:105), no self-attn null kv (attention.py:423), causal PEG
  depthwise 3D conv positional encoding in every block
  (attention.py:62-90, peg=True/peg_causal=True).

The VQGAN-VAE training losses (recon MSE + GAN hinge/bce + gradient
penalty; ctvit.py:420-525) live in models/gan.py / train/ctvit_trainer.py.
Used by CT-LiPro/VocabFine checkpoint-parity paths (ct_lipro_train.py:47-51)
and the MaskGIT generative stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.ctvit3d import CosineSelfAttention
from vit_exp_tpu.models.layers import (
    BiasLayerNorm,
    GEGLUFeedForward,
    PDense,
    ScaleLayerNorm,
)
from vit_exp_tpu.models.vq import VectorQuantize


class ContinuousPositionBias(nn.Module):
    """MLP on log-scaled relative coordinates → per-head additive bias
    (attention.py:335-382 semantics, 2D grid)."""

    dim: int
    heads: int
    num_layers: int = 2
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        grid = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        rel = grid[:, None, :] - grid[None, :, :]          # (hw, hw, 2)
        rel = jnp.sign(rel) * jnp.log1p(jnp.abs(rel))
        x = rel.astype(jnp.float32)
        for i in range(self.num_layers):
            x = PDense(self.dim, policy=self.policy, name=f"net{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = PDense(self.heads, policy=self.policy, name="to_bias")(x)
        return x.transpose(2, 0, 1)[None]                  # (1, heads, hw, hw)


class PEG(nn.Module):
    """Depthwise 3D conv positional encoding (attention.py:62-90)."""

    dim: int
    causal: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, video_shape: Tuple[int, int, int, int]
                 ) -> jnp.ndarray:
        b, t, h, w = video_shape
        feat = x.reshape(b, t, h, w, self.dim)
        # causal → pad time with (2, 0) so no future leakage (attention.py:78)
        out = nn.Conv(
            self.dim, kernel_size=(3, 3, 3), feature_group_count=self.dim,
            padding=[(2, 0) if self.causal else (1, 1), (1, 1), (1, 1)],
            name="dsconv",
        )(feat)
        return out.reshape(x.shape)


class TransformerStack(nn.Module):
    """depth × [optional PEG, self-attn(+bias), GEGLU FF] + gamma-only LN out
    (attention.py:386-452)."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 32
    scale: Optional[float] = None
    num_null_kv: int = 2
    attn_impl: str = "xla"
    peg: bool = False
    peg_causal: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, video_shape=None, attn_bias=None, mask=None):
        for i in range(self.depth):
            if self.peg:
                x = x + PEG(self.dim, causal=self.peg_causal,
                            policy=self.policy, name=f"peg{i}")(
                    x, video_shape
                )
            x = x + CosineSelfAttention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                scale=self.scale, num_null_kv=self.num_null_kv,
                attn_impl=self.attn_impl,
                policy=self.policy, name=f"attn{i}",
            )(x, mask=mask, attn_bias=attn_bias)
            x = x + GEGLUFeedForward(dim=self.dim, policy=self.policy,
                                     name=f"ff{i}")(x)
        return ScaleLayerNorm(policy=self.policy, name="norm_out")(x)


class CTViT(nn.Module):
    dim: int = 512
    codebook_size: int = 8192
    image_size: int = 480
    patch_size: int = 20
    temporal_patch_size: int = 10
    spatial_depth: int = 4
    temporal_depth: int = 4
    dim_head: int = 32
    heads: int = 8
    channels: int = 1
    attn_impl: str = "xla"
    # reference CTViT transformers are the NAIVE attention path
    # (ctvit.py:177-187 passes no use_flash_attention): scale=8
    # (attention.py:105), no self-attn null kv (attention.py:423 omits
    # num_null_kv → 0), and PEG enabled causal (peg=True, peg_causal=True)
    attn_scale: Optional[float] = 8.0
    attn_num_null_kv: int = 0
    use_peg: bool = True
    policy: Policy = DEFAULT_POLICY

    @property
    def patch_hw(self) -> Tuple[int, int]:
        return (self.image_size // self.patch_size,
                self.image_size // self.patch_size)

    @property
    def patch_voxel_nums(self) -> int:
        return self.patch_size * self.patch_size * self.temporal_patch_size

    def setup(self):
        p, pt, c = self.patch_size, self.temporal_patch_size, self.channels
        self.first_frame_norm_in = BiasLayerNorm(policy=self.policy)
        self.first_frame_proj = PDense(self.dim, policy=self.policy)
        self.first_frame_norm_out = BiasLayerNorm(policy=self.policy)
        self.rest_norm_in = BiasLayerNorm(policy=self.policy)
        self.rest_proj = PDense(self.dim, policy=self.policy)
        self.rest_norm_out = BiasLayerNorm(policy=self.policy)

        kw = dict(dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                  scale=self.attn_scale, num_null_kv=self.attn_num_null_kv,
                  peg=self.use_peg, peg_causal=self.use_peg,
                  attn_impl=self.attn_impl, policy=self.policy)
        self.enc_spatial = TransformerStack(depth=self.spatial_depth, **kw)
        self.enc_temporal = TransformerStack(depth=self.temporal_depth, **kw)
        self.dec_spatial = TransformerStack(depth=self.spatial_depth, **kw)
        self.dec_temporal = TransformerStack(depth=self.temporal_depth, **kw)
        self.spatial_rel_pos_bias = ContinuousPositionBias(
            dim=self.dim, heads=self.heads, policy=self.policy
        )
        self.vq = VectorQuantize(dim=self.dim, codebook_size=self.codebook_size)
        self.to_pixels_first_frame = PDense(c * p * p, policy=self.policy)
        self.to_pixels = PDense(c * pt * p * p, policy=self.policy)

    # -- patch embeddings ----------------------------------------------------

    def _patchify_first(self, frame):
        """(b, c, 1, H, W) → (b, 1, h, w, c*p*p)."""
        b, c, _, H, W = frame.shape
        p = self.patch_size
        x = frame.reshape(b, c, 1, H // p, p, W // p, p)
        x = x.transpose(0, 2, 3, 5, 1, 4, 6)
        x = x.reshape(b, 1, H // p, W // p, c * p * p)
        return self.first_frame_norm_out(
            self.first_frame_proj(self.first_frame_norm_in(x))
        )

    def _patchify_rest(self, video):
        """(b, c, T-1, H, W) → (b, t, h, w, c*pt*p*p)."""
        from vit_exp_tpu.ops.patches import patchify_3d

        x = patchify_3d(video, self.temporal_patch_size, self.patch_size,
                        self.patch_size)
        return self.rest_norm_out(self.rest_proj(self.rest_norm_in(x)))

    def tokens_from_video(self, video: jnp.ndarray) -> jnp.ndarray:
        video = video.astype(self.policy.compute_dtype)
        first, rest = video[:, :, :1], video[:, :, 1:]
        tokens = jnp.concatenate(
            [self._patchify_first(first), self._patchify_rest(rest)], axis=1
        )
        return tokens  # (b, t, h, w, dim)

    # -- encode / quantize / decode -------------------------------------------

    def encode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """spatial-then-temporal attention (ctvit.py:282-307); the spatial
        transformer takes the ContinuousPositionBias like the reference
        encode (ctvit.py:293-295), not just decode."""
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)
        x = tokens.reshape(b * t, h * w, d)
        bias = self.spatial_rel_pos_bias(h, w)
        x = self.enc_spatial(x, video_shape=video_shape, attn_bias=bias)
        x = x.reshape(b, t, h, w, d).transpose(0, 2, 3, 1, 4)
        x = x.reshape(b * h * w, t, d)
        x = self.enc_temporal(x, video_shape=video_shape)
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
        return x

    def quantize(self, tokens: jnp.ndarray, update_codebook: bool = False):
        return self.vq(tokens, update_codebook=update_codebook)

    def decode_trunk(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(b, t, h, w, d) → post-transformer decode features — everything
        of ctvit.py:309-351 BEFORE the to_pixels heads.  Split out so the
        VQGAN adaptive gen weight can differentiate the pixels head alone
        (grad_layer_wrt_loss on to_pixels[0].weight, ctvit.py:507-513)."""
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)
        x = tokens.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
        x = self.dec_temporal(x, video_shape=video_shape)
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
        x = x.reshape(b * t, h * w, d)
        bias = self.spatial_rel_pos_bias(h, w)
        x = self.dec_spatial(x, video_shape=video_shape, attn_bias=bias)
        return x.reshape(b, t, h, w, d)

    def pixels_from_trunk(self, x: jnp.ndarray) -> jnp.ndarray:
        """decode features → video via the first-frame/rest pixels heads."""
        b, t, h, w, d = x.shape
        p, pt, c = self.patch_size, self.temporal_patch_size, self.channels
        first = self.to_pixels_first_frame(x[:, :1])
        first = first.reshape(b, 1, h, w, c, p, p)
        first = first.transpose(0, 4, 1, 2, 5, 3, 6).reshape(
            b, c, 1, h * p, w * p
        )
        rest = self.to_pixels(x[:, 1:])
        rest = rest.reshape(b, t - 1, h, w, c, pt, p, p)
        rest = rest.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
            b, c, (t - 1) * pt, h * p, w * p
        )
        return jnp.concatenate([first, rest], axis=2)

    def decode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(b, t, h, w, d) → reconstructed video (ctvit.py:309-351)."""
        return self.pixels_from_trunk(self.decode_trunk(tokens))

    def __call__(
        self,
        video: jnp.ndarray,
        *,
        return_encoded_tokens: bool = True,
        return_recons: bool = False,
        update_codebook: bool = False,
    ):
        """Matches reference forward modes (ctvit.py:353-525): encoded tokens
        for the CLIP path, or (recon, indices, commit_loss) for VQGAN."""
        tokens = self.tokens_from_video(video)
        encoded = self.encode_tokens(tokens)
        if return_encoded_tokens and not return_recons:
            return encoded
        quantized, indices, commit = self.quantize(
            encoded, update_codebook=update_codebook
        )
        recon = self.decode_tokens(quantized)
        return recon, indices, commit

    def decode_from_indices(self, indices: jnp.ndarray) -> jnp.ndarray:
        codes = self.vq.codes_from_indices(indices)
        return self.decode_tokens(codes.astype(self.policy.compute_dtype))

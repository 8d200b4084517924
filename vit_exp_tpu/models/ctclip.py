"""CTCLIP — dual-encoder contrastive model with segmentation heads.

Capability parity with CT_CLIP/ct_clip/ct_clip.py:467-1388:
- text tower (flax BERT, CLS hidden state) + injected CTViT3D image tower;
- bias-free latent projections to_text_latent / to_visual_latent
  (ct_clip.py:614-629): image tokens are projected PER TOKEN, then averaged,
  then l2-normalized (ct_clip.py:1286-1316);
- learnable temperature, used as exp(temperature) (ct_clip.py:633, 1317);
- optional closed-set seg head: per-token MLP → un-patchify →
  (B, C, D, W, H) voxel logits (ct_clip.py:660-673, 1190-1213);
- optional open-vocab heads: open_seg_head per-token → per-voxel low-dim
  embeddings; open_text_head on prompt CLS states (ct_clip.py:675-714,
  1060-1129); loss family in models/losses.py;
- fix_text_encoder → stop_gradient on the text tower (ct_clip.py:654-658).

Loss functions live in models/losses.py and are applied OUTSIDE the module
by the train step, where the mesh/sharding context is known; the all-gather
of the reference (distributed.py:9-20) is implicit in GSPMD when latents are
batch-sharded.

Reference quirk reproduced: random_downsample (ct_clip.py:1047-1056) draws a
random start index but slices ``[::factor]`` unconditionally — so the
downsample is in fact deterministic; we implement it that way.
"""

from __future__ import annotations

from typing import Dict, Optional

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_exp_tpu.core.config import CTClipArchConfig
from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.bert import BertConfig, BertModel
from vit_exp_tpu.models.ctvit3d import CTViT3D
from vit_exp_tpu.models.layers import MLPHead, PDense
from vit_exp_tpu.ops.attention import l2norm
from vit_exp_tpu.ops.patches import unpatchify_heads


def downsample_stride(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, C, D, W, H) strided spatial downsample (ct_clip.py:1047-1056)."""
    if factor == 1:
        return x
    return x[:, :, ::factor, ::factor, ::factor]


class CTCLIP(nn.Module):
    visual: CTViT3D
    bert_config: BertConfig
    dim_text: int = 768
    dim_image: int = 768
    dim_latent: int = 768
    clip_arch: CTClipArchConfig = dataclasses.field(
        default_factory=CTClipArchConfig
    )
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.text_transformer = BertModel(self.bert_config, policy=self.policy,
                                          name="text_transformer")
        self.to_text_latent = PDense(self.dim_latent, axes=("embed", "latent"),
                                     use_bias=False, policy=self.policy,
                                     name="to_text_latent")
        self.to_visual_latent = PDense(self.dim_latent, axes=("embed", "latent"),
                                       use_bias=False, policy=self.policy,
                                       name="to_visual_latent")
        self.temperature = self.param(
            "temperature", nn.initializers.ones_init(), (), jnp.float32
        )
        ca = self.clip_arch
        pv = self.visual.patch_voxel_nums
        if ca.use_seg:
            hc = ca.seg_head
            self.seg_head = MLPHead(hc.n_layers, hc.mid_dim,
                                    hc.out_dim * pv, policy=self.policy,
                                    name="seg_head")
            self.seg_classes = hc.out_dim
        if ca.use_open_seg:
            hc = ca.open_seg_head
            self.open_seg_head = MLPHead(hc.n_layers, hc.mid_dim,
                                         hc.out_dim * pv, policy=self.policy,
                                         name="open_seg_head")
            self.open_seg_hidden = hc.out_dim
            tc = ca.open_text_head
            self.open_text_head = MLPHead(tc.n_layers, tc.mid_dim, tc.out_dim,
                                          policy=self.policy,
                                          name="open_text_head")
            if ca.fusion_head is not None:
                fc = ca.fusion_head
                self.fusion_head = MLPHead(fc.n_layers, fc.mid_dim, fc.out_dim,
                                           policy=self.policy,
                                           name="fusion_head")
            else:
                self.fusion_head = None
        if ca.use_mlm:
            # MLM.to_logits (mlm.py:66): Linear(dim_text, vocab)
            self.mlm_head = PDense(self.bert_config.vocab_size,
                                   axes=("embed", "vocab"),
                                   policy=self.policy, name="mlm_head")
        if ca.use_visual_ssl:
            from vit_exp_tpu.models.visual_ssl import (
                PredictionMLP,
                ProjectionMLP,
            )

            self.ssl_projector = ProjectionMLP(name="ssl_projector")
            if ca.visual_ssl_type == "simsiam":
                self.ssl_predictor = PredictionMLP(name="ssl_predictor")

    # -- encoders ----------------------------------------------------------

    def encode_image_tokens(self, video: jnp.ndarray) -> jnp.ndarray:
        """(b, c, T, H, W) → encoded tokens (b, t, h, w, dim_image)."""
        return self.visual(video)

    def encode_text_hidden(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        hidden = self.text_transformer(input_ids, attention_mask)
        if self.clip_arch.fix_text_encoder:
            hidden = jax.lax.stop_gradient(hidden)
        return hidden

    # -- latents -----------------------------------------------------------

    def image_latents_from_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Token mean → projection → l2norm.

        The reference projects PER TOKEN then averages (ct_clip.py:
        1286-1316); to_visual_latent is linear with no bias, so
        mean(X)·W == mean(X·W) exactly — reordering turns a
        (13824, 768)×(768, 768) matmul per volume into a cheap token-mean
        reduction plus a (1, 768)×(768, 768) row (same value, fp rounding
        only; parity covered by tests/test_convert.py)."""
        b = tokens.shape[0]
        flat = tokens.reshape(b, -1, tokens.shape[-1])
        pooled = jnp.mean(flat.astype(jnp.float32), axis=1)
        lat = self.to_visual_latent(pooled.astype(flat.dtype))
        return l2norm(lat.astype(jnp.float32))

    def text_latents_from_hidden(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """CLS state → projection → l2norm (ct_clip.py:1300-1316)."""
        lat = self.to_text_latent(hidden[:, 0, :])
        return l2norm(lat.astype(jnp.float32))

    # -- forward paths -----------------------------------------------------

    def __call__(
        self,
        video: jnp.ndarray,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Contrastive path: returns l2-normalized latents + temperature.

        The InfoNCE itself (losses.infonce_loss) runs in the train step over
        globally-visible latents (GSPMD all-gathers sharded batches).
        """
        text_hidden = self.encode_text_hidden(input_ids, attention_mask)
        tokens = self.encode_image_tokens(video)
        return {
            "text_latents": self.text_latents_from_hidden(text_hidden),
            "image_latents": self.image_latents_from_tokens(tokens),
            "temperature": self.temperature,
        }

    def init_all(
        self,
        video: jnp.ndarray,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
    ):
        """Initialization entry: touches every configured head so linen
        creates ALL parameters (setup() alone does not materialize params).
        Each tower runs ONCE; latents and every head derive from the shared
        tokens/hidden (param tree identical to routing through __call__ /
        mlm_logits / ssl_project, at a third of the init compute)."""
        tokens = self.encode_image_tokens(video)
        hidden = self.encode_text_hidden(input_ids, attention_mask)
        out = {
            "text_latents": self.text_latents_from_hidden(hidden),
            "image_latents": self.image_latents_from_tokens(tokens),
            "temperature": self.temperature,
        }
        ca = self.clip_arch
        if ca.use_seg:
            _ = self.seg_head(tokens[:, :1, :1, :1])
        if ca.use_open_seg:
            _ = self.open_seg_head(tokens[:, :1, :1, :1])
            _ = self.open_text_head(hidden[:, 0, :])
            if ca.fusion_head is not None:
                h = ca.open_seg_head.out_dim + ca.open_text_head.out_dim
                _ = self.fusion_head(jnp.zeros((1, h), video.dtype))
        if ca.use_mlm:
            _ = self.mlm_head(hidden)
        if ca.use_visual_ssl:
            pooled = jnp.mean(
                tokens.reshape(tokens.shape[0], -1, tokens.shape[-1]), axis=1
            )
            z = self.ssl_projector(pooled.astype(jnp.float32))
            if ca.visual_ssl_type == "simsiam":
                _ = self.ssl_predict(z)
        return out

    def forward_infer(
        self,
        text_latents: jnp.ndarray,
        image_latents: jnp.ndarray,
    ) -> jnp.ndarray:
        """Paired cosine score × exp(temperature) (ct_clip.py:792-855)."""
        sim = jnp.sum(text_latents * image_latents, axis=-1)
        return sim * jnp.exp(self.temperature)

    def seg_forward(self, video: jnp.ndarray) -> jnp.ndarray:
        """Closed-set path: (b, c, T, H, W) → (b, C, D, W, H) voxel logits."""
        tokens = self.encode_image_tokens(video)
        logits = self.seg_head(tokens)
        pt, p = self.visual.temporal_patch_size, self.visual.patch_size
        return unpatchify_heads(logits, pt, p, p)

    def open_seg_forward(
        self,
        video: jnp.ndarray,
        prompt_ids: jnp.ndarray,
        prompt_mask: Optional[jnp.ndarray] = None,
        down_factor: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Open-vocab path (ct_clip.py:1060-1129).

        prompt_ids: (C, L_text) one tokenized prompt per class.  Returns
        per-voxel embedding tokens (B, L, h) after strided downsample and
        per-class prompt logits (B, C, h).
        """
        factor = down_factor or self.clip_arch.open_seg_loss_down_factor
        b = video.shape[0]
        prompt_hidden = self.encode_text_hidden(prompt_ids, prompt_mask)
        prompt_logits = self.open_text_head(prompt_hidden[:, 0, :])  # (C, h)
        prompt_logits = jnp.broadcast_to(
            prompt_logits[None], (b,) + prompt_logits.shape
        )
        tokens = self.encode_image_tokens(video)
        logits = self.open_seg_head(tokens)
        pt, p = self.visual.temporal_patch_size, self.visual.patch_size
        voxel_emb = unpatchify_heads(logits, pt, p, p)  # (B, h, D, W, H)
        voxel_emb = downsample_stride(voxel_emb, factor)
        seg_preds = voxel_emb.transpose(0, 2, 3, 4, 1).reshape(
            b, -1, self.open_seg_hidden
        )
        return {"seg_preds": seg_preds, "prompt_logits": prompt_logits}

    def apply_fusion_head(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.fusion_head is not None
        return self.fusion_head(x)

    # -- SSL heads (off by default; wired behind use_mlm/use_visual_ssl) ---

    def mlm_logits(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Corrupted ids → per-position vocab logits (mlm.py:97-102: text
        tower + to_logits).  Corruption/loss live in models/mlm.py and run
        in the train step, where the step rng is known."""
        hidden = self.text_transformer(input_ids, attention_mask)
        return self.mlm_head(hidden)

    def ssl_project(self, video: jnp.ndarray) -> jnp.ndarray:
        """Augmented view → projector embedding z (visual_ssl.py:207-260:
        encoder hidden → MLP projector; we pool the token field)."""
        tokens = self.encode_image_tokens(video)
        pooled = jnp.mean(
            tokens.reshape(tokens.shape[0], -1, tokens.shape[-1]), axis=1
        )
        return self.ssl_projector(pooled.astype(jnp.float32))

    def ssl_predict(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.ssl_predictor(z)

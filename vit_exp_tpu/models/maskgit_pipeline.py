"""MaskGITTransformer — the text→CT-video orchestration over CTViT + MaskGit.

Capability parity with transformer_maskgit/MaskGITTransformer.py:336-720:
- sample(): text → token grid via iterative demasking → CTViT decode;
- forward(): training loss — encode video to VQ indices, random
  cosine-schedule masking, CE on masked positions;
- make_video(): scene chaining — generate successive clips, conditioning
  each on the previous clip's trailing frames (699-720).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from vit_exp_tpu.models.ctvit import CTViT
from vit_exp_tpu.models.maskgit import (
    MaskGit,
    maskgit_loss,
    maskgit_sample,
    maskgit_train_masking,
)


def t5_text_encode(t5_encoder) -> Callable:
    """Adapt models/t5_adapter.T5TextEncoder to the text_encode slot —
    restores the reference's T5 conditioning (t5.py:64-104; the encoder's
    d_model must match MaskGit.dim_context, get_encoded_dim semantics)."""

    def encode(ids, mask):
        states, _ = t5_encoder(ids, mask)
        return states

    return encode


class MaskGITTransformer:
    """Functional orchestrator: holds modules + their variables."""

    def __init__(
        self,
        ctvit: CTViT,
        ctvit_vars,
        maskgit: MaskGit,
        maskgit_vars,
        text_encode: Callable[[jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    ):
        self.ctvit = ctvit
        self.ctvit_vars = ctvit_vars
        self.maskgit = maskgit
        self.maskgit_vars = maskgit_vars
        self.text_encode = text_encode

    # -- training --------------------------------------------------------

    def loss(self, rng, video, text_ids, text_mask):
        """Masked-token CE (MaskGITTransformer.py:567-694)."""
        tokens = self.ctvit.apply(
            self.ctvit_vars, video, return_encoded_tokens=True,
            method=CTViT.__call__,
        )
        _, indices, _ = self.ctvit.apply(
            self.ctvit_vars, tokens, method=CTViT.quantize
        )
        b = indices.shape[0]
        flat = indices.reshape(b, -1)
        masked, mask = maskgit_train_masking(rng, flat, self.maskgit.mask_id)
        context = self.text_encode(text_ids, text_mask)
        logits = self.maskgit.apply(
            self.maskgit_vars, masked, context=context,
            context_mask=text_mask,
        )
        return maskgit_loss(logits, flat, mask)

    # -- sampling ----------------------------------------------------------

    def sample(
        self,
        rng,
        text_ids,
        text_mask,
        *,
        token_grid: Tuple[int, int, int],
        steps: int = 18,
        cond_scale: float = 3.0,
    ) -> jnp.ndarray:
        t, h, w = token_grid
        context = self.text_encode(text_ids, text_mask)
        ids = maskgit_sample(
            self.maskgit, self.maskgit_vars, rng,
            batch=text_ids.shape[0], seq_len=t * h * w,
            context=context, context_mask=text_mask,
            steps=steps, cond_scale=cond_scale,
        )
        ids = ids.reshape(-1, t, h, w)
        return self.ctvit.apply(
            self.ctvit_vars, ids, method=CTViT.decode_from_indices
        )

    def make_video(
        self,
        rng,
        prompts: List[Tuple[jnp.ndarray, jnp.ndarray]],
        *,
        token_grid: Tuple[int, int, int],
        overlap_frames: int = 1,
        **sample_kwargs,
    ) -> jnp.ndarray:
        """Scene chaining: one clip per prompt, trailing frames of each clip
        prepended to the next (MaskGITTransformer.py:699-720)."""
        clips = []
        for ids, mask in prompts:
            rng, sub = jax.random.split(rng)
            clip = self.sample(sub, ids, mask, token_grid=token_grid,
                               **sample_kwargs)
            if clips:
                clip = clip[:, :, overlap_frames:]
            clips.append(clip)
        return jnp.concatenate(clips, axis=2)

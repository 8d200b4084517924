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

    def _encode_indices(self, video) -> jnp.ndarray:
        """video → flat VQ token ids (the reference's
        return_only_codebook_ids encode, :438-440)."""
        tokens = self.ctvit.apply(
            self.ctvit_vars, video, return_encoded_tokens=True,
            method=CTViT.__call__,
        )
        _, indices, _ = self.ctvit.apply(
            self.ctvit_vars, tokens, method=CTViT.quantize
        )
        return indices.reshape(indices.shape[0], -1)

    def sample(
        self,
        rng,
        text_ids,
        text_mask,
        *,
        token_grid: Tuple[int, int, int],
        steps: int = 18,
        cond_scale: float = 3.0,
        prime_frames: Optional[jnp.ndarray] = None,
        **sample_kwargs,
    ) -> jnp.ndarray:
        """prime_frames: (b, c, T_p, H, W) video whose VQ tokens condition
        the demasking (prepended each round, logits sliced off —
        MaskGITTransformer.py:431-444, 502); T_p must fit the CTViT
        patching (1 + k·temporal_patch_size)."""
        t, h, w = token_grid
        context = self.text_encode(text_ids, text_mask)
        prime_ids = (None if prime_frames is None
                     else self._encode_indices(prime_frames))
        ids = maskgit_sample(
            self.maskgit, self.maskgit_vars, rng,
            batch=text_ids.shape[0], seq_len=t * h * w,
            context=context, context_mask=text_mask,
            steps=steps, cond_scale=cond_scale, prime_ids=prime_ids,
            **sample_kwargs,
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
        prime_length: int = 1,
        **sample_kwargs,
    ) -> jnp.ndarray:
        """Scene chaining (make_video, MaskGITTransformer.py:699-720): one
        clip per prompt, each conditioned on the PREVIOUS clip's trailing
        `prime_length` frames via prime tokens (not just concatenated);
        scenes are concatenated whole, reference semantics."""
        clips = []
        prime = None
        for ids, mask in prompts:
            rng, sub = jax.random.split(rng)
            clip = self.sample(sub, ids, mask, token_grid=token_grid,
                               prime_frames=prime, **sample_kwargs)
            clips.append(clip)
            if prime_length:
                prime = clip[:, :, -prime_length:]
        return jnp.concatenate(clips, axis=2)

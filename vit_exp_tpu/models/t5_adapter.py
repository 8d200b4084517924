"""T5 text conditioning for the MaskGIT stack.

Parity surface: transformer_maskgit/t5.py:64-104 (`t5_encode_text`) — the
reference conditions GenerateCT-style MaskGIT sampling on frozen
google/t5-v1_1-base encoder states, zeroing padded positions.  Our
MaskGITTransformer takes any `(b, n, ctx_dim)` context (models/maskgit.py),
so this module supplies that context from an HF **Flax** T5 encoder:

- `T5TextEncoder(name_or_config)` wraps transformers.FlaxT5EncoderModel —
  from a pretrained name when weights are available, or from a T5Config for
  offline/random-init use.  `__call__(ids, mask)` returns
  (encoded_states_with_pads_zeroed, mask), matching t5.py:96-104.
- `encoded_dim(cfg)` mirrors t5.py:46-59 (`get_encoded_dim` → d_model).
- A torch T5EncoderModel checkpoint converts via transformers' own
  from_pt=True loading — no custom converter needed; document-level hook
  only (the reference downloads weights at runtime, which this image
  cannot, so there is deliberately no baked-in checkpoint).

Everything is gated behind import-time availability so the package never
hard-requires the HF flax heads.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

MAX_LENGTH = 256  # t5.py:16
DEFAULT_T5_NAME = "google/t5-v1_1-base"  # t5.py:18


def available() -> bool:
    try:
        from transformers import FlaxT5EncoderModel  # noqa: F401

        return True
    except Exception:
        return False


def encoded_dim(config) -> int:
    """get_encoded_dim (t5.py:46-59): conditioning width = d_model."""
    return int(config.d_model)


class T5TextEncoder:
    """Frozen T5 encoder → MaskGIT context states.

    Build from a T5Config (offline, random init — shape-correct for tests
    and for loading converted weights into) or a local pretrained path.
    """

    def __init__(self, config=None, *, pretrained: Optional[str] = None,
                 params=None, dtype=jnp.float32):
        from transformers import FlaxT5EncoderModel, T5Config

        if pretrained is not None:
            # local directory with flax weights, or torch weights via
            # from_pt=True (transformers handles the conversion)
            self.model = FlaxT5EncoderModel.from_pretrained(
                pretrained, dtype=dtype)
        else:
            config = config or T5Config(
                d_model=64, d_ff=128, d_kv=16, num_heads=4, num_layers=2,
                vocab_size=512)
            self.model = FlaxT5EncoderModel(config, dtype=dtype)
        if params is not None:
            self.model.params = params
        self.ctx_dim = encoded_dim(self.model.config)

    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(b, n) ids/mask → ((b, n, d_model) states, (b, n) mask).

        Padded positions are zeroed (t5.py:96-104 masked_fill) and the
        encoder runs frozen (reference: requires_grad=False + no_grad)."""
        out = self.model(input_ids=input_ids, attention_mask=attention_mask)
        states = out.last_hidden_state
        states = jnp.where(attention_mask[..., None].astype(bool), states,
                           0.0)
        import jax

        return jax.lax.stop_gradient(states), attention_mask

"""VGG16 feature extractor for the CTViT VQGAN perceptual loss.

Reference surface: transformer_maskgit/ctvit.py:480-520 feeds 3-channel
256-resized frames through an injected `vgg` module and takes the MSE
between feature vectors (the ctor defaults `vgg=None` — ctvit.py:134 —
and never builds one itself, so the reference path also relies on the
caller injecting torchvision's vgg16).  This module supplies a runnable
default:

- `VGG16Features`: the torchvision vgg16 `features` stack (13 convs, 5
  maxpools) + avgpool + the first two classifier Linears (fc6/fc7 with
  ReLU) — i.e. vgg16 with `classifier[:-2]` removed, matching how VQGAN
  setups take a 4096-dim feature vector.
- `convert_torchvision_vgg16(state_dict)`: maps a torchvision
  `vgg16().state_dict()` onto the flax params, so REAL pretrained weights
  drop in when available (none are downloadable in this image).
- `random_vgg16_params(rng)`: seeded random initialization — a random
  convnet is a standard stand-in perceptual metric (random-feature
  perceptual distances correlate with learned ones; the GAN term still
  trains) and makes the loss term exist in a runnable configuration.

`vgg_feature_distance` is the drop-in `perceptual_fn` for
train/ctvit_trainer.py: frames are resized to 224 (the fc6 Linear fixes
the input resolution; torchvision's 256-resize + no-crop would break its
own classifier — we pick the canonical 224), grayscale repeated to 3
channels (ctvit.py:489-491).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv layer indices (weights at features.{i})
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16Features(nn.Module):
    """vgg16 feature extractor.

    include_classifier=True: conv stack + avgpool + fc6/fc7 → (b, 4096)
    (vgg16 with classifier[:-2]) — use with converted torchvision weights.
    include_classifier=False: pooled relu5_3 conv features → (b, 512·7·7
    flattened) — the random-init default (skips the 120M-param fc6/fc7
    whose random projections add nothing to a random-feature metric)."""

    include_classifier: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, 3, H, W) or (b, H, W, 3), float in imagenet-norm space."""
        if x.ndim == 4 and x.shape[1] == 3:
            x = x.transpose(0, 2, 3, 1)
        x = x.astype(jnp.float32)
        conv = 0
        for item in _CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, name=f"conv{conv}")(x)
                x = nn.relu(x)
                conv += 1
        # adaptive avgpool to 7×7 (assumes H, W multiples of 32; 224 → 7)
        b, h, w, c = x.shape
        x = x.reshape(b, 7, h // 7, 7, w // 7, c).mean(axis=(2, 4))
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)  # torch flatten order CHW
        if not self.include_classifier:
            return x
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        return x


def random_vgg16_params(rng, include_classifier: bool = False
                        ) -> Dict[str, Any]:
    model = VGG16Features(include_classifier=include_classifier)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    return model.init(rng, dummy)["params"]


def convert_torchvision_vgg16(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision vgg16 state_dict → VGG16Features flax params."""

    def np_(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    params: Dict[str, Any] = {}
    for i, idx in enumerate(_CONV_IDX):
        w = np_(state_dict[f"features.{idx}.weight"])  # (out, in, kh, kw)
        params[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),  # → (kh, kw, in, out)
            "bias": np_(state_dict[f"features.{idx}.bias"]),
        }
    for name, idx in (("fc6", 0), ("fc7", 3)):
        params[name] = {
            "kernel": np_(state_dict[f"classifier.{idx}.weight"]).T,
            "bias": np_(state_dict[f"classifier.{idx}.bias"]),
        }
    return params


def _resize_frames_224(frames: jnp.ndarray) -> jnp.ndarray:
    """(b, c, H, W) → (b, 3, 224, 224): bilinear resize + grayscale→RGB
    repeat (ctvit.py:485-493)."""
    b, c = frames.shape[:2]
    x = jax.image.resize(frames.astype(jnp.float32),
                         (b, c, 224, 224), method="bilinear")
    if c == 1:
        x = jnp.repeat(x, 3, axis=1)
    return x


def make_perceptual_fn(params):
    """Returns perceptual_fn(x, y) → scalar MSE of VGG features
    (ctvit.py:499-502), for train/ctvit_trainer.py."""
    model = VGG16Features(include_classifier="fc6" in params)

    def perceptual_fn(x, y):
        fx = model.apply({"params": params}, _resize_frames_224(x))
        fy = model.apply({"params": params}, _resize_frames_224(y))
        return jnp.mean(jnp.square(fx - fy))

    return perceptual_fn

"""Visual self-supervision — SimSiam / SimCLR over image-tower latents.

Off by default in every reference config (use_visual_ssl=False) but part of
the capability surface (CT_CLIP/ct_clip/visual_ssl.py:88-299).  The
reference intercepts a hidden layer via forward hooks and augments with
torchvision; here the encoder is a callable returning embeddings and
augmentations are jax-native (random crop-resize + flip + intensity jitter,
appropriate for CT windows).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


# -- augmentations -----------------------------------------------------------


def random_augment_3d(rng, video: jnp.ndarray) -> jnp.ndarray:
    """(b, c, D, H, W): random in-plane flips + intensity scale/shift."""
    f_rng, s_rng, b_rng = jax.random.split(rng, 3)
    flips = jax.random.bernoulli(f_rng, 0.5, (video.shape[0], 2))
    flipped_h = jnp.where(
        flips[:, 0][:, None, None, None, None], video[:, :, :, ::-1, :], video
    )
    flipped = jnp.where(
        flips[:, 1][:, None, None, None, None],
        flipped_h[:, :, :, :, ::-1], flipped_h,
    )
    scale = 1.0 + 0.1 * jax.random.normal(s_rng, (video.shape[0], 1, 1, 1, 1))
    shift = 0.05 * jax.random.normal(b_rng, (video.shape[0], 1, 1, 1, 1))
    return flipped * scale + shift


# -- losses ------------------------------------------------------------------


def nt_xent_loss(z1: jnp.ndarray, z2: jnp.ndarray,
                 temperature: float = 0.1) -> jnp.ndarray:
    """SimCLR NT-Xent (visual_ssl.py:88-115)."""
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    sim = (z @ z.T) / temperature
    sim = jnp.where(jnp.eye(2 * b, dtype=bool), -jnp.inf, sim)
    targets = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


def simsiam_loss(p1, z1, p2, z2) -> jnp.ndarray:
    """Negative cosine with stop-gradient targets (visual_ssl.py:207-260)."""

    def d(p, z):
        z = jax.lax.stop_gradient(z)
        p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return -jnp.mean(jnp.sum(p * z, axis=-1))

    return (d(p1, z2) + d(p2, z1)) / 2


class ProjectionMLP(nn.Module):
    hidden: int = 512
    out: int = 256
    layers: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, name="out")(x)


class PredictionMLP(nn.Module):
    hidden: int = 128
    out: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc0")(x)
        x = nn.LayerNorm(name="ln0")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, name="fc1")(x)


def simsiam_step(
    rng,
    encode: Callable[[jnp.ndarray], jnp.ndarray],
    projector_apply: Callable,
    predictor_apply: Callable,
    video: jnp.ndarray,
) -> jnp.ndarray:
    r1, r2 = jax.random.split(rng)
    v1 = random_augment_3d(r1, video)
    v2 = random_augment_3d(r2, video)
    z1 = projector_apply(encode(v1))
    z2 = projector_apply(encode(v2))
    return simsiam_loss(predictor_apply(z1), z1, predictor_apply(z2), z2)


def simclr_step(
    rng,
    encode: Callable[[jnp.ndarray], jnp.ndarray],
    projector_apply: Callable,
    video: jnp.ndarray,
    temperature: float = 0.1,
) -> jnp.ndarray:
    r1, r2 = jax.random.split(rng)
    z1 = projector_apply(encode(random_augment_3d(r1, video)))
    z2 = projector_apply(encode(random_augment_3d(r2, video)))
    return nt_xent_loss(z1, z2, temperature)

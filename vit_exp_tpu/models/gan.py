"""VQGAN-VAE adversarial pieces for CTViT training.

Capability parity with transformer_maskgit/ctvit.py:60-116, 420-525:
hinge/bce generator+discriminator losses, R1 gradient penalty, a conv
discriminator over 2D slices, and the adaptive generator-loss weight
(grad-norm ratio at the last decoder layer, ctvit.py:494-505).  The VGG
perceptual term is gated behind a feature-extractor callable (torchvision
VGG weights are not downloadable in this image; any jax feature fn plugs
in).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def hinge_discr_loss(fake_logits, real_logits):
    return jnp.mean(nn.relu(1.0 + fake_logits) + nn.relu(1.0 - real_logits))


def hinge_gen_loss(fake_logits):
    return -jnp.mean(fake_logits)


def bce_discr_loss(fake_logits, real_logits):
    # softplus == log1p(exp(·)) computed stably (exp overflows fp32 for
    # logits ≳88, which early discriminators readily produce)
    return jnp.mean(nn.softplus(fake_logits) + nn.softplus(-real_logits))


def bce_gen_loss(fake_logits):
    return jnp.mean(nn.softplus(-fake_logits))


def gradient_penalty(discr_apply, params, images, weight: float = 10.0):
    """Reference gradient penalty (ctvit.py:60-73): WGAN-GP form
    weight · E[(‖∇_x Σ D(x)‖₂ − 1)²] on REAL images (grad_outputs=ones ≡
    grad of the logit sum)."""

    def score(imgs):
        return jnp.sum(discr_apply(params, imgs))

    grads = jax.grad(score)(images)
    norms = jnp.sqrt(
        jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1) + 1e-12
    )
    return weight * jnp.mean((norms - 1.0) ** 2)


class SliceDiscriminator(nn.Module):
    """2D conv discriminator over image slices (the reference discriminates
    per-frame 2D slices of the CT video; discr at ctvit.py:189-213)."""

    base_dim: int = 16
    num_layers: int = 4

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (b, 1, H, W) or (b, H, W, 1) → (b,) logits."""
        if images.shape[1] in (1, 3) and images.ndim == 4:
            images = images.transpose(0, 2, 3, 1)
        x = images.astype(jnp.float32)
        dim = self.base_dim
        for i in range(self.num_layers):
            x = nn.Conv(dim, (4, 4), strides=(2, 2), name=f"conv{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
            dim = min(dim * 2, 256)
        x = nn.Conv(1, (1, 1), name="to_logit")(x)
        return jnp.mean(x, axis=(1, 2, 3))


def adaptive_gen_weight(recon_grad_norm, gen_grad_norm, eps=1e-8,
                        clip_max=1e4):
    """λ = ||∇ recon|| / ||∇ gen|| (ctvit.py:494-505)."""
    return jnp.clip(recon_grad_norm / (gen_grad_norm + eps), 0.0, clip_max)


def pick_random_frames(video: jnp.ndarray, rng) -> jnp.ndarray:
    """(b, c, T, H, W) → one random frame per sample (ctvit.py:100-112)."""
    b, _, t = video.shape[:3]
    idx = jax.random.randint(rng, (b,), 0, t)
    return jax.vmap(lambda v, i: v[:, i])(video, idx)

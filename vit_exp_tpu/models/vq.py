"""Vector quantization with cosine-similarity codebook.

Capability parity with the reference's use of vector-quantize-pytorch in
CTViT (ctvit.py:188: VectorQuantize(dim, codebook_size, use_cosine_sim=True)):
l2-normalized codes + inputs, nearest-code assignment, straight-through
estimator, commitment loss, EMA codebook updates.  cdist+argmin is one
matmul + argmin — MXU/XLA-friendly (SURVEY.md §2.9 item 5).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_exp_tpu.ops.attention import l2norm


class VectorQuantize(nn.Module):
    dim: int
    codebook_size: int
    commitment_weight: float = 1.0
    ema_decay: float = 0.99

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_codebook: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (..., dim) → (quantized, indices, commit_loss)."""
        def init_codes():
            return jax.random.normal(
                jax.random.PRNGKey(self.codebook_size),
                (self.codebook_size, self.dim),
            )

        codebook = self.variable("codebook", "codes", init_codes)
        counts = self.variable(
            "codebook", "counts", lambda: jnp.ones((self.codebook_size,))
        )
        # EMA numerator; codes = embed_sum / counts (standard EMA-VQ à la
        # vector-quantize-pytorch).  Initialized to the codes so the ratio
        # starts at the random init (counts start at 1).
        embed_sum = self.variable("codebook", "embed_sum", init_codes)

        flat = x.reshape(-1, self.dim)
        xn = l2norm(flat.astype(jnp.float32))
        cn = l2norm(codebook.value.astype(jnp.float32))
        sim = xn @ cn.T                       # cosine similarity
        indices = jnp.argmax(sim, axis=-1)
        quantized = jnp.take(cn, indices, axis=0)

        commit = jnp.mean(jnp.sum((xn - jax.lax.stop_gradient(quantized)) ** 2,
                                  axis=-1))
        # straight-through: gradients flow to the (normalized) input
        quantized = xn + jax.lax.stop_gradient(quantized - xn)

        if update_codebook and not self.is_initializing():
            # EMA over BOTH the assignment counts and the assigned-vector
            # sums; the code is their ratio.  (Using the raw per-batch sum
            # directly in the code EMA — the previous form — made the
            # effective decay collapse toward 0 for popular codes: a code
            # assigned m unit-norm vectors got a (1-decay)·O(m) update
            # against its own O(1) magnitude.)
            onehot = jax.nn.one_hot(indices, self.codebook_size,
                                    dtype=jnp.float32)
            new_counts = (
                self.ema_decay * counts.value + (1 - self.ema_decay)
                * jnp.sum(onehot, axis=0)
            )
            new_sums = (
                self.ema_decay * embed_sum.value + (1 - self.ema_decay)
                * (onehot.T @ xn)
            )
            counts.value = new_counts
            embed_sum.value = new_sums
            codebook.value = new_sums / jnp.maximum(new_counts, 1e-5)[:, None]

        out_shape = x.shape[:-1]
        return (
            quantized.reshape(*out_shape, self.dim).astype(x.dtype),
            indices.reshape(out_shape),
            commit * self.commitment_weight,
        )

    def codes_from_indices(self, indices: jnp.ndarray) -> jnp.ndarray:
        codebook = self.get_variable("codebook", "codes")
        return jnp.take(
            l2norm(codebook.astype(jnp.float32)), indices, axis=0
        )

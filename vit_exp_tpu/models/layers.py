"""Shared flax building blocks with TPU-friendly precision and sharding.

Parity targets (file:line in /root/reference):
- ScaleLayerNorm: gamma-only bias-less layernorm,
  transformer_maskgit/attention.py:34-41.
- GEGLUFeedForward: LayerNorm → Linear(dim, 2*inner, no bias) → GEGLU →
  Linear(inner, dim, no bias) with inner = int(mult*2/3*dim),
  transformer_maskgit/attention.py:45-58 (exact-erf GELU, torch default).
- MLPHead: n_layers × [Linear → LeakyReLU(0.2)], identity after the last
  layer, CT_CLIP/ct_clip/ct_clip.py:736-750.

All parameters are fp32; activations are cast to the policy compute dtype;
layernorm statistics run in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY

Axes = Tuple[Optional[str], ...]


def _logical_init(init, axes: Axes):
    return nn.with_logical_partitioning(init, axes)


class PDense(nn.Module):
    """nn.Dense with logical kernel axes for GSPMD sharding."""

    features: int
    axes: Axes = (None, None)
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            _logical_init(nn.initializers.lecun_normal(), self.axes),
            (x.shape[-1], self.features),
            self.policy.param_dtype,
        )
        y = jnp.dot(
            x.astype(self.policy.compute_dtype),
            kernel.astype(self.policy.compute_dtype),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                _logical_init(nn.initializers.zeros_init(), (self.axes[-1],)),
                (self.features,),
                self.policy.param_dtype,
            )
            y = y + bias.astype(y.dtype)
        return y


class ScaleLayerNorm(nn.Module):
    """Gamma-only layernorm (beta pinned to 0), fp32 statistics."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param(
            "gamma",
            _logical_init(nn.initializers.ones_init(), ("embed",)),
            (dim,),
            self.policy.param_dtype,
        )
        x32 = x.astype(self.policy.reduce_dtype)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + 1e-5)
        return (y * gamma.astype(self.policy.reduce_dtype)).astype(
            self.policy.compute_dtype
        )


class BiasLayerNorm(nn.Module):
    """Standard layernorm (scale + bias), fp32 statistics, torch eps 1e-5."""

    policy: Policy = DEFAULT_POLICY
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param(
            "gamma",
            _logical_init(nn.initializers.ones_init(), ("embed",)),
            (dim,),
            self.policy.param_dtype,
        )
        beta = self.param(
            "beta",
            _logical_init(nn.initializers.zeros_init(), ("embed",)),
            (dim,),
            self.policy.param_dtype,
        )
        x32 = x.astype(self.policy.reduce_dtype)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        y = y * gamma.astype(y.dtype) + beta.astype(y.dtype)
        return y.astype(self.policy.compute_dtype)


class LNParams(nn.Module):
    """Declares BiasLayerNorm's exact params (gamma/beta) without running
    the naive LN — for fused kernels that apply the affine themselves.
    Give it the module name the LN would have had and checkpoint param
    paths are unchanged."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self):
        gamma = self.param(
            "gamma",
            _logical_init(nn.initializers.ones_init(), ("embed",)),
            (self.dim,), self.policy.param_dtype,
        )
        beta = self.param(
            "beta",
            _logical_init(nn.initializers.zeros_init(), ("embed",)),
            (self.dim,), self.policy.param_dtype,
        )
        return gamma, beta


class ScaleLNParams(nn.Module):
    """Declares ScaleLayerNorm's exact param (gamma) for fused kernels."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self):
        return self.param(
            "gamma",
            _logical_init(nn.initializers.ones_init(), ("embed",)),
            (self.dim,), self.policy.param_dtype,
        )


class DenseParams(nn.Module):
    """Declares PDense's exact params (kernel[, bias]) for fused kernels."""

    in_dim: int
    features: int
    axes: Axes = (None, None)
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            _logical_init(nn.initializers.lecun_normal(), self.axes),
            (self.in_dim, self.features), self.policy.param_dtype,
        )
        if not self.use_bias:
            return kernel
        bias = self.param(
            "bias",
            _logical_init(nn.initializers.zeros_init(), (self.axes[-1],)),
            (self.features,), self.policy.param_dtype,
        )
        return kernel, bias


class GEGLUFeedForward(nn.Module):
    """impl="pallas": fused LN→wi→GEGLU→wo kernel (ops/geglu_ff.py) with a
    fused Pallas backward (training-capable); param tree identical to the
    xla path."""

    dim: int
    mult: float = 4.0
    policy: Policy = DEFAULT_POLICY
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        inner = int(self.mult * (2.0 / 3.0) * self.dim)
        if self.impl in ("pallas", "pallas_int8"):
            from vit_exp_tpu.ops.geglu_ff import (fused_geglu_ff,
                                                  fused_geglu_ff_int8)

            gamma, beta = LNParams(self.dim, policy=self.policy,
                                   name="norm")()
            w1 = DenseParams(self.dim, inner * 2, axes=("embed", "mlp"),
                             use_bias=False, policy=self.policy, name="wi")()
            w2 = DenseParams(inner, self.dim, axes=("mlp", "embed"),
                             use_bias=False, policy=self.policy, name="wo")()
            fn = (fused_geglu_ff_int8 if self.impl == "pallas_int8"
                  else fused_geglu_ff)
            return fn(
                x.astype(self.policy.compute_dtype), gamma, beta, w1, w2
            )
        x = BiasLayerNorm(policy=self.policy, name="norm")(x)
        x = PDense(
            inner * 2, axes=("embed", "mlp"), use_bias=False,
            policy=self.policy, name="wi",
        )(x)
        val, gate = jnp.split(x, 2, axis=-1)
        # torch F.gelu default is the exact erf form
        x = nn.gelu(gate, approximate=False) * val
        return PDense(
            self.dim, axes=("mlp", "embed"), use_bias=False,
            policy=self.policy, name="wo",
        )(x)


class MLPHead(nn.Module):
    """create_head-equivalent MLP: LeakyReLU(0.2) between layers."""

    n_layers: int
    mid_dim: int
    out_dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            out = self.out_dim if i == self.n_layers - 1 else self.mid_dim
            x = PDense(out, axes=(None, None), policy=self.policy, name=f"fc{i}")(x)
            if i < self.n_layers - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class PatchDropout(nn.Module):
    """Random token subsampling during training (ct_clip.py:189-206; the
    PatchDropout paper's ViT economizer): keep a random
    max(1, int(n·(1−prob))) of the n tokens per sample.  Static output
    shape (the keep count is trace-time), so it composes with jit; at
    prob=0 / deterministic it is identity.  Needs an rng named
    "patch_dropout"."""

    prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        if deterministic or self.prob == 0.0:
            return x
        import jax

        b, n = x.shape[0], x.shape[1]
        keep = max(1, int(n * (1.0 - self.prob)))
        rng = self.make_rng("patch_dropout")
        scores = jax.random.normal(rng, (b, n))
        _, idx = jax.lax.top_k(scores, keep)           # (b, keep)
        return jnp.take_along_axis(
            x, idx[..., None].astype(jnp.int32), axis=1
        )

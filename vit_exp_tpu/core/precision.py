"""Mixed-precision policy.

The reference trains under `accelerator.autocast()` (CTCLIPTrainer.py:594)
with fp32 master weights.  TPU-native equivalent: fp32 parameters, bfloat16
activations/matmuls (MXU-native), fp32 for numerically sensitive reductions
(layernorm statistics, softmax, losses).  The policy is threaded through
modules as a dtype pair instead of a context manager.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype for softmax / layernorm / loss accumulation
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, *xs):
        out = tuple(jnp.asarray(x, self.compute_dtype) for x in xs)
        return out[0] if len(out) == 1 else out


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)

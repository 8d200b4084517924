"""Ablate the GEGLU feed-forward fwd+bwd at production shape on the TPU.

Variants (production shape: 4·13824 = 55296 tokens, D=768, inner=2048):
  xla_fwd      : GEGLUFeedForward impl="xla" forward only
  pallas_fwd   : fused kernel forward only
  xla_bwd      : value_and_grad through the xla module (dx + all dparams)
  pallas_bwd   : value_and_grad through the fused kernel (fused Pallas bwd)

Relay-robust loop-differencing protocol (see ablate_attention.py).
Usage: PYTHONPATH=/root/repo python scripts/ablate_ff.py [name-filter...]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.core.precision import Policy
    from vit_exp_tpu.models.layers import GEGLUFeedForward

    assert jax.default_backend() == "tpu"
    M, D = 4 * 13824, 768
    policy = Policy()  # fp32 params, bf16 compute
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)

    xla_mod = GEGLUFeedForward(dim=D, policy=policy, impl="xla")
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01,
        xla_mod.init(jax.random.PRNGKey(0), x)["params"],
    )
    pallas_mod = GEGLUFeedForward(dim=D, policy=policy, impl="pallas")

    def fwd_fn(mod):
        def f(xx):
            return mod.apply({"params": params}, xx)
        return f

    def bwd_fn(mod):
        def loss(xx, p):
            out = mod.apply({"params": p}, xx)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        def g(xx):
            l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(xx, params)
            s = l + jnp.sum(gx.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(gp):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return s, gx
        return g

    def timed(name, fn, iters=6, returns_scalar=False):
        def loop(n):
            @jax.jit
            def run(xi):
                acc = jnp.float32(0.0)
                xx = xi
                for _ in range(n):
                    if returns_scalar:
                        s, gx = fn(xx)
                        xx = xx * (1.0 + 1e-12 * s).astype(xx.dtype)
                    else:
                        out = fn(xx)
                        s = jnp.sum(out.astype(jnp.float32))
                        xx = xx * (1.0 + 1e-12 * s).astype(xx.dtype)
                    acc = acc + s
                return acc
            return run
        r1, rk = loop(1), loop(1 + iters)
        t0 = time.perf_counter()
        float(r1(x))
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rk(x))
        c2 = time.perf_counter() - t0
        xf = jax.block_until_ready(
            jax.jit(lambda a, s: a * s)(x, jnp.bfloat16(1.0003)))
        t0 = time.perf_counter()
        float(r1(xf))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rk(xf))
        dk = time.perf_counter() - t0
        ms = (dk - d1) / iters * 1e3
        print(f"{name:16s} {ms:8.2f} ms/iter   "
              f"(compiles {c1:.0f}s/{c2:.0f}s, dispatch {d1*1e3:.0f}ms)",
              flush=True)
        return ms

    def timed_safe(name, *a, **kw):
        sel = sys.argv[1:]
        if sel and not any(s in name for s in sel):
            return None
        try:
            return timed(name, *a, **kw)
        except Exception as e:
            print(f"{name:16s} FAILED: {str(e)[:300]}", flush=True)
            return None

    print(f"shape M={M} D={D} inner=2048 bf16 compute, iters=6", flush=True)
    timed_safe("xla_fwd", fwd_fn(xla_mod))
    timed_safe("pallas_fwd", fwd_fn(pallas_mod))
    timed_safe("xla_bwd", bwd_fn(xla_mod), returns_scalar=True)
    timed_safe("pallas_bwd", bwd_fn(pallas_mod), returns_scalar=True)


if __name__ == "__main__":
    main()

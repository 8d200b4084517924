"""Block-size sweep for the W8A8 static-max attention kernel on the TPU.

Round-1 left the int8 serving kernel at the bf16 kernel's block plan
(1152×1152).  int8 operands are half the bytes, so VMEM fits blocks twice
as large — fewer grid steps, less scheduling overhead, which is exactly
what BENCH_NOTES says the static kernel is bound by.  This measures the
production shape with the relay-robust loop-differencing protocol.

Usage: PYTHONPATH=/root/repo python scripts/ablate_int8_attn.py [filter...]
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.ops.flash_attention import flash_attention

    assert jax.default_backend() == "tpu"
    B, H, N, D = 4, 8, 13824, 32
    SCALE = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    # cosine-sim regime: unit-norm rows × O(1) scales (what the bound
    # assumes; random gaussians would violate the static-max contract)
    def unit(x):
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)

    q = unit(mk((B, H, N, D)))
    k = unit(mk((B, H, N, D)))
    v = mk((B, H, N, D))
    nk = unit(mk((B, H, 2, D)))
    nv = mk((B, H, 2, D))
    bound = jnp.float32(1.0 * SCALE)

    def timed(name, fn, iters=8):
        def loop(n):
            @jax.jit
            def run(qi):
                acc = jnp.float32(0.0)
                qq = qi
                for _ in range(n):
                    out = fn(qq)
                    s = jnp.sum(out.astype(jnp.float32))
                    qq = qq * (1.0 + 1e-9 * s).astype(qq.dtype)
                    acc = acc + s
                return acc
            return run
        r1, rk = loop(1), loop(1 + iters)
        t0 = time.perf_counter()
        float(r1(q))
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rk(q))
        c2 = time.perf_counter() - t0
        qf = jax.block_until_ready(
            jax.jit(lambda x, s: x * s)(q, jnp.bfloat16(1.0003)))
        t0 = time.perf_counter()
        float(r1(qf))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rk(qf))
        dk = time.perf_counter() - t0
        ms = (dk - d1) / iters * 1e3
        print(f"{name:28s} {ms:8.2f} ms/iter   "
              f"(compiles {c1:.0f}s/{c2:.0f}s, dispatch {d1*1e3:.0f}ms)",
              flush=True)
        return ms

    def timed_safe(name, fn, iters=8):
        import sys
        sel = sys.argv[1:]
        if sel and not any(s in name for s in sel):
            return None
        try:
            return timed(name, fn, iters)
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e)[:200]}", flush=True)
            return None

    def int8(qi, bq, bk):
        return flash_attention(
            qi, k, v, scale=SCALE, null_k=nk, null_v=nv,
            null_strategy="init", logit_bound=bound, quantized=True,
            block_q=bq, block_k=bk,
        )

    def bf16_static(qi, bq, bk):
        return flash_attention(
            qi, k, v, scale=SCALE, null_k=nk, null_v=nv,
            null_strategy="init", logit_bound=bound,
            block_q=bq, block_k=bk,
        )

    print(f"shape b={B} h={H} n={N} d={D}, differencing iters=8", flush=True)
    timed_safe("bf16_static_1152x1152", lambda qi: bf16_static(qi, 1152, 1152))
    timed_safe("int8_1152x1152(cur)", lambda qi: int8(qi, 1152, 1152))
    timed_safe("int8_2304x1152", lambda qi: int8(qi, 2304, 1152))
    timed_safe("int8_1152x2304", lambda qi: int8(qi, 1152, 2304))
    timed_safe("int8_2304x2304", lambda qi: int8(qi, 2304, 2304))
    timed_safe("int8_3456x1152", lambda qi: int8(qi, 3456, 1152))
    timed_safe("int8_1152x3456", lambda qi: int8(qi, 1152, 3456))
    timed_safe("int8_3456x3456", lambda qi: int8(qi, 3456, 3456))
    timed_safe("int8_4608x2304", lambda qi: int8(qi, 4608, 2304))
    timed_safe("bf16_static_2304x1152", lambda qi: bf16_static(qi, 2304, 1152))
    timed_safe("bf16_static_2304x2304", lambda qi: bf16_static(qi, 2304, 2304))


if __name__ == "__main__":
    main()

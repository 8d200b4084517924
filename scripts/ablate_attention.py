"""Ablate the flash-attention kernel at production shape on the real TPU.

Isolates where the 53 ms forward goes (BENCH_NOTES.md): measured with the
relay-robust loop-differencing protocol (lengths 1 vs 1+K inside one jitted
fori_loop with a serial dependency, difference cancels dispatch overhead).

Variants:
  base_1024x1024 : production kernel (ops/flash_attention.py)
  base_2048x1024 / base_2048x2048 / base_1024x2048 : block-size sweep
  mxu_floor      : two matmuls only, softmax deleted -> MXU+DMA floor
  no_exp         : online max/sum kept, exp replaced by identity -> exp cost

Usage: PYTHONPATH=/root/repo python scripts/ablate_attention.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vit_exp_tpu.ops.flash_attention import flash_attention

    assert jax.default_backend() == "tpu"
    B, H, N, D = 4, 8, 13824, 32
    SCALE = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    nk = jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.bfloat16)

    # ---- ablation kernels (no null kv, no tail mask: floor measurements) --
    def _ab_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                   *, mode):
        ik = pl.program_id(2)
        n_k = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        logits = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE
        if mode == "mxu_floor":
            p = logits
        else:  # no_exp: keep reductions + correction, drop the exp
            m_prev = m_ref[:, :1]
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = logits - m_new  # identity instead of exp
            l_new = (m_prev - m_new) * l_ref[:, :1] + jnp.sum(
                p, axis=-1, keepdims=True)
            acc_ref[...] *= (m_prev - m_new)
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        acc_ref[...] += jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(ik == n_k - 1)
        def _fin():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def ablation(qi, ki, vi, mode, bq=1024, bk=1024):
        bh = B * H
        q3 = qi.reshape(bh, N, D)
        pad = ((0, 0), (0, 14336 - N), (0, 0))
        q3 = jnp.pad(q3, pad)
        k3 = jnp.pad(ki.reshape(bh, N, D), pad)
        v3 = jnp.pad(vi.reshape(bh, N, D), pad)
        npad = 14336
        out = pl.pallas_call(
            functools.partial(_ab_kernel, mode=mode),
            grid=(bh, npad // bq, npad // bk),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, npad, D), qi.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q3, k3, v3)
        return out[:, :N].reshape(B, H, N, D)

    def timed(name, fn, iters=8):
        """fn: (q) -> out with same shape as q; loop-differenced.  The chain
        is UNROLLED (python loop at trace time): a pallas_call directly in a
        fori_loop body trips a 16 MB scoped-vmem accounting limit that the
        same kernel does not hit when inlined straight-line."""
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
        print(f"{name:24s} {ms:8.2f} ms/iter   "
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
            print(f"{name:24s} FAILED: {str(e)[:200]}", flush=True)
            return None

    print(f"shape b={B} h={H} n={N} d={D} bf16, differencing iters=8",
          flush=True)
    timed_safe("base_1024x1024",
          lambda qi: flash_attention(qi, k, v, scale=SCALE, null_k=nk,
                                     null_v=nv))
    timed_safe("base_2048x1024",
          lambda qi: flash_attention(qi, k, v, scale=SCALE, null_k=nk,
                                     null_v=nv, block_q=2048))
    timed_safe("base_2048x2048",
          lambda qi: flash_attention(qi, k, v, scale=SCALE, null_k=nk,
                                     null_v=nv, block_q=2048, block_k=2048))
    timed_safe("base_1024x2048",
          lambda qi: flash_attention(qi, k, v, scale=SCALE, null_k=nk,
                                     null_v=nv, block_k=2048))
    timed_safe("mxu_floor_1024", lambda qi: ablation(qi, k, v, "mxu_floor"))
    timed_safe("no_exp_1024", lambda qi: ablation(qi, k, v, "no_exp"))
    timed_safe("mxu_floor_2048x1024",
          lambda qi: ablation(qi, k, v, "mxu_floor", bq=2048))
    # static-max inference kernel (normalizer on the MXU via ones column).
    # qn/kn unit rows make bound=SCALE sound.
    qn = q / jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                             keepdims=True).astype(q.dtype)
    kn = k / jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                             keepdims=True).astype(k.dtype)
    nkn = nk / jnp.linalg.norm(nk.astype(jnp.float32), axis=-1,
                               keepdims=True).astype(nk.dtype)
    BOUND = jnp.float32(SCALE)
    timed_safe("static_1024(concat)",
          lambda qi: flash_attention(qi, kn, v, scale=SCALE, null_k=nkn,
                                     null_v=nv, logit_bound=BOUND))
    timed_safe("static_2048x1024",
          lambda qi: flash_attention(qi, kn, v, scale=SCALE, null_k=nkn,
                                     null_v=nv, logit_bound=BOUND, block_q=2048))
    timed_safe("static_init_1152",
          lambda qi: flash_attention(qi, kn, v, scale=SCALE, null_k=nkn,
                                     null_v=nv, logit_bound=BOUND,
                                     null_strategy="init",
                                     block_q=1152, block_k=1152))
    timed_safe("static_init_1024",
          lambda qi: flash_attention(qi, kn, v, scale=SCALE, null_k=nkn,
                                     null_v=nv, logit_bound=BOUND,
                                     null_strategy="init"))


if __name__ == "__main__":
    main()

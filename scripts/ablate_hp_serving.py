"""Head-major vs transpose-layout int8 serving attention layer on the TPU.

Measures the FULL per-layer serving attention chain at the production
classify shape (b=4, n=13824, dim=768, 8 heads × d=32):

  transpose path:  fused_ln_qkv_int8 → XLA split/head transposes →
                   int8 static-max attention → XLA head transpose back →
                   int8_proj
  heads-packed:    fused_ln_qkv3_int8 → cosine_attention_packed (hp
                   kernel, in-kernel lane-slice head separation) →
                   int8_proj

The device trace attributed ~2.2 GB of HBM copy traffic per batch-4
classify dispatch (~11 ms) to the XLA relayouts the hp path eliminates.
Relay-robust protocol: loop differencing with a traced perturbation and
a host read (see .claude/skills/verify/SKILL.md).

Usage: PYTHONPATH=/root/repo python scripts/ablate_hp_serving.py [filter...]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.ops.attention import (
        cosine_attention,
        cosine_attention_packed,
    )
    from vit_exp_tpu.ops.fused_proj import (
        fused_ln_qkv3_int8,
        fused_ln_qkv_int8,
        int8_proj,
    )

    assert jax.default_backend() == "tpu"
    B, N, DIM, H, DH = 4, 13824, 768, 8, 32
    INNER = H * DH
    rng = np.random.default_rng(0)

    def mk(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    x = jnp.asarray(rng.standard_normal((B, N, DIM)), jnp.bfloat16)
    gamma = mk(DIM, scale=0.1) + 1.0
    wq = mk(DIM, INNER, scale=DIM ** -0.5)
    wkv = mk(DIM, 2 * INNER, scale=DIM ** -0.5)
    w_out = mk(INNER, DIM, scale=INNER ** -0.5)
    null_k = mk(H, 2, DH)
    null_v = mk(H, 2, DH)
    q_scale = mk(DH) ** 2 + 0.5
    k_scale = mk(DH) ** 2 + 0.5

    def transpose_path(xi):
        q, kv = fused_ln_qkv_int8(xi, gamma, wq, wkv)
        k, v = jnp.split(kv, 2, axis=-1)

        def hf(t):
            return t.reshape(B, N, H, DH).transpose(0, 2, 1, 3)

        out = cosine_attention(
            hf(q), hf(k), hf(v), null_k=null_k, null_v=null_v,
            q_scale=q_scale, k_scale=k_scale,
            impl="pallas", static_max=True, quantized=True,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, INNER)
        return int8_proj(out.astype(jnp.bfloat16), w_out)

    def hp_path(xi):
        q, k, v = fused_ln_qkv3_int8(xi, gamma, wq, wkv)
        out = cosine_attention_packed(
            q, k, v, H, null_k=null_k, null_v=null_v,
            q_scale=q_scale, k_scale=k_scale, quantized=True,
        )
        return int8_proj(out.astype(jnp.bfloat16), w_out)

    def hp_kvoff_path(xi):
        # production wiring: 2-out producer, k = lazy kv slice (fuses
        # into the quantize prologue), v read in place via lane-group
        # offset — the kv split never hits HBM
        q, kv = fused_ln_qkv_int8(xi, gamma, wq, wkv)
        out = cosine_attention_packed(
            q, kv[..., :INNER], kv, H, null_k=null_k, null_v=null_v,
            q_scale=q_scale, k_scale=k_scale, quantized=True,
            v_group_offset=INNER // 128,
        )
        return int8_proj(out.astype(jnp.bfloat16), w_out)

    def hp_qkv_only(xi):
        q, k, v = fused_ln_qkv3_int8(xi, gamma, wq, wkv)
        return q + 0.0, k + 0.0, v + 0.0

    def t_qkv_only(xi):
        q, kv = fused_ln_qkv_int8(xi, gamma, wq, wkv)
        return q + 0.0, kv + 0.0

    def timed(name, fn, iters=8):
        def loop(n):
            @jax.jit
            def run(xi):
                acc = jnp.float32(0.0)
                xx = xi
                for _ in range(n):
                    out = fn(xx)
                    if isinstance(out, tuple):
                        s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
                    else:
                        s = jnp.sum(out.astype(jnp.float32))
                    xx = xx * (1.0 + 1e-9 * s).astype(xx.dtype)
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
            jax.jit(lambda t, s: t * s)(x, jnp.bfloat16(1.0003)))
        t0 = time.perf_counter()
        float(r1(xf))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rk(xf))
        dk = time.perf_counter() - t0
        ms = (dk - d1) / iters * 1e3
        print(f"{name:28s} {ms:8.2f} ms/iter   "
              f"(compiles {c1:.0f}s/{c2:.0f}s, dispatch {d1*1e3:.0f}ms)",
              flush=True)
        return ms

    def timed_safe(name, fn, iters=8):
        sel = sys.argv[1:]
        if sel and not any(s in name for s in sel):
            return None
        try:
            return timed(name, fn, iters)
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e)[:300]}", flush=True)
            return None

    print(f"full serving attn layer, b={B} n={N} dim={DIM} h={H} d={DH}",
          flush=True)
    timed_safe("qkv_2out(cur)", t_qkv_only)
    timed_safe("qkv_3out", hp_qkv_only)
    timed_safe("layer_transpose(cur)", transpose_path)
    timed_safe("layer_hp", hp_path)
    timed_safe("layer_hp_kvoff(prod)", hp_kvoff_path)


if __name__ == "__main__":
    main()

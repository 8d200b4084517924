"""Minimal repro of the axon-relay host-memory leak (BENCH_NOTES.md
"Axon relay HOST-MEMORY LEAK", round 4).

Every host→device transfer through the axon PJRT plugin retains ~1 array
size of host RSS that `del` + GC never free — found when planted run 5
(221 MB upload/step) was OOM-killed at step ~590 with anon-RSS 130.8 GB
≈ 590 × 221 MB.  The retention is inside the native plugin/relay client
(the Python side is registration-only), so the repo can only mitigate:
RSS watchdog in CTClipTrainer (utils/memguard.py, exit 75 + resume) and
fp16-on-the-wire planted volumes.

Run on a host with the axon TPU tunnel up:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/repro_axon_leak.py

Healthy PJRT: RSS roughly flat after iteration 1.  Leaky relay: RSS grows
by ~+{array size} per iteration, matching the printed deltas.
"""

import numpy as np


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS in /proc/self/status")


def main(iters: int = 10, mb: int = 193):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x))
    n = mb * 1024 * 1024 // 4
    base = None
    print(f"platform={jax.default_backend()}  array={mb} MB  iters={iters}")
    for i in range(iters):
        v = np.random.rand(n).astype(np.float32)
        a = jax.device_put(v)
        s = float(f(a))  # host read forces the transfer + execution
        del a, v
        r = rss_kb()
        if base is None:
            base = r
            print(f"iter {i}: RSS {r / 1024:.0f} MB (baseline), sum={s:.3e}")
        else:
            print(f"iter {i}: RSS {r / 1024:.0f} MB "
                  f"(+{(r - base) / 1024 / max(i, 1):.0f} MB/iter avg)")
    leak_per_iter = (rss_kb() - base) / 1024 / max(iters - 1, 1)
    print(f"LEAK: {leak_per_iter:.0f} MB/iteration for {mb} MB transfers "
          f"({'~1:1 — relay leak reproduced' if leak_per_iter > 0.5 * mb else 'not reproduced (healthy client)'})")


if __name__ == "__main__":
    main()

"""Serving load test: concurrent HTTP clients vs the micro-batcher.

Starts cli/serve.py's server in-process (production arch from
configs/ct_clip_vit_from_scratch.yaml unless --config, random weights —
throughput is weight-independent) and hammers /classify with N client
threads for a fixed number of requests, reporting end-to-end volumes/sec
and the dispatcher's batching stats.  The interesting comparison:

    python scripts/bench_serve.py --clients 1          # batch-1 latency path
    python scripts/bench_serve.py --clients 8          # micro-batched
    python scripts/bench_serve.py --clients 8 --max_batch 1   # old behavior

On CPU this exercises plumbing only; run on the TPU for real numbers
(expect ~21 vol/s at --max_batch 1 vs ~25 at 4, per BENCH_NOTES.md's
batch sweep — the server adds JSON + HTTP on top).

Volumes ship as base64 .npy (the compact encoding clients should use);
--payload list measures the worst-case JSON nested-list path instead.
"""

import argparse
import base64
import io
import json
import threading
import time
import urllib.request


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/ct_clip_vit_from_scratch.yaml")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=48,
                   help="total requests across all clients")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--batch_window_ms", type=float, default=2.0)
    p.add_argument("--payload", choices=["npy", "list"], default="npy")
    p.add_argument("--embed_fraction", type=float, default=0.0,
                   help="fraction of requests routed to /embed instead of "
                   "/classify (interleaved by request index) — exercises "
                   "the dispatcher-lock interplay between the "
                   "micro-batcher and the un-batched embed path")
    p.add_argument("--assert_p95_ms", type=float, default=None,
                   help="exit nonzero if the overall p95 latency exceeds "
                   "this bound (load-test gate)")
    p.add_argument("--int8", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (plumbing smoke; the "
                   "sitecustomize-registered TPU plugin otherwise wins)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vit_exp_tpu.cli import serve as serve_mod

    # Build the server exactly as the CLI would, but on an ephemeral port
    # and without blocking in serve_forever.
    serve_argv = ["--config", args.config, "--port", "0",
                  "--max_batch", str(args.max_batch),
                  "--batch_window_ms", str(args.batch_window_ms)]
    if not args.int8:
        serve_argv.append("--no-int8")

    # main() runs serve_forever; reuse its wiring by monkey-patching the
    # last step instead of duplicating model/engine construction here.
    started = {}
    real_build = serve_mod.build_server

    def capture(*a, **kw):
        srv = real_build(*a, **kw)
        started["server"] = srv
        started["expect_shape"] = a[2]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        raise _Started

    class _Started(Exception):
        pass

    serve_mod.build_server = capture
    try:
        serve_mod.main(serve_argv)
    except _Started:
        pass
    finally:
        serve_mod.build_server = real_build
    srv = started["server"]
    base_url = f"http://127.0.0.1:{srv.server_address[1]}"
    url = base_url + "/classify"
    d, h, w = started["expect_shape"]

    import math

    f = min(max(args.embed_fraction, 0.0), 1.0)

    def endpoint_for(i):
        # even deterministic interleave: request i goes to /embed iff the
        # cumulative embed quota crosses an integer at i
        if f > 0 and math.floor((i + 1) * f) > math.floor(i * f):
            return "/embed"
        return "/classify"

    # every request ships a DISTINCT volume: the axon relay memoizes
    # identical (executable, args) dispatches (verify SKILL.md), so a
    # shared body would let every repeat batch return without executing
    # and inflate vol/s arbitrarily.  (float16 payloads halve the body
    # bytes; the server casts to float32 on decode.)
    rng = np.random.default_rng(0)
    base = rng.uniform(-1.0, 1.0, (d, h, w)).astype(np.float16)

    def encode(i):
        v = base.copy()
        v.flat[i % v.size] += np.float16(0.25 + (i % 7) * 0.1)
        if args.payload == "npy":
            buf = io.BytesIO()
            np.save(buf, v)
            return json.dumps({"volume":
                               base64.b64encode(buf.getvalue()).decode()
                               }).encode()
        return json.dumps({"volume": v.astype(np.float32).tolist()}).encode()

    # bodies come from a bounded producer queue: pre-encoding ALL of them
    # holds ~n×body bytes at once (~7 GB for 48 production-shape npy
    # requests, far worse for --payload list), while encoding inline in
    # the clients would put encode CPU inside the throughput window and
    # deflate vol/s.  A producer thread keeps ~2×clients distinct bodies
    # ahead (pre-filled before the timer starts), so encode overlaps the
    # in-flight requests and memory stays bounded.

    def post(body, path="/classify"):
        req = urllib.request.Request(
            base_url + path, data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    post(encode(args.requests + 1))  # warm the HTTP path
    if f > 0:
        post(encode(args.requests + 2), "/embed")

    n = args.requests
    lock = threading.Lock()
    lat = []
    lat_by = {"/classify": [], "/embed": []}
    failures = []

    import queue as _queue

    depth = min(n, max(2 * args.clients, 4))
    body_q: "_queue.Queue" = _queue.Queue(maxsize=depth)

    def producer():
        for i in range(n):
            # distinct volume per request, endpoint pinned at encode time
            body_q.put((encode(i), endpoint_for(i)))

    prod = threading.Thread(target=producer, daemon=True)
    prod.start()
    while body_q.qsize() < depth and prod.is_alive():
        time.sleep(0.01)  # pre-fill before the timer starts

    counter = {"taken": 0}

    def client():
        while True:
            with lock:
                if counter["taken"] >= n:
                    return
                counter["taken"] += 1
            body, path = body_q.get()  # a reserved slot always gets a body
            t0 = time.perf_counter()
            try:
                post(body, path)
            except Exception as e:  # noqa: BLE001 — tallied, not fatal
                with lock:
                    failures.append(f"{path}: {e}")
                continue
            dt_req = time.perf_counter() - t0
            with lock:
                lat.append(dt_req)
                lat_by[path].append(dt_req)

    base_stats = dict(srv.batcher.stats)
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0

    stats = {k: srv.batcher.stats[k] - base_stats.get(k, 0)
             for k in ("dispatches", "volumes")}
    if not lat:
        raise SystemExit(f"all {n} requests failed; first: {failures[0]}")
    lat.sort()

    def pct(xs, q):
        return round(xs[min(int(len(xs) * q), len(xs) - 1)] * 1e3, 1)

    p95 = pct(lat, 0.95)
    out = {
        "clients": args.clients, "requests": n, "completed": len(lat),
        "failed": len(failures), "max_batch": args.max_batch,
        "vol_per_s": round(len(lat) / dt, 3),
        "p50_ms": pct(lat, 0.50),
        "p95_ms": p95,
        "dispatches": stats["dispatches"],
        "mean_batch": round(stats["volumes"] / max(stats["dispatches"], 1),
                            2),
    }
    for path, xs in lat_by.items():
        if xs:
            xs.sort()
            key = path.strip("/")
            out[f"{key}_n"] = len(xs)
            out[f"{key}_p50_ms"] = pct(xs, 0.50)
            out[f"{key}_p95_ms"] = pct(xs, 0.95)
    print(json.dumps(out))
    srv.shutdown()
    # load-test gate: a serving run with errors or blown tail latency is a
    # FAILURE, not a statistic
    if failures:
        raise SystemExit(
            f"{len(failures)}/{n} requests failed; first: {failures[0]}")
    if args.assert_p95_ms is not None and p95 > args.assert_p95_ms:
        raise SystemExit(
            f"p95 {p95} ms exceeds the --assert_p95_ms "
            f"{args.assert_p95_ms} ms bound")


if __name__ == "__main__":
    main()

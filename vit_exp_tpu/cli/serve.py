"""Resident-weights zero-shot inference service.

Production-serving counterpart of the batch CLIs: loads a CTCLIP
checkpoint once, keeps weights on-device and prompt embeddings cached
(the FAST-engine trick, zero_shot.py:480-497), and answers HTTP requests
from the warm jitted programs — no per-request compile, load, or
host→device weight transfer.  Concurrent /classify requests are
micro-batched: a dispatcher thread coalesces up to --max_batch volumes
into one device call (batch 4 is the chip's measured throughput optimum;
lone requests keep batch-1 latency — see MicroBatcher).

Endpoints (stdlib http.server; JSON in/out):
  GET  /health            → {"status": "ok", "pathologies": [...]}
  POST /classify          body {"volume": <nested list | base64 npy>,
                                "shape": optional} →
                          {"probs": {pathology: P(present)}, "ms": float}
  POST /classify_path     body {"path": "/abs/volume.npz"} — server-side
                          read (packed stores & npz), avoids shipping
                          ~55 MB volumes through HTTP in trusted setups
  POST /embed             body as /classify → {"latent": [768 floats]}

Usage:
    python -m vit_exp_tpu.cli.serve --config cfg.yaml \
        [--model_path ckpt] [--port 8750]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time


def _decode_volume(payload, expect_shape, data_root=None, channels=1):
    import os

    import numpy as np

    vol = payload.get("volume")
    if isinstance(vol, str):  # base64-encoded .npy bytes
        arr = np.load(io.BytesIO(base64.b64decode(vol)), allow_pickle=False)
    elif vol is not None:
        arr = np.asarray(vol, dtype=np.float32)
    else:
        if data_root is None:
            raise ValueError(
                "path-based loads are disabled; start the server with "
                "--data_root to allow server-side reads")
        path = os.path.realpath(payload["path"])
        root = os.path.realpath(data_root)
        if os.path.commonpath([path, root]) != root:
            raise ValueError(f"path outside the configured data root")
        if path.endswith(".npz"):
            with np.load(path) as d:
                arr = d[list(d.keys())[0]]
        else:
            arr = np.load(path, allow_pickle=False)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 3 and channels == 1:
        arr = arr[None]
    # strict (C, D, H, W): mixed ranks/channels must never reach the
    # micro-batcher, where one bad volume would poison a whole batch
    if arr.ndim != 4 or arr.shape[0] != channels:
        raise ValueError(
            f"volume shape {arr.shape} != expected ({channels}, D, H, W)")
    if expect_shape and tuple(arr.shape[-3:]) != tuple(expect_shape):
        raise ValueError(
            f"volume shape {arr.shape} != expected {expect_shape}")
    return arr


class MicroBatcher:
    """Coalesce concurrent /classify requests into one device dispatch.

    The chip's throughput peaks at batch 4 (BENCH_NOTES.md batch sweep:
    25.35 vol/s at 4 vs ~21 at 1), but HTTP clients send one volume per
    request.  Handler threads enqueue volumes; a single dispatcher thread
    drains up to `max_batch` of them into ONE jitted call.  While a
    dispatch is in flight (~160 ms) new requests pile up in the queue and
    form the next batch — continuous batching, so `window_ms` (the extra
    time the dispatcher waits for companions after a request arrives at an
    idle server) can stay near zero and lone requests keep batch-1 latency.

    Only two program shapes ever run — batch 1 and batch `max_batch`
    (2..max-1 pad by repeating the last volume) — so remote-compile cost
    stays at two programs, both warmed at startup.

    `pad_all=True` pads EVERY batch (including singletons) to `max_batch`
    — required when the engine shards volumes over a device mesh, whose
    leading dim must stay divisible by the shard count; then only the one
    max-batch program exists.
    """

    def __init__(self, engine, max_batch: int = 4, window_ms: float = 2.0,
                 pad_all: bool = False):
        self.engine = engine
        self.max_batch = max(1, int(max_batch))
        self.pad_all = pad_all
        self.window_s = window_ms / 1e3
        self.stats = {"dispatches": 0, "volumes": 0, "max_batch_seen": 0}
        # serializes device dispatches; /embed shares it via the handler
        self.lock = threading.Lock()
        self._closed = False
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def classify(self, volume):
        """(C, D, H, W) volume → (n_pathologies,) probs; blocks until the
        dispatcher has run the batch containing this request."""
        if self._closed:
            raise RuntimeError("server is shutting down")
        done = threading.Event()
        slot = {}
        self._q.put((volume, slot, done))
        done.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["probs"]

    def close(self):
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=5)
        self._drain_rejected()  # requests that raced the closed check

    def _drain_rejected(self):
        """Fail any still-queued requests so their waiters don't hang —
        classify() calls that passed the closed check before close() set
        it may enqueue after the dispatcher exited."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is None:
                continue
            _, slot, done = item
            slot["err"] = RuntimeError("server is shutting down")
            done.set()

    def _collect(self):
        first = self._q.get()
        if first is None:
            return None
        items = [first]
        deadline = time.perf_counter() + self.window_s
        while len(items) < self.max_batch:
            timeout = deadline - time.perf_counter()
            try:
                nxt = self._q.get(timeout=max(timeout, 0.0))
            except queue.Empty:
                break
            if nxt is None:  # propagate shutdown after this batch
                self._q.put(None)
                break
            items.append(nxt)
        return items

    def _run(self):
        import numpy as np

        while True:
            items = self._collect()
            if items is None:
                self._drain_rejected()
                return
            k = len(items)
            try:  # batch assembly inside: a bad volume must never kill
                # the dispatcher thread (waiters would hang forever)
                vols = np.stack([v for v, _, _ in items])
                lo = 2 if not self.pad_all else 1
                if lo <= k < self.max_batch:  # bounded set of program shapes
                    vols = np.concatenate(
                        [vols,
                         np.repeat(vols[-1:], self.max_batch - k, axis=0)])
                with self.lock:
                    probs = self.engine.predict_batch(vols)[:k]
                self.stats["dispatches"] += 1
                self.stats["volumes"] += k
                self.stats["max_batch_seen"] = max(
                    self.stats["max_batch_seen"], k)
                for (_, slot, done), p in zip(items, probs):
                    slot["probs"] = p
                    done.set()
            except Exception as e:  # noqa: BLE001 — surfaced per request
                for _, slot, done in items:
                    slot["err"] = e
                    done.set()


def default_request_cap(expect_shape, channels: int = 1) -> int:
    """Request-body byte cap sized to the worst legitimate encoding.

    A JSON nested-list float32 prints ~20 bytes/element (base64 .npy is
    ~5.5 bytes); 32 bytes/element plus 1 MiB of envelope admits every
    valid payload while rejecting runaway bodies before they are read
    into memory (one unbounded POST could otherwise hold GBs per
    handler thread)."""
    d, h, w = expect_shape
    return channels * d * h * w * 32 + (1 << 20)


def build_server(engine, latent_fn, expect_shape, port: int,
                 host: str = "127.0.0.1", data_root=None,
                 max_batch: int = 4, window_ms: float = 2.0,
                 pad_all: bool = False, channels: int = 1,
                 max_request_bytes: int | None = None):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if max_request_bytes is None:
        max_request_bytes = default_request_cap(expect_shape, channels)
    batcher = MicroBatcher(engine, max_batch=max_batch, window_ms=window_ms,
                           pad_all=pad_all)
    lock = batcher.lock  # /embed dispatches interleave with batches

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok",
                                 "pathologies": engine.pathologies,
                                 "batching": dict(batcher.stats,
                                                  max_batch=batcher.max_batch)})
            else:
                self._send(404, {"error": "unknown endpoint"})

        def do_POST(self):
            import numpy as np

            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self.close_connection = True
                self._send(411, {"error": "valid Content-Length required"})
                return
            if n < 0:
                # a negative length would make the cap comparison pass and
                # rfile.read(-1) read until EOF — the unbounded buffering
                # the cap exists to prevent
                self.close_connection = True
                self._send(400, {"error": "negative Content-Length"})
                return
            if n > max_request_bytes:
                # reject WITHOUT buffering: moderately-oversized bodies are
                # drained in fixed-size chunks (discarded, so memory stays
                # flat) so the client can read the 413 — responding before
                # the body is consumed gives clients EPIPE instead of the
                # error.  Astronomical bodies aren't worth the bandwidth:
                # close immediately.
                self.close_connection = True
                if n <= 8 * max_request_bytes:
                    left = n
                    while left > 0:
                        chunk = self.rfile.read(min(left, 1 << 20))
                        if not chunk:
                            break
                        left -= len(chunk)
                self._send(413, {
                    "error": f"request body {n} bytes exceeds the "
                             f"{max_request_bytes}-byte cap"})
                return
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
                arr = _decode_volume(payload, expect_shape, data_root,
                                     channels)
                t0 = time.perf_counter()
                if self.path in ("/classify", "/classify_path"):
                    probs = batcher.classify(arr)
                    out = {
                        "probs": {p: float(v) for p, v in
                                  zip(engine.pathologies, probs)},
                        "ms": (time.perf_counter() - t0) * 1e3,
                    }
                elif self.path == "/embed":
                    with lock:
                        out = {
                            "latent": [float(x) for x in latent_fn(arr)],
                            "ms": (time.perf_counter() - t0) * 1e3,
                        }
                else:
                    self._send(404, {"error": "unknown endpoint"})
                    return
                self._send(200, out)
            except Exception as e:  # surface errors to the client
                self._send(400, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # exposed for warmup + tests
    return server


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--torch_ckpt", action="store_true")
    parser.add_argument("--port", type=int, default=8750)
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address (default loopback; set 0.0.0.0 "
                        "explicitly for wider exposure)")
    parser.add_argument("--data_root", default=None,
                        help="directory to which /classify_path server-side "
                        "reads are restricted (omitted = path loads "
                        "disabled)")
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="int8 serving path (int8-QK attention, W8A8 "
                        "FF + projections; ~15%% faster, probability "
                        "parity <=0.02 vs fp32 — tests/test_int8_parity"
                        ".py).  --no-int8 for pure bf16")
    parser.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="compile all programs before accepting "
                        "traffic (--no-warmup to skip)")
    parser.add_argument("--max_batch", type=int, default=4,
                        help="concurrent requests coalesce into one "
                        "dispatch of up to this many volumes (4 = the "
                        "chip's measured throughput optimum; 1 disables "
                        "batching)")
    parser.add_argument("--batch_window_ms", type=float, default=2.0,
                        help="how long the dispatcher waits for companion "
                        "requests when the server is idle; under load the "
                        "in-flight dispatch is the natural window")
    parser.add_argument("--max_request_mb", type=float, default=None,
                        help="reject request bodies larger than this with "
                        "413 before reading them (default: auto-sized to "
                        "the configured volume shape's worst legitimate "
                        "JSON encoding)")
    parser.add_argument("--mesh", default=None, metavar="DATA,FSDP,MODEL",
                        help="serve from a device mesh, e.g. 4,1,1 (-1 = "
                        "all remaining devices): each dispatch shards its "
                        "volumes over the data/fsdp axes.  --max_batch must "
                        "be a multiple of data*fsdp (per-chip optimum 4 => "
                        "max_batch 4*shards); every dispatch pads to "
                        "max_batch.  Default: single device")
    args = parser.parse_args(argv)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    config = load_config(args.config)
    tokenizer = load_tokenizer(args.vocab)
    bert_cfg = bert_config_for(config, tokenizer)
    on_tpu = jax.default_backend() == "tpu"
    ff_impl = "xla" if not on_tpu else (
        "pallas_int8" if args.int8 else "pallas")
    attn_impl = "xla" if not on_tpu else (
        "pallas_static_int8" if args.int8 else "pallas_static")
    model = build_ctclip(
        config, bert_config=bert_cfg,
        attn_impl=attn_impl, ff_impl=ff_impl, fuse_qkv=on_tpu,
    )
    a = config.arch
    expect_shape = (a.temporal_size, a.image_size, a.image_size)
    video0 = jnp.zeros((1, a.channels) + expect_shape, jnp.float32)
    if args.model_path:
        from vit_exp_tpu.cli.run_zero_shot_cls import load_params

        params = load_params(model, config, args.model_path,
                             torch_ckpt=args.torch_ckpt, bert_cfg=bert_cfg)
    else:
        print("WARNING: serving randomly-initialized weights "
              "(no --model_path)", flush=True)
        params = nn.unbox(
            model.init(jax.random.PRNGKey(0), video0,
                       jnp.zeros((1, 16), jnp.int32),
                       jnp.ones((1, 16), jnp.int32))
        )["params"]

    from vit_exp_tpu.core.mesh import mesh_from_cli

    mesh = mesh_from_cli(config, args.mesh)
    if mesh is not None:
        shards = mesh.shape["data"] * mesh.shape["fsdp"]
        if args.max_batch % shards:
            parser.error(f"--max_batch {args.max_batch} must be a multiple "
                         f"of the mesh's data*fsdp shards ({shards})")
    engine = ZeroShotClassifier(model, params, tokenizer, batch_size=1,
                                mesh=mesh)
    engine.prepare()

    @jax.jit
    def _latent(params, video):
        # params as an ARGUMENT, never a closure: closed-over weights bake
        # into the HLO as literals and blow the relay's compile-request
        # size limit (CLAUDE.md; same contract as the engine programs)
        tokens = model.apply({"params": params}, video,
                             method=CTCLIP.encode_image_tokens)
        return model.apply({"params": params}, tokens,
                           method=CTCLIP.image_latents_from_tokens)

    def latent_fn(arr):
        return np.asarray(_latent(params, jnp.asarray(arr[None])))[0]

    if args.warmup:  # compile exactly the shapes the batcher dispatches
        t0 = time.perf_counter()
        dummy = np.zeros((1, a.channels) + expect_shape, np.float32)
        shapes = ({args.max_batch} if mesh is not None  # pad_all: max only
                  else {1, args.max_batch})
        for b in sorted(shapes):
            engine.predict_batch(np.repeat(dummy, b, axis=0))
        latent_fn(dummy[0])
        print(f"warmup compile {time.perf_counter() - t0:.1f}s", flush=True)

    server = build_server(engine, latent_fn, expect_shape, args.port,
                          host=args.host, data_root=args.data_root,
                          max_batch=args.max_batch,
                          window_ms=args.batch_window_ms,
                          pad_all=mesh is not None, channels=a.channels,
                          max_request_bytes=(
                              None if args.max_request_mb is None
                              else int(args.max_request_mb * 1e6)))
    # RSS guard: on axon-relay hosts every uploaded volume leaks host RSS
    # (BENCH_NOTES "Axon relay HOST-MEMORY LEAK" — ~221 MB/request at
    # production shape ⇒ OOM-kill after ~500 requests).  Exit EX_TEMPFAIL
    # before the OOM killer so the supervisor restart is observable.
    from vit_exp_tpu.utils.memguard import start_rss_guard

    start_rss_guard()
    print(f"serving on {args.host}:{args.port} "
          f"(volume {expect_shape}, {len(engine.pathologies)} pathologies)",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()

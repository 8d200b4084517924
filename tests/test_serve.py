"""Serving CLI: HTTP round-trip over a tiny model (cli/serve.py)."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from tests.test_trainer_e2e import _config
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.factory import build_ctclip
from vit_exp_tpu.core.precision import FP32_POLICY


_server_dirs = {}  # fixture-created dirs the path-based tests reference


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    base = tmp_path_factory.mktemp("serve")

    from vit_exp_tpu.cli.serve import build_server
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP

    config = _config(str(base / "results"))
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video,
                   jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]
    engine = ZeroShotClassifier(
        model, params, tok, pathologies=["nodule", "effusion"],
        max_text_len=12, batch_size=1,
    )
    engine.prepare()

    @jax.jit
    def _latent(v):
        t = model.apply({"params": params}, v,
                        method=CTCLIP.encode_image_tokens)
        return model.apply({"params": params}, t,
                           method=CTCLIP.image_latents_from_tokens)

    def latent_fn(arr):
        return np.asarray(_latent(jnp.asarray(arr[None])))[0]

    import os

    data_root = str(base / "data")
    os.makedirs(data_root, exist_ok=True)
    _server_dirs["data_root"] = data_root
    _server_dirs["base"] = str(base)
    srv = build_server(engine, latent_fn, (8, 8, 8), 0,
                       data_root=data_root)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["pathologies"] == ["nodule", "effusion"]


def test_classify_nested_list(server):
    vol = np.random.default_rng(0).uniform(-1, 1, (1, 8, 8, 8))
    code, body = _post(server, "/classify", {"volume": vol.tolist()})
    assert code == 200
    assert set(body["probs"]) == {"nodule", "effusion"}
    for v in body["probs"].values():
        assert 0.0 <= v <= 1.0


def test_classify_base64_npy(server):
    vol = np.random.default_rng(1).uniform(-1, 1, (8, 8, 8)).astype(
        np.float32)
    buf = io.BytesIO()
    np.save(buf, vol)
    code, body = _post(server, "/classify", {
        "volume": base64.b64encode(buf.getvalue()).decode()})
    assert code == 200 and "probs" in body


def test_embed_and_errors(server):
    vol = np.zeros((1, 8, 8, 8), np.float32)
    code, body = _post(server, "/embed", {"volume": vol.tolist()})
    assert code == 200 and len(body["latent"]) == 16

    # wrong shape → 400 with an error message
    code, body = _post(server, "/classify",
                       {"volume": np.zeros((1, 4, 4, 4)).tolist()})
    assert code == 400 and "shape" in body["error"]

    code, body = _post(server, "/nope", {"volume": vol.tolist()})
    assert code == 404


def test_classify_path_restricted_to_data_root(server):
    import os

    root = _server_dirs["data_root"]
    vol = np.random.default_rng(2).uniform(-1, 1, (8, 8, 8)).astype(
        np.float32)
    np.save(os.path.join(root, "vol.npy"), vol)
    code, body = _post(server, "/classify_path",
                       {"path": os.path.join(root, "vol.npy")})
    assert code == 200 and "probs" in body

    # escape attempts → 400, both plain and via ..
    outside = os.path.join(_server_dirs["base"], "outside.npy")
    np.save(outside, vol)
    for path in (outside, os.path.join(root, "..", "outside.npy")):
        code, body = _post(server, "/classify_path", {"path": path})
        assert code == 400 and "data root" in body["error"]


def test_request_size_cap(server):
    """Bodies above the auto-sized cap are rejected with 413 BEFORE the
    server reads them; a malformed Content-Length gets 411."""
    from vit_exp_tpu.cli.serve import default_request_cap

    cap = default_request_cap((8, 8, 8))
    vol = np.zeros((1, 8, 8, 8), np.float32)
    code, body = _post(server, "/classify",
                       {"volume": vol.tolist(), "pad": "x" * (cap + 1)})
    assert code == 413 and "cap" in body["error"]

    # same payload without the padding still classifies fine
    code, body = _post(server, "/classify", {"volume": vol.tolist()})
    assert code == 200 and "probs" in body

    # non-integer Content-Length → 411 (raw http.client to forge the header)
    import http.client
    import urllib.parse

    host = urllib.parse.urlparse(server).netloc
    conn = http.client.HTTPConnection(host, timeout=10)
    conn.putrequest("POST", "/classify", skip_host=False)
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", "not-a-number")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 411
    conn.close()


def test_mixed_classify_embed_concurrent(server):
    """Interleaved concurrent /classify and /embed traffic (the dispatcher
    lock is shared between the micro-batcher and the un-batched embed
    path) completes error-free with values matching sequential sends."""
    rng = np.random.default_rng(7)
    vols = [rng.uniform(-1, 1, (8, 8, 8)).astype(np.float32)
            for _ in range(8)]
    paths = ["/classify" if i % 2 == 0 else "/embed"
             for i in range(len(vols))]
    sequential = [_post(server, p, {"volume": v.tolist()})[1]
                  for p, v in zip(paths, vols)]

    results = [None] * len(vols)

    def worker(i):
        results[i] = _post(server, paths[i], {"volume": vols[i].tolist()})

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(vols))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for (code, body), want, path in zip(results, sequential, paths):
        assert code == 200
        if path == "/classify":
            for k, v in body["probs"].items():
                np.testing.assert_allclose(v, want["probs"][k], atol=1e-5)
        else:
            np.testing.assert_allclose(body["latent"], want["latent"],
                                       atol=1e-5)


def test_classify_path_disabled_without_root():
    from vit_exp_tpu.cli.serve import _decode_volume

    with pytest.raises(ValueError, match="disabled"):
        _decode_volume({"path": "/tmp/anything.npy"}, None, None)


def test_concurrent_classify_matches_sequential(server):
    """Micro-batched concurrent requests return the same probabilities as
    the same volumes sent one at a time."""
    rng = np.random.default_rng(3)
    vols = [rng.uniform(-1, 1, (8, 8, 8)).astype(np.float32)
            for _ in range(6)]
    sequential = [
        _post(server, "/classify", {"volume": v.tolist()})[1]["probs"]
        for v in vols]

    results = [None] * len(vols)

    def worker(i):
        results[i] = _post(server, "/classify", {"volume": vols[i].tolist()})

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(vols))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for (code, body), want in zip(results, sequential):
        assert code == 200
        for k, v in body["probs"].items():
            np.testing.assert_allclose(v, want[k], atol=1e-5)


def test_micro_batcher_coalesces_pads_and_propagates_errors():
    """Dispatcher behavior isolated from HTTP: the engine HOLDS the first
    dispatch until all 6 concurrent requests are provably enqueued, so the
    remaining requests coalesce into full batches — deterministically <=3
    dispatches (first batch of 1..4, then the already-queued rest in <=2
    more) on any host, however loaded; engine failures reach every waiter."""
    from vit_exp_tpu.cli.serve import MicroBatcher

    enqueued = [0]

    class FakeEngine:
        def __init__(self):
            self.batch_sizes = []
            self.gated = True

        def predict_batch(self, vols):
            if self.gated:  # hold until every request sits in the queue
                self.gated = False
                deadline = time.time() + 10.0
                while enqueued[0] < 6 and time.time() < deadline:
                    time.sleep(0.001)
            self.batch_sizes.append(len(vols))
            return vols[:, 0, 0, 0, :2]  # per-volume marker values

    eng = FakeEngine()
    b = MicroBatcher(eng, max_batch=4, window_ms=30.0)
    orig_put = b._q.put

    def counting_put(item):
        orig_put(item)
        if item is not None:
            enqueued[0] += 1

    b._q.put = counting_put
    vols = [np.full((1, 4, 4, 4), i, np.float32) for i in range(6)]
    out = [None] * 6

    def worker(i):
        out[i] = b.classify(vols[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):  # each request got ITS volume's row despite padding
        np.testing.assert_array_equal(out[i], [i, i])
    assert sum(eng.batch_sizes) >= 6
    # deterministic bound: the gate guarantees requests 2..6 were queued
    # before the first dispatch returned, so they drain in at most 2 more
    assert len(eng.batch_sizes) <= 3
    assert all(s in (1, 4) for s in eng.batch_sizes)  # only 2 program shapes

    class Boom:
        def predict_batch(self, vols):
            raise RuntimeError("device on fire")

    b2 = MicroBatcher(Boom(), max_batch=4, window_ms=1.0)
    with pytest.raises(RuntimeError, match="device on fire"):
        b2.classify(vols[0])
    b.close()
    b2.close()


def test_micro_batcher_close_rejects_new_requests():
    """classify() after close() fails fast instead of hanging forever on a
    queue nobody drains (the dispatcher thread has exited)."""
    from vit_exp_tpu.cli.serve import MicroBatcher

    class FakeEngine:
        def predict_batch(self, vols):
            return vols[:, 0, 0, 0, :2]

    b = MicroBatcher(FakeEngine(), max_batch=4, window_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        b.classify(np.zeros((1, 4, 4, 4), np.float32))
    # a request that raced past the closed check is drained with an error
    b2 = MicroBatcher(FakeEngine(), max_batch=4, window_ms=1.0)
    b2._closed = True  # simulate close() winning the race mid-classify
    b2._q.put(None)
    b2._thread.join(timeout=5)
    done = threading.Event()
    slot = {}
    b2._q.put((np.zeros((1, 4, 4, 4), np.float32), slot, done))
    b2._drain_rejected()
    assert done.is_set() and "err" in slot


def test_decode_volume_channels():
    """_decode_volume validates against the config's channel count, not a
    hard-coded 1 (a channels=2 arch must be servable)."""
    from vit_exp_tpu.cli.serve import _decode_volume

    vol2 = np.zeros((2, 4, 4, 4), np.float32)
    out = _decode_volume({"volume": vol2.tolist()}, (4, 4, 4), channels=2)
    assert out.shape == (2, 4, 4, 4)
    with pytest.raises(ValueError, match="expected \\(2, D, H, W\\)"):
        _decode_volume({"volume": np.zeros((4, 4, 4)).tolist()}, (4, 4, 4),
                       channels=2)
    with pytest.raises(ValueError, match="expected \\(1, D, H, W\\)"):
        _decode_volume({"volume": vol2.tolist()}, (4, 4, 4), channels=1)


def test_micro_batcher_pad_all_single_request():
    """pad_all=True (mesh serving): even a lone request dispatches at the
    full max_batch shape, keeping the leading dim divisible by the mesh's
    shard count."""
    from vit_exp_tpu.cli.serve import MicroBatcher

    class FakeEngine:
        batch_sizes = []

        def predict_batch(self, vols):
            self.batch_sizes.append(len(vols))
            return vols[:, 0, 0, 0, :2]

    eng = FakeEngine()
    b = MicroBatcher(eng, max_batch=4, window_ms=1.0, pad_all=True)
    out = b.classify(np.full((1, 4, 4, 4), 7, np.float32))
    np.testing.assert_array_equal(out, [7, 7])
    assert eng.batch_sizes == [4]
    b.close()


def test_zero_shot_cls_cli_mesh(tmp_path):
    """--mesh on the classification CLI: synthetic eval sharded over the
    8-device CPU mesh writes the same artifact set as single-device."""
    import yaml

    from vit_exp_tpu.cli.run_zero_shot_cls import main as cls_main

    cfg = {
        "results_folder": str(tmp_path / "run"),
        "trainer": {"lr": 1e-4},
        "arch": {"dim": 24, "image_size": 8, "patch_size": 4,
                 "temporal_size": 8, "temporal_patch_size": 4,
                 "transformer_blocks": 1, "dim_head": 4, "heads": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "zs"
    cls_main(["--config", str(cfg_path), "--results_folder", str(out),
              "--synthetic", "6", "--batch_size", "1", "--mesh", "4,2,1",
              "--no-int8"])
    run_dir = out / "random_init"
    assert (run_dir / "aurocs.json").exists()
    assert (run_dir / "predicted.npz").exists()


def test_zero_shot_cls_cli_planted(tmp_path):
    """--planted on the classification CLI: the held-out planted eval set
    (data/planted.py, seed 1) is scored on the 4 planted attributes with
    64-token prompts — the checkpoint-sweep entry point for planted runs
    (BENCH_NOTES mixed-run curve)."""
    import json

    import yaml

    from vit_exp_tpu.cli.run_zero_shot_cls import main as cls_main
    from vit_exp_tpu.data.planted import PLANTED_ATTRS

    cfg = {
        "results_folder": str(tmp_path / "run"),
        "trainer": {"lr": 1e-4},
        "arch": {"dim": 24, "image_size": 20, "patch_size": 10,
                 "temporal_size": 20, "temporal_patch_size": 10,
                 "transformer_blocks": 1, "dim_head": 4, "heads": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "zs"
    cls_main(["--config", str(cfg_path), "--results_folder", str(out),
              "--planted", "6", "--batch_size", "2", "--no-int8"])
    run_dir = out / "random_init"
    assert (run_dir / "aurocs.json").exists()
    scored = json.loads((run_dir / "aurocs.json").read_text())
    # scored on the planted attributes, not the 18 CT-RATE pathologies
    for attr in PLANTED_ATTRS:
        assert f"{attr}_auc" in scored
    assert "Cardiomegaly_auc" not in scored

"""Serving CLI: HTTP round-trip over a tiny model (cli/serve.py)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_trainer_e2e import _config
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.factory import build_ctclip
from vit_exp_tpu.core.precision import FP32_POLICY


@pytest.fixture(scope="module")
def server():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.cli.serve import build_server
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP

    config = _config("/tmp/serve_test_results")
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

    os.makedirs("/tmp/serve_test_data", exist_ok=True)
    srv = build_server(engine, latent_fn, (8, 8, 8), 0,
                       data_root="/tmp/serve_test_data")
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
    vol = np.random.default_rng(2).uniform(-1, 1, (8, 8, 8)).astype(
        np.float32)
    np.save("/tmp/serve_test_data/vol.npy", vol)
    code, body = _post(server, "/classify_path",
                       {"path": "/tmp/serve_test_data/vol.npy"})
    assert code == 200 and "probs" in body

    # escape attempts → 400, both plain and via ..
    np.save("/tmp/serve_outside.npy", vol)
    for path in ("/tmp/serve_outside.npy",
                 "/tmp/serve_test_data/../serve_outside.npy"):
        code, body = _post(server, "/classify_path", {"path": path})
        assert code == 400 and "data root" in body["error"]


def test_classify_path_disabled_without_root():
    from vit_exp_tpu.cli.serve import _decode_volume

    with pytest.raises(ValueError, match="disabled"):
        _decode_volume({"path": "/tmp/anything.npy"}, None, None)

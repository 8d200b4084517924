"""Latents dump + cross-modal retrieval (eval/latents.py)."""

import os

import numpy as np
import pytest

from tests.test_trainer_e2e import _config
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.data.synthetic import SyntheticInferenceDataset
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.factory import build_ctclip


@pytest.fixture(scope="module")
def engine_and_ds(tmp_path_factory):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP

    config = _config(str(tmp_path_factory.mktemp("latents")))
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video,
                   jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]
    engine = ZeroShotClassifier(model, params, tok,
                                pathologies=["nodule", "edema"],
                                max_text_len=12, batch_size=2)
    ds = SyntheticInferenceDataset(n=6, arch=config.arch, n_labels=2)
    return engine, ds


def test_dump_latents_and_retrieval(engine_and_ds, tmp_path):
    from vit_exp_tpu.eval.latents import (dump_latents, report_to_volume,
                                          volume_to_report, volume_to_volume)

    engine, ds = engine_and_ds
    out = dump_latents(engine, ds, str(tmp_path / "latents"))
    assert out["image_latents"].shape == (6, 16)
    assert out["text_latents"].shape == (6, 16)
    assert os.path.exists(tmp_path / "latents" / "latents.npz")
    assert len(out["accessions"]) == 6

    labels = np.random.default_rng(0).integers(0, 2, (6, 3))
    v2v = volume_to_volume(out["image_latents"], k=3, labels=labels)
    assert v2v["indices"].shape == (6, 3)
    # self-match excluded
    for i in range(6):
        assert i not in v2v["indices"][i]
    assert np.all(v2v["label_overlap"] >= 0)
    assert np.all(v2v["label_overlap"] <= 1)
    # similarities are descending cosines in [-1, 1]
    assert np.all(np.diff(v2v["similarities"], axis=-1) <= 1e-6)

    r2v = report_to_volume(out["text_latents"], out["image_latents"], k=6)
    assert r2v["recall_at_k"] == 1.0  # k == corpus size
    v2r = volume_to_report(out["image_latents"], out["text_latents"], k=2)
    assert v2r["indices"].shape == (6, 2)


def test_dump_encodings(engine_and_ds, tmp_path):
    from vit_exp_tpu.eval.latents import dump_encodings

    engine, ds = engine_and_ds
    dump_encodings(engine, ds, str(tmp_path / "enc"), limit=2)
    files = sorted(os.listdir(tmp_path / "enc"))
    assert len(files) == 2
    enc = np.load(tmp_path / "enc" / files[0])["arr_0"]
    assert enc.shape[-1] == 24  # tower dim


def test_retrieval_identity_corpus():
    """Identical text/image latents retrieve themselves at rank 1."""
    from vit_exp_tpu.eval.latents import report_to_volume

    lat = np.random.default_rng(1).standard_normal((10, 16))
    r = report_to_volume(lat, lat, k=1)
    np.testing.assert_array_equal(r["indices"][:, 0], np.arange(10))
    assert r["recall_at_k"] == 1.0


def test_dump_latents_mesh_matches_single_device(engine_and_ds, tmp_path):
    """Mesh-sharded encoding produces the same latents npz."""
    from vit_exp_tpu.core.mesh import MeshConfig, create_mesh
    from vit_exp_tpu.eval.latents import dump_latents
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier

    engine, ds = engine_and_ds
    single = dump_latents(engine, ds, str(tmp_path / "a"))
    sharded_engine = ZeroShotClassifier(
        engine.model, engine.params, engine.tokenizer,
        pathologies=engine.pathologies, max_text_len=engine.max_text_len,
        batch_size=1, mesh=create_mesh(MeshConfig()))
    assert sharded_engine.batch_size == 8
    sharded = dump_latents(sharded_engine, ds, str(tmp_path / "b"))
    np.testing.assert_allclose(sharded["image_latents"],
                               single["image_latents"], atol=1e-5)
    np.testing.assert_allclose(sharded["text_latents"],
                               single["text_latents"], atol=1e-5)
    assert sharded["accessions"] == single["accessions"]

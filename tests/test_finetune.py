"""Fine-tune heads + text classifier smoke/parity tests (tiny configs)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.factory import build_ctclip


def _tiny_clip():
    config = ExperimentConfig.from_dict(
        {
            "arch": {
                "dim": 24, "image_size": 8, "patch_size": 4,
                "temporal_size": 8, "temporal_patch_size": 4,
                "transformer_blocks": 1, "dim_head": 4, "heads": 2,
            },
        }
    )
    model = build_ctclip(
        config, bert_config=BertConfig.tiny(), policy=FP32_POLICY,
        dim_latent=16,
    )
    import flax.linen as nn

    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    ids = jnp.ones((1, 8), jnp.int32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video, ids, method=CTCLIP.init_all)
    )["params"]
    return model, params


def test_lipro_weighted_bce_matches_torch():
    from vit_exp_tpu.finetune.lipro import weighted_bce_with_logits

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 6)).astype(np.float32)
    labels = (rng.random((4, 6)) > 0.5).astype(np.float32)
    w = (rng.random(6) * 3 + 0.5).astype(np.float32)
    ours = float(
        weighted_bce_with_logits(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(w))
    )
    ref = float(
        torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(w))(
            torch.tensor(logits), torch.tensor(labels)
        )
    )
    assert abs(ours - ref) < 1e-6


def test_lipro_trains():
    from vit_exp_tpu.finetune.lipro import LiProTrainer

    model, params = _tiny_clip()
    trainer = LiProTrainer(model, params, num_classes=5, total_steps=10)
    rng = np.random.default_rng(1)
    video = rng.uniform(0, 1, (2, 1, 8, 8, 8)).astype(np.float32)
    labels = (rng.random((2, 5)) > 0.5).astype(np.float32)
    losses = [trainer.fit_batch(video, labels) for _ in range(3)]
    assert all(np.isfinite(losses))
    preds = trainer.predict(video)
    assert preds.shape == (2, 5)
    assert np.all((preds >= 0) & (preds <= 1))


def test_vocabfine_trains():
    from vit_exp_tpu.finetune.vocabfine import VocabFineTrainer

    model, params = _tiny_clip()
    tok = HashTokenizer(vocab_size=128, max_length=12)
    trainer = VocabFineTrainer(
        model, params, tok, pathologies=["nodule", "effusion"],
        total_steps=10, max_text_len=12,
    )
    rng = np.random.default_rng(2)
    video = rng.uniform(0, 1, (1, 1, 8, 8, 8)).astype(np.float32)
    l0 = trainer.fit_batch(video, np.asarray([1.0, 0.0]))
    l1 = trainer.fit_batch(video, np.asarray([1.0, 0.0]))
    assert np.isfinite(l0) and np.isfinite(l1)
    # MSE to [1,0] targets should decrease when overfitting one sample
    for _ in range(8):
        last = trainer.fit_batch(video, np.asarray([1.0, 0.0]))
    assert last < l0


def test_text_classifier_trains_and_evaluates(tmp_path):
    from vit_exp_tpu.text_classifier.classifier import RadBertClassifier
    from vit_exp_tpu.text_classifier.trainer import TextClassifierTrainer

    model = RadBertClassifier(BertConfig.tiny(), n_classes=4)
    trainer = TextClassifierTrainer(model,
                                    results_folder=str(tmp_path / "a"))
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 100, (4, 8))
    mask = np.ones((4, 8), np.int32)
    labels = (rng.random((4, 4)) > 0.5).astype(np.float32)
    loss = trainer.fit_batch(ids, mask, labels)
    assert np.isfinite(loss)
    metrics = trainer.evaluate([(ids, mask, labels)])
    assert set(metrics) >= {"val_loss", "macro_f1", "accuracy"}
    assert not trainer.end_epoch(metrics["val_loss"])
    # best-val checkpointing (model_trainer.py parity): the improving
    # epoch snapshotted + autosaved params; a fresh trainer loads them
    # back bit-exact
    import os

    path = os.path.join(str(tmp_path / "a"), "best_model.msgpack")
    assert os.path.exists(path)
    trainer2 = TextClassifierTrainer(model,
                                     results_folder=str(tmp_path / "b"))
    trainer2.load(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        trainer.params, trainer2.params)


def test_rlop_absolute_min_lr_floor():
    """min_lr floors the EFFECTIVE lr, not the multiplicative scale."""
    from vit_exp_tpu.text_classifier.trainer import ReduceLROnPlateau

    rlop = ReduceLROnPlateau(factor=0.1, patience=0, min_lr=1e-8,
                             base_lr=2e-5)
    rlop.step(1.0)
    for _ in range(20):  # plateau forever
        scale = rlop.step(1.0)
    assert scale * 2e-5 >= 1e-8 * 0.999999


def test_cawr_schedule_shape():
    from vit_exp_tpu.text_classifier.trainer import (
        cosine_annealing_warm_restarts,
    )

    sched = cosine_annealing_warm_restarts(1.0, first_cycle=100, warmup=10)
    vals = [float(sched(s)) for s in [0, 5, 10, 50, 99, 100, 110]]
    assert vals[0] < vals[1] < vals[2]          # warmup rises
    assert vals[2] > vals[3] > vals[4]          # cosine decays
    assert vals[5] < vals[2]                    # restart begins warmup again


def test_sentence_shuffle_augment():
    from vit_exp_tpu.text_classifier.augmentation import (
        shuffle_sentences_augment,
        split_sentences,
    )

    text = "First finding. Second finding. Third finding."
    assert split_sentences(text) == [
        "First finding.", "Second finding.", "Third finding."
    ]
    rng = np.random.default_rng(0)
    out = shuffle_sentences_augment(text, p=1.0, rng=rng)
    assert sorted(split_sentences(out)) == sorted(split_sentences(text))
    assert shuffle_sentences_augment(text, p=0.0) == text
    assert shuffle_sentences_augment("  ", p=1.0) == "  "


def test_radbert_roberta_conversion_parity():
    """Our classifier == HF RobertaModel+pooler+head on converted weights."""
    import pytest

    transformers = pytest.importorskip("transformers")

    torch.manual_seed(0)
    hf_cfg = transformers.RobertaConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=1, hidden_act="gelu",
        pad_token_id=1,
    )
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=True).eval()
    head = torch.nn.Linear(32, 3)

    sd = {f"model.{k}": v for k, v in hf.state_dict().items()}
    sd["classifier.weight"] = head.weight
    sd["classifier.bias"] = head.bias

    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.text_classifier.classifier import (
        RadBertClassifier,
        convert_hf_radbert,
    )

    cfg = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=48,
                     max_position_embeddings=38, type_vocab_size=1)
    params = convert_hf_radbert(sd, cfg, n_classes=3)
    # trailing-padded batch: HF roberta position ids = cumsum(mask)+1
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 99, (2, 9))
    mask = np.ones((2, 9), dtype=np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask))
        ref = head(out.pooler_output).numpy()

    model = RadBertClassifier(cfg, n_classes=3)
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_per_label_report(tmp_path):
    """per_label_report == sklearn's per-label P/R/F1 on the same preds
    (text_classifier/eval.py manual-metrics parity)."""
    from sklearn.metrics import precision_recall_fscore_support

    from vit_exp_tpu.text_classifier.trainer import per_label_report

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, (40, 3))
    y_prob = np.clip(y_true + rng.normal(0, 0.4, (40, 3)), 0, 1)
    out = str(tmp_path / "report.csv")
    rep = per_label_report(y_prob, y_true, ["a", "b", "c"], out_csv=out)
    p, r, f1, s = precision_recall_fscore_support(
        y_true, (y_prob > 0.5).astype(int), zero_division=0)
    for i, name in enumerate(["a", "b", "c"]):
        np.testing.assert_allclose(rep[name]["precision"], p[i], atol=1e-9)
        np.testing.assert_allclose(rep[name]["recall"], r[i], atol=1e-9)
        np.testing.assert_allclose(rep[name]["f1"], f1[i], atol=1e-9)
        assert rep[name]["support"] == s[i]
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "label,precision,recall,f1,support"
    assert len(lines) == 4


_TINY_ARCH = {
    "dim": 24, "image_size": 8, "patch_size": 4,
    "temporal_size": 8, "temporal_patch_size": 4,
    "transformer_blocks": 1, "dim_head": 4, "heads": 2,
}


def test_lipro_save_load_infer_artifacts(tmp_path):
    """Probe persistence + ct_lipro_inference.py evaluate_model parity:
    head save/load round-trips bit-level, infer writes the reference
    artifact set over the pipelined batched loop (odd n → tail pad)."""
    from vit_exp_tpu.data.synthetic import SyntheticInferenceDataset
    from vit_exp_tpu.finetune.lipro import LiProTrainer

    model, params = _tiny_clip()
    trainer = LiProTrainer(model, params, num_classes=5, total_steps=10)
    rng = np.random.default_rng(4)
    video = rng.uniform(0, 1, (2, 1, 8, 8, 8)).astype(np.float32)
    labels = (rng.random((2, 5)) > 0.5).astype(np.float32)
    trainer.fit_batch(video, labels)
    head_path = tmp_path / "head.msgpack"
    trainer.save(str(head_path))

    other = LiProTrainer(model, params, num_classes=5, total_steps=10,
                         seed=9)
    assert not np.allclose(other.predict(video), trainer.predict(video))
    other.load(str(head_path))
    np.testing.assert_allclose(other.predict(video), trainer.predict(video),
                               rtol=1e-6)

    arch = ExperimentConfig.from_dict({"arch": dict(_TINY_ARCH)}).arch
    dataset = SyntheticInferenceDataset(5, arch=arch, n_labels=18)
    out = tmp_path / "artifacts"
    res = other.infer(dataset, results_folder=str(out), batch_size=2)
    pred = np.load(out / "predicted.npz")["arr_0"]
    true = np.load(out / "labels.npz")["arr_0"]
    assert pred.shape == (5, 5) and true.shape == (5, 5)
    assert np.all((pred >= 0) & (pred <= 1))
    assert len((out / "accessions.txt").read_text().splitlines()) == 5
    assert (out / "aurocs.json").exists()
    # engine probs == direct per-volume predict (pad-tail must not leak)
    direct = np.concatenate(
        [other.predict(dataset[i]["image"][None]) for i in range(5)])
    np.testing.assert_allclose(pred, direct, rtol=2e-5, atol=1e-6)
    assert isinstance(res, dict) and res


def test_run_finetune_cli_lipro_train_save_infer(tmp_path):
    """CLI round trip: train → --save_path, then --infer --load_head
    writes the ct_lipro_inference.py artifacts."""
    import yaml

    from vit_exp_tpu.cli.run_finetune import main as ft_main

    cfg = {
        "trainer": {"lr": 1e-4},
        "arch": dict(_TINY_ARCH),
        "text_encoder": {"hidden_size": 36, "num_hidden_layers": 1,
                         "num_attention_heads": 3, "intermediate_size": 64,
                         "max_position_embeddings": 64},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    head = tmp_path / "head.msgpack"
    ft_main(["lipro", "--config", str(cfg_path), "--synthetic", "4",
             "--epochs", "1", "--batch_size", "2",
             "--save_path", str(head)])
    assert head.exists() and head.stat().st_size > 0
    out = tmp_path / "out"
    ft_main(["lipro", "--config", str(cfg_path), "--infer",
             "--load_head", str(head), "--synthetic", "4",
             "--batch_size", "2", "--results_folder", str(out)])
    assert (out / "aurocs.json").exists()
    assert np.load(out / "predicted.npz")["arr_0"].shape == (4, 18)


def test_run_finetune_cli_vocabfine_exports_reference_pt(tmp_path):
    """vocabfine --save_path writes a reference-layout CTClip .pt
    (ct_vocabfine_train.py:134-149 saves the full model state dict; ours
    goes through the strict-load export so reference tooling and
    run_zero_shot_cls --torch_ckpt both consume it)."""
    import yaml

    from vit_exp_tpu.cli.run_finetune import main as ft_main

    cfg = {
        "trainer": {"lr": 1e-4},
        "arch": dict(_TINY_ARCH),
        "text_encoder": {"hidden_size": 36, "num_hidden_layers": 1,
                         "num_attention_heads": 3, "intermediate_size": 64,
                         "max_position_embeddings": 64},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    pt = tmp_path / "CTClip.ft.pt"
    ft_main(["vocabfine", "--config", str(cfg_path), "--synthetic", "1",
             "--epochs", "1", "--max_text_len", "16",
             "--save_path", str(pt)])
    sd = torch.load(str(pt), map_location="cpu", weights_only=True)
    assert sd and all(k.startswith("module.") for k in sd)

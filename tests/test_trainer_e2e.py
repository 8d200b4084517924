"""End-to-end trainer test on synthetic data (formalizes the reference's
debug-30 integration methodology, SURVEY.md §4.3): multi-dataset schedule,
grad accumulation, checkpoint save + resume, metrics jsonl, zero-shot eval
engine — all tiny shapes on the 8-device CPU mesh."""

import json
import os

import numpy as np

import jax

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.core.mesh import MeshConfig
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.data.synthetic import (
    SyntheticCTDataset,
    SyntheticInferenceDataset,
)
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.factory import build_ctclip


def _config(tmp_path):
    return ExperimentConfig.from_dict(
        {
            "random_seed": 7,
            "results_folder": str(tmp_path),
            "trainer": {
                "lr": 1e-3,
                "num_train_steps": 4,
                "max_grad_norm": 1.0,
                "gradient_accumulation_steps": 1,
                "save_model_every": 2,
                "eval_model_every": 0,
                "balance_loss_weight": [1.0, 0.5],
            },
            "arch": {
                "dim": 24, "image_size": 8, "patch_size": 4,
                "temporal_size": 8, "temporal_patch_size": 4,
                "transformer_blocks": 1, "dim_head": 4, "heads": 2,
            },
            "ct_clip_arch": {
                "use_open_seg": True,
                "open_seg_head": {"out_dim": 8, "in_dim": 24},
                "open_text_head": {"out_dim": 8, "in_dim": 36},
                "open_seg_loss_type": "clip_focal_loss",
                "open_seg_loss_down_factor": 2,
            },
            "train_data_list": [
                {"name": "reports", "type": "imagereport", "batch_size": 1},
                {"name": "openseg", "type": "imageopenseg", "batch_size": 1},
            ],
            "DatasetSampler": {"type": "Combined", "acc_steps_list": [1, 1]},
        }
    )


def test_trainer_end_to_end(tmp_path):
    from vit_exp_tpu.train.trainer import CTClipTrainer

    config = _config(tmp_path)
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    datasets = [
        SyntheticCTDataset("imagereport", n=8, arch=config.arch,
                           tokenizer=tok, max_text_len=12),
        SyntheticCTDataset("imageopenseg", n=8, arch=config.arch,
                           tokenizer=tok, n_classes=3, max_text_len=12),
    ]
    trainer = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
    )
    trainer.train(num_steps=4)

    # metrics logged with both dataset losses
    lines = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))
    ]
    assert len(lines) >= 4
    assert any("ds0_cl_loss" in rec for rec in lines)
    assert any("ds1_open_seg_loss" in rec for rec in lines)
    for rec in lines:
        for key in ("ds0_cl_loss", "ds1_open_seg_loss"):
            if key in rec:
                assert np.isfinite(rec[key])

    # checkpoints at steps 2 and 4
    steps = trainer.ckpt.all_steps()
    assert 2 in steps and 4 in steps

    # resume from step 2 picks up the state
    trainer2 = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
        resume_step=2,
    )
    assert trainer2.step == 2
    assert int(trainer2.state.step) == int(
        trainer.ckpt.restore(
            2, jax.eval_shape(lambda: trainer.state)
        ).step
    )


def test_rss_watchdog_saves_and_resumes(tmp_path, monkeypatch):
    """RSS watchdog (axon transfer-leak guard): with a ceiling below the
    process baseline, train() must still make ≥1 step this invocation,
    then save state and return "mem_exit" instead of running to the OOM
    killer; a relaunch with resume_step=-1 continues from the saved step
    and finishes with "completed"."""
    from vit_exp_tpu.train.trainer import CTClipTrainer

    config = _config(tmp_path)
    config.train_data_list = config.train_data_list[:1]
    config.trainer.balance_loss_weight = [1.0]
    from vit_exp_tpu.core.config import DatasetSamplerConfig
    config.dataset_sampler = DatasetSamplerConfig()
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    datasets = [SyntheticCTDataset("imagereport", n=8, arch=config.arch,
                                   tokenizer=tok, max_text_len=12)]
    monkeypatch.setenv("VIT_EXP_RSS_EXIT_GB", "0.001")  # < any baseline
    trainer = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
    )
    status = trainer.train(num_steps=4)
    assert status == "mem_exit"
    assert trainer.step == 1              # exactly one step of progress
    assert 1 in trainer.ckpt.all_steps()  # state saved before exiting

    monkeypatch.delenv("VIT_EXP_RSS_EXIT_GB")
    trainer2 = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
        resume_step=-1,
    )
    assert trainer2.step == 1             # auto-resume found the save
    assert trainer2.train(num_steps=3) == "completed"
    assert trainer2.step == 3


def test_zero_shot_engine_synthetic(tmp_path):
    import flax.linen as nn
    import jax.numpy as jnp

    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP

    config = _config(tmp_path)
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video,
                   jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]

    engine = ZeroShotClassifier(
        model, params, tok, pathologies=["nodule", "effusion", "edema"],
        max_text_len=12, batch_size=2,
    )
    ds = SyntheticInferenceDataset(n=5, arch=config.arch, n_labels=3)
    res = engine.infer(ds, results_folder=str(tmp_path / "zs"))
    assert "mean_auc" in res and "volumes_per_sec" in res
    assert os.path.exists(tmp_path / "zs" / "predicted.npz")
    assert os.path.exists(tmp_path / "zs" / "accessions.txt")
    preds = np.load(tmp_path / "zs" / "predicted.npz")["arr_0"]
    assert preds.shape == (5, 3)
    assert np.all((preds >= 0) & (preds <= 1))


def test_zero_shot_seg_engine(tmp_path):
    import flax.linen as nn
    import jax.numpy as jnp

    from vit_exp_tpu.eval.zero_shot import ZeroShotSegmenter
    from vit_exp_tpu.models.ctclip import CTCLIP

    config = _config(tmp_path)
    config.ct_clip_arch.use_seg = True
    config.ct_clip_arch.seg_head.out_dim = 3
    config.ct_clip_arch.seg_head.in_dim = 24
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video,
                   jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]
    engine = ZeroShotSegmenter(model, params)
    ds = SyntheticCTDataset("imageseg", n=3, arch=config.arch, n_classes=3)
    res = engine.infer(ds, results_folder=str(tmp_path / "seg"))
    assert "mean_dice" in res
    assert os.path.exists(tmp_path / "seg" / "dice_scores.npy")

    # batched engine (batch_size=2, odd dataset → pad-tail) must equal the
    # per-item path exactly (VERDICT item 6)
    batched = ZeroShotSegmenter(model, params, batch_size=2)
    res2 = batched.infer(ds)
    for k, v in res.items():
        np.testing.assert_allclose(res2[k], v, atol=1e-6, err_msg=k)
    per_sample = np.load(tmp_path / "seg" / "dice_scores.npy")
    assert per_sample.shape == (3, 3)

    # mesh-sharded engine drives all 8 devices and matches single-device
    from vit_exp_tpu.core.mesh import MeshConfig, create_mesh

    sharded = ZeroShotSegmenter(model, params, batch_size=1,
                                mesh=create_mesh(MeshConfig()))
    assert sharded.batch_size == 8
    res3 = sharded.infer(ds)
    for k, v in res.items():
        np.testing.assert_allclose(res3[k], v, atol=1e-6, err_msg=k)


def test_zero_shot_engine_sharded(tmp_path):
    """Engine drives the whole 8-device mesh (multi-chip eval path)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from vit_exp_tpu.core.mesh import MeshConfig, create_mesh
    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
    from vit_exp_tpu.models.ctclip import CTCLIP

    config = _config(tmp_path)
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0),
                   jnp.ones((1, 1, 8, 8, 8), jnp.float32),
                   jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]
    mesh = create_mesh(MeshConfig())
    engine = ZeroShotClassifier(
        model, params, tok, pathologies=["nodule", "effusion"],
        max_text_len=12, batch_size=1, mesh=mesh,
    )
    assert engine.batch_size == 8  # per-chip 1 × 8 shards
    ds = SyntheticInferenceDataset(n=10, arch=config.arch, n_labels=2)
    res = engine.infer(ds)
    assert "mean_auc" in res


def test_preemption_checkpoint(tmp_path):
    """SIGTERM-style preemption: the loop saves full state mid-run and
    returns; a fresh trainer resumes from that checkpoint."""
    import signal

    from vit_exp_tpu.train.trainer import CTClipTrainer

    config = _config(tmp_path)
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    datasets = [
        SyntheticCTDataset("imagereport", n=4, arch=config.arch,
                           tokenizer=tok, max_text_len=12),
        SyntheticCTDataset("imageopenseg", n=4, arch=config.arch,
                           tokenizer=tok, n_classes=3, max_text_len=12),
    ]
    trainer = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
    )
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    try:
        trainer.install_preemption_handler()
        # deliver a real signal: handler must only set the flag
        signal.raise_signal(signal.SIGTERM)
        trainer.train(num_steps=100)  # returns immediately via the flag
    finally:
        # restore: the handler closure would otherwise hijack Ctrl-C /
        # SIGTERM for the rest of the suite and pin the TrainState
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)
    assert trainer.step < 100
    assert trainer.step in trainer.ckpt.all_steps()

    trainer2 = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
        resume_step=trainer.step,
    )
    assert trainer2.step == trainer.step


def test_run_train_planted_mixed(tmp_path):
    """The reference's flagship mixed multi-dataset workflow through the
    run_train CLI (VERDICT r4 #5; CTCLIPTrainer.py:232-268,584-652):
    DatasetSampler interleaves planted imagereport + imageseg +
    imageopenseg datasets with balance weights, all three jitted steps
    dispatch, and the zero-shot eval hook fires on the held-out planted
    set (scored over the 4 planted attributes).  Tiny twin of
    configs/planted_mixed.yaml."""
    import yaml

    from vit_exp_tpu.cli.run_train import main

    cfg = {
        "random_seed": 0,
        "results_folder": str(tmp_path / "run"),
        "trainer": {"lr": 1e-3, "num_train_steps": 6,
                    "save_model_every": 0, "eval_model_every": 6,
                    "balance_loss_weight": [1.0, 1.0, 1.0]},
        "arch": {"dim": 24, "image_size": 8, "patch_size": 4,
                 "temporal_size": 8, "temporal_patch_size": 4,
                 "transformer_blocks": 1, "dim_head": 4, "heads": 2},
        "ct_clip_arch": {
            "use_seg": True, "seg_head": {"out_dim": 2},
            "use_open_seg": True,
            "open_seg_loss_type": "weighted_bce_loss",
            "open_seg_loss_down_factor": 2,
        },
        "text_encoder": {"num_hidden_layers": 1, "hidden_size": 16,
                         "num_attention_heads": 2,
                         "intermediate_size": 32},
        "train_data_list": [
            {"name": "cls", "type": "imagereport", "planted": True,
             "n": 64, "batch_size": 2},
            {"name": "seg", "type": "imageseg", "planted": True,
             "n": 64, "batch_size": 2},
            {"name": "openseg", "type": "imageopenseg", "planted": True,
             "n": 64, "batch_size": 2},
        ],
        "valid_test_list": ["zero_shot_cls_planted", "seg_test_planted"],
        "DatasetSampler": {"type": "Combined",
                           "acc_steps_list": [1, 1, 1]},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    main(["--config", str(cfg_path), "--steps", "6"])

    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "run"), "metrics.jsonl"))]
    keys = set().union(*(l.keys() for l in lines))
    # all three data types actually dispatched their jitted step
    assert "ds0_cl_loss" in keys, keys
    assert "ds1_seg_loss" in keys, keys
    assert "ds2_open_seg_loss" in keys, keys
    # the in-training eval hooks fired and logged planted-attribute AUROCs
    assert any(k.startswith("eval/zero_shot_cls_planted/") for k in keys), keys
    assert any(k.startswith("eval/seg_test_planted/") for k in keys), keys
    cls_keys = [k for k in keys
                if k.startswith("eval/zero_shot_cls_planted/")]
    assert any("cardiomegaly" in k for k in cls_keys), cls_keys


def test_run_train_cli_mesh(tmp_path):
    """run_train --mesh wires a (data,fsdp,model) MeshConfig through the
    CLI: yaml `mesh:` section applies, the flag overrides it, and a tiny
    synthetic train actually steps on the 2x2x2 mesh."""
    import yaml

    from vit_exp_tpu.cli.run_train import main, mesh_config_from
    from vit_exp_tpu.core.config import load_config

    cfg = {
        "random_seed": 3,
        "results_folder": str(tmp_path / "run"),
        "trainer": {"lr": 1e-3, "num_train_steps": 2,
                    "save_model_every": 0, "eval_model_every": 0},
        "arch": {"dim": 24, "image_size": 8, "patch_size": 4,
                 "temporal_size": 8, "temporal_patch_size": 4,
                 "transformer_blocks": 1, "dim_head": 4, "heads": 2},
        "train_data_list": [
            {"name": "reports", "type": "imagereport", "batch_size": 1},
        ],
        "mesh": {"data": 4, "fsdp": 2, "model": 1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    config = load_config(str(cfg_path))
    # yaml section honored
    mc = mesh_config_from(config)
    assert (mc.data, mc.fsdp, mc.model) == (4, 2, 1)
    # CLI flag overrides
    mc = mesh_config_from(config, "2,2,2")
    assert (mc.data, mc.fsdp, mc.model) == (2, 2, 2)
    # no section, no flag -> trainer default
    config_plain = load_config(str(cfg_path))
    config_plain.extra.pop("mesh")
    assert mesh_config_from(config_plain) is None

    # the eval/serve CLIs' helper: yaml section alone yields a real Mesh
    # (no --mesh flag needed), nothing configured yields None
    from vit_exp_tpu.core.mesh import mesh_from_cli

    mesh = mesh_from_cli(config)
    assert mesh is not None and dict(mesh.shape) == {
        "data": 4, "fsdp": 2, "model": 1}
    assert mesh_from_cli(config_plain) is None

    main(["--config", str(cfg_path), "--mesh", "2,2,2",
          "--synthetic", "8", "--steps", "2"])
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "run"), "metrics.jsonl"))]
    assert len(lines) >= 2 and np.isfinite(lines[-1]["ds0_cl_loss"])

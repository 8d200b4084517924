"""Config loading: shipped example configs + reference-schema compat."""

import glob

from vit_exp_tpu.core.config import ExperimentConfig, load_config


def test_reference_schema_compat(tmp_path):
    """The reference's v5_1_80g-style schema (SURVEY §2.7) loads unchanged."""
    yaml_text = """
random_seed: 3407
results_folder: /tmp/exp
project_name: ct_clip
exp_name: v5_1
trainer:
  lr: 1.25e-6
  wd: 0
  num_train_steps: 200000
  max_grad_norm: 0.5
  gradient_accumulation_steps: 5
  save_results_every: 1000
  save_model_every: 1000
  eval_model_every: 2000
  vis_train_every: [1000]
  sample_val_every: 1000
  balance_loss_weight: [1.0, 1.0]
train_data_list:
  - name: ctrate
    type: imagereport
    batch_size: 4
    num_workers: 8
  - name: radgenome
    type: imageopenseg
    batch_size: 1
    num_workers: 4
valid_test_list: [ctclip_image_report_zero_shot_cls_test]
sample_test_list: [radgenome_image_open_seg_test_ten_images]
DatasetSampler:
  type: Combined
  acc_steps_list: [4, 1]
arch:
  arch_name: ctvit_3d
  dim: 768
  image_size: 480
  patch_size: 20
  temporal_size: 240
  temporal_patch_size: 10
  transformer_blocks: 8
  dim_head: 32
  heads: 8
  use_flash_attention: true
ct_clip_arch:
  use_seg: false
  use_open_seg: true
  open_seg_loss_type: clip_focal_loss
  open_seg_loss_down_factor: 4
  open_seg_loss_hyper_config:
    gamma: 2
    alpha: 0.25
  open_seg_head:
    n_layers: 2
    in_dim: 768
    mid_dim: 128
    out_dim: 16
  open_text_head:
    n_layers: 2
    in_dim: 768
    mid_dim: 128
    out_dim: 16
  fix_text_encoder: true
"""
    path = tmp_path / "ref.yaml"
    path.write_text(yaml_text)
    cfg = load_config(str(path))
    assert cfg.trainer.lr == 1.25e-6                 # YAML-string coerced
    assert cfg.trainer.gradient_accumulation_steps == 5
    assert cfg.arch.num_tokens == 24 ** 3
    assert cfg.ct_clip_arch.use_open_seg
    assert cfg.ct_clip_arch.fix_text_encoder
    assert cfg.ct_clip_arch.open_seg_loss_down_factor == 4
    assert cfg.ct_clip_arch.open_text_head.in_dim == 768
    assert cfg.dataset_sampler.acc_steps_list == [4, 1]
    assert cfg.valid_test_list == ["ctclip_image_report_zero_shot_cls_test"]


def test_seg_head_prefixed_keys():
    """The reference seg_head block uses head_-prefixed keys
    (ct_clip.py:660-673)."""
    cfg = ExperimentConfig.from_dict(
        {
            "ct_clip_arch": {
                "use_seg": True,
                "seg_head": {
                    "head_n_layers": 3, "head_in_dim": 256,
                    "head_mid_dim": 64, "head_out_dim": 22,
                },
            }
        }
    )
    assert cfg.ct_clip_arch.seg_head.n_layers == 3
    assert cfg.ct_clip_arch.seg_head.out_dim == 22
    assert cfg.ct_clip_arch.seg_head.mid_dim == 64


def test_all_shipped_configs_load():
    """Every YAML in configs/ parses through the schema, including the old
    flat schema (ct_clip_debug_30) and fusion/choose_cls blocks."""
    import glob
    import os

    from vit_exp_tpu.core.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(paths) >= 7
    for p in paths:
        cfg = load_config(p)
        assert cfg.arch.dim > 0
    fusion = load_config(os.path.join(
        root, "ct_clip_vit_open_seg_fusion_single_cls.yaml"))
    assert fusion.ct_clip_arch.fusion_head is not None
    assert fusion.ct_clip_arch.open_seg_loss_hyper_config["choose_cls"] == [5]
    assert fusion.ct_clip_arch.fix_text_encoder
    seg = load_config(os.path.join(root, "ct_clip_vit_seg.yaml"))
    assert seg.ct_clip_arch.use_seg


def test_top_level_api_exports():
    """Reference-style top-level names resolve lazily from the package."""
    import vit_exp_tpu

    for name in ("CTCLIP", "CTViT3D", "CTViT", "MaskGITTransformer",
                 "build_ctclip", "CTClipTrainer", "ZeroShotClassifier",
                 "load_config"):
        assert getattr(vit_exp_tpu, name) is not None
    assert "CTCLIP" in dir(vit_exp_tpu)
    try:
        vit_exp_tpu.not_a_thing
        assert False
    except AttributeError:
        pass

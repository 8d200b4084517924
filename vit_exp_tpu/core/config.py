"""Typed experiment config loaded from the reference YAML schema.

Schema mirrors configs/train_from_scratch/*.yaml in the reference
(SURVEY.md §2.7; e.g. ct_clip_vit_open_seg_hpc_v5_1_80g.yaml): reference
config files load unchanged.  Unknown keys are preserved in `.extra` and the
reference's `dict.get(key, default)` backward-compat convention is kept by
giving every field a default.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import yaml


def _sub(d: Dict[str, Any], key: str) -> Dict[str, Any]:
    v = d.get(key) or {}
    if not isinstance(v, dict):
        raise ValueError(f"config section {key!r} must be a mapping, got {type(v)}")
    return v


@dataclasses.dataclass
class ArchConfig:
    """Vision-tower architecture (reference `arch` block, run_train.py:36-54)."""

    arch_name: str = "ctvit_3d"
    dim: int = 768
    image_size: int = 480
    patch_size: int = 20
    temporal_size: int = 240
    temporal_patch_size: int = 10
    transformer_blocks: int = 8
    dim_head: int = 32
    heads: int = 8
    use_flash_attention: bool = True
    channels: int = 1

    @property
    def grid(self) -> tuple[int, int, int]:
        return (
            self.temporal_size // self.temporal_patch_size,
            self.image_size // self.patch_size,
            self.image_size // self.patch_size,
        )

    @property
    def num_tokens(self) -> int:
        t, h, w = self.grid
        return t * h * w

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ArchConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class HeadConfig:
    """MLP head (reference create_head kwargs, ct_clip.py:736-750)."""

    n_layers: int = 2
    layer_type: str = "mlp"
    in_dim: int = 256
    mid_dim: int = 128
    out_dim: int = 16

    @classmethod
    def from_dict(cls, d: Dict[str, Any], **defaults) -> "HeadConfig":
        base = dataclasses.asdict(cls(**defaults))
        known = set(base)
        base.update({k: v for k, v in d.items() if k in known})
        # the reference sometimes prefixes keys with head_ (seg_head block)
        base.update(
            {k[5:]: v for k, v in d.items() if k.startswith("head_") and k[5:] in known}
        )
        return cls(**base)


@dataclasses.dataclass
class CTClipArchConfig:
    """`ct_clip_arch` block (ct_clip.py:654-714 config reads)."""

    fix_text_encoder: bool = False
    use_seg: bool = False
    seg_head: HeadConfig = dataclasses.field(
        default_factory=lambda: HeadConfig(out_dim=22)
    )
    use_open_seg: bool = False
    open_seg_head: HeadConfig = dataclasses.field(default_factory=HeadConfig)
    open_text_head: HeadConfig = dataclasses.field(
        default_factory=lambda: HeadConfig(in_dim=768)
    )
    open_seg_loss_type: str = "cos_sim_l2"
    open_seg_loss_down_factor: int = 1
    open_seg_loss_hyper_config: Dict[str, Any] = dataclasses.field(default_factory=dict)
    fusion_head: Optional[HeadConfig] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CTClipArchConfig":
        fusion = None
        fusion_block = d.get("fusion_head") or {}
        if fusion_block.get("type") == "mlp":
            fusion = HeadConfig.from_dict(
                _sub(fusion_block, "mlp"), in_dim=16, mid_dim=16, out_dim=1
            )
        return cls(
            fix_text_encoder=d.get("fix_text_encoder", False),
            use_seg=d.get("use_seg", False),
            seg_head=HeadConfig.from_dict(_sub(d, "seg_head"), out_dim=22),
            use_open_seg=d.get("use_open_seg", False),
            open_seg_head=HeadConfig.from_dict(_sub(d, "open_seg_head")),
            open_text_head=HeadConfig.from_dict(_sub(d, "open_text_head"), in_dim=768),
            open_seg_loss_type=d.get("open_seg_loss_type", "cos_sim_l2"),
            open_seg_loss_down_factor=int(d.get("open_seg_loss_down_factor", 1)),
            open_seg_loss_hyper_config=d.get("open_seg_loss_hyper_config", {}) or {},
            fusion_head=fusion,
        )


@dataclasses.dataclass
class TrainerConfig:
    """`trainer` block (CTCLIPTrainer.py:318-416 config reads)."""

    lr: float = 1.25e-6
    wd: float = 0.0
    num_train_steps: int = 200_000
    max_grad_norm: float = 0.5
    gradient_accumulation_steps: int = 1
    save_results_every: int = 1000
    save_model_every: int = 1000
    eval_model_every: int = 2000
    sample_val_every: int = 1000
    vis_train_every: List[int] = dataclasses.field(default_factory=list)
    balance_loss_weight: List[float] = dataclasses.field(default_factory=list)
    warmup_steps: int = 0

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        # YAML 1.1 parses "1e-4" (no dot) as a STRING — coerce numerics
        for k in ("lr", "wd", "max_grad_norm"):
            if k in kwargs:
                kwargs[k] = float(kwargs[k])
        for k in ("num_train_steps", "gradient_accumulation_steps",
                  "save_results_every", "save_model_every",
                  "eval_model_every", "sample_val_every", "warmup_steps"):
            if k in kwargs:
                kwargs[k] = int(kwargs[k])
        if "balance_loss_weight" in kwargs:
            kwargs["balance_loss_weight"] = [
                float(w) for w in kwargs["balance_loss_weight"]
            ]
        return cls(**kwargs)


@dataclasses.dataclass
class DatasetSamplerConfig:
    """`DatasetSampler` block (CTCLIPTrainer.py:232-268)."""

    type: str = "Combined"  # "Combined" | "Random"
    acc_steps_list: List[int] = dataclasses.field(default_factory=lambda: [1])
    ratio_list: List[float] = dataclasses.field(default_factory=lambda: [1.0])

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DatasetSamplerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class ExperimentConfig:
    random_seed: int = 42
    results_folder: str = "./results"
    project_name: str = "vit_exp_tpu"
    exp_name: str = "default"
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    arch: ArchConfig = dataclasses.field(default_factory=ArchConfig)
    ct_clip_arch: CTClipArchConfig = dataclasses.field(default_factory=CTClipArchConfig)
    train_data_list: List[Dict[str, Any]] = dataclasses.field(default_factory=list)
    valid_test_list: List[str] = dataclasses.field(default_factory=list)
    sample_test_list: List[str] = dataclasses.field(default_factory=list)
    dataset_sampler: DatasetSamplerConfig = dataclasses.field(
        default_factory=DatasetSamplerConfig
    )
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentConfig":
        known = {
            "random_seed",
            "results_folder",
            "project_name",
            "exp_name",
            "train_data_list",
            "valid_test_list",
            "sample_test_list",
        }
        kwargs: Dict[str, Any] = {k: d[k] for k in known if k in d}
        kwargs["trainer"] = TrainerConfig.from_dict(_sub(d, "trainer"))
        kwargs["arch"] = ArchConfig.from_dict(_sub(d, "arch"))
        kwargs["ct_clip_arch"] = CTClipArchConfig.from_dict(_sub(d, "ct_clip_arch"))
        kwargs["dataset_sampler"] = DatasetSamplerConfig.from_dict(
            _sub(d, "DatasetSampler")
        )
        handled = known | {"trainer", "arch", "ct_clip_arch", "DatasetSampler"}
        kwargs["extra"] = {k: v for k, v in d.items() if k not in handled}
        return cls(**kwargs)


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        return ExperimentConfig.from_dict(yaml.safe_load(f) or {})

"""vit_exp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the CT-CLIP experiment stack in jackhu-bme/VIT-EXP.

Layer map (mirrors SURVEY.md §7 build plan):

- ``core``     mesh / sharding rules, precision policy, config schema
- ``ops``      compute primitives: 3D sincos posemb, cosine-sim attention
               (XLA + Pallas flash kernel), patchify/unpatchify, fused
               CT preprocessing (HU window + trilinear resample + crop/pad)
- ``models``   CTViT3D vision tower, flax BERT text tower, CTCLIP dual
               encoder with contrastive / closed-seg / open-vocab-seg heads
- ``parallel`` mesh-axis helpers, collective-backed global InfoNCE
- ``data``     datasets (npz trees + CSV/xlsx joins), tokenizer, loaders,
               multi-dataset step sampler
- ``train``    optax optimizer factory, train loop, orbax checkpointing
- ``eval``     zero-shot classification / segmentation engines, AUROC +
               bootstrap CI metrics
"""

__version__ = "0.1.0"

# Reference-style top-level API (`from ct_clip import CTCLIP`,
# `from transformer_maskgit import CTViT3D, ...` →
# `from vit_exp_tpu import CTCLIP, CTViT3D, ...`), lazily resolved so
# importing the package stays light (no jax/flax import cost until used).
_EXPORTS = {
    "CTCLIP": "vit_exp_tpu.models.ctclip",
    "CTViT3D": "vit_exp_tpu.models.ctvit3d",
    "CTViT": "vit_exp_tpu.models.ctvit",
    "MaskGit": "vit_exp_tpu.models.maskgit",
    "MaskGITTransformer": "vit_exp_tpu.models.maskgit_pipeline",
    "TextTransformer": "vit_exp_tpu.models.fallback",
    "VisionTransformer": "vit_exp_tpu.models.fallback",
    "build_ctclip": "vit_exp_tpu.models.factory",
    "build_image_encoder": "vit_exp_tpu.models.factory",
    "CTClipTrainer": "vit_exp_tpu.train.trainer",
    "CTViTTrainer": "vit_exp_tpu.train.ctvit_trainer",
    "ZeroShotClassifier": "vit_exp_tpu.eval.zero_shot",
    "ZeroShotSegmenter": "vit_exp_tpu.eval.zero_shot",
    "load_config": "vit_exp_tpu.core.config",
    "ExperimentConfig": "vit_exp_tpu.core.config",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'vit_exp_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))

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

"""Model factory: ExperimentConfig → CTCLIP module.

Equivalent of scripts/run_train.py:30-67 create_img_encoder + CTCLIP
construction (run_train.py:143-154).
"""

from __future__ import annotations

from typing import Optional

from vit_exp_tpu.core.config import ArchConfig, ExperimentConfig
from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.ctvit3d import CTViT3D


def bert_config_for(config: ExperimentConfig, tokenizer) -> BertConfig:
    """BertConfig for the text tower: BERT-base at the tokenizer's vocab
    size (the reference always pairs CTCLIP with BERT-base,
    CTCLIPTrainer.py:553-581), with per-field overrides from the yaml
    `text_encoder:` section (our extension — lets smaller towers or
    differently-shaped reference checkpoints convert through the CLIs)."""
    kwargs = dict(config.extra.get("text_encoder") or {})
    kwargs.setdefault("vocab_size", tokenizer.vocab_size)
    return BertConfig(**kwargs)


def build_image_encoder(
    arch: ArchConfig, *, attn_impl: str = "xla", ff_impl: str = "xla",
    remat: bool = False, fuse_qkv: bool = False,
    policy: Policy = DEFAULT_POLICY,
) -> CTViT3D:
    assert arch.arch_name in ("ctvit_3d", "ctvit3d", "ct_vit_3d"), arch.arch_name
    return CTViT3D(
        dim=arch.dim,
        image_size=arch.image_size,
        patch_size=arch.patch_size,
        temporal_size=arch.temporal_size,
        temporal_patch_size=arch.temporal_patch_size,
        transformer_blocks=arch.transformer_blocks,
        dim_head=arch.dim_head,
        heads=arch.heads,
        channels=arch.channels,
        # production reference path is SDPA (use_flash_attention: true) whose
        # scale convention is 1/sqrt(dim_head); the naive path used scale=8
        attn_scale=None if arch.use_flash_attention else 8.0,
        attn_impl=attn_impl,
        ff_impl=ff_impl,
        fuse_qkv=fuse_qkv,
        remat=remat,
        policy=policy,
    )


def build_ctclip(
    config: ExperimentConfig,
    *,
    bert_config: Optional[BertConfig] = None,
    attn_impl: str = "xla",
    ff_impl: str = "xla",
    remat: bool = False,
    fuse_qkv: bool = False,
    policy: Policy = DEFAULT_POLICY,
    dim_latent: Optional[int] = None,
) -> CTCLIP:
    visual = build_image_encoder(
        config.arch, attn_impl=attn_impl, ff_impl=ff_impl, remat=remat,
        fuse_qkv=fuse_qkv, policy=policy,
    )
    bert_config = bert_config or BertConfig()
    # reference fixes dims 768/768/768 (run_train.py:143-154); tests shrink
    if dim_latent is None:
        dim_latent = config.extra.get("dim_latent", 768)
    return CTCLIP(
        visual=visual,
        bert_config=bert_config,
        dim_text=bert_config.hidden_size,
        dim_image=config.arch.dim,
        dim_latent=dim_latent,
        clip_arch=config.ct_clip_arch,
        policy=policy,
    )

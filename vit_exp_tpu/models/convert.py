"""Reference-checkpoint conversion: torch CTClip state_dict → our params.

The reference saves `accelerator.get_state_dict(model)` as CTClip.{step}.pt
(CTCLIPTrainer.py:797-807) and strips a leading 'module.' on load
(ct_clip.py:760-774).  This maps that layout onto the flax param tree:

torch key (reference module path)            → flax path (ours)
visual_transformer.to_patch_emb.{1,2,3}      → patch_norm_in/patch_proj/patch_norm_out
visual_transformer.enc_3D.layers.{i}.1.*     → block{i}.attn.*   (FlashAttention)
visual_transformer.enc_3D.layers.{i}.3.{0,1,4} → block{i}.ff.{norm,wi,wo}
visual_transformer.enc_3D.norm_out.gamma     → norm_out.gamma
text_transformer.*                           → text_transformer.* (HF BERT, models/bert.py)
to_text_latent.weight / to_visual_latent.weight → to_text_latent/to_visual_latent kernels
temperature                                  → temperature
seg_head.{2k}.weight/bias                    → seg_head.fc{k}
open_seg_head / open_text_head / fusion_head → same MLPHead mapping

Weights are torch Linear (out, in) → transposed to (in, out) kernels.  The
fixed sincos pos_embed buffer is skipped (regenerated deterministically).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vit_exp_tpu.models.bert import BertConfig, convert_hf_bert_params


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _linear(sd, prefix, bias=True):
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"gamma": _np(sd[prefix + ".weight"]),
            "beta": _np(sd[prefix + ".bias"])}


def _mlp_head(sd, prefix, n_layers):
    # reference create_head: Sequential of [Linear, act] pairs → Linear at
    # even indices (ct_clip.py:736-750)
    return {
        f"fc{i}": _linear(sd, f"{prefix}.{2 * i}") for i in range(n_layers)
    }


def convert_ctclip_state_dict(
    state_dict: Dict[str, Any],
    *,
    transformer_blocks: int = 8,
    bert_config: BertConfig | None = None,
    n_head_layers: int = 2,
) -> Dict[str, Any]:
    """Returns a flax params dict for models/ctclip.CTCLIP."""
    sd = _strip_module(state_dict)
    bert_config = bert_config or BertConfig()

    visual: Dict[str, Any] = {
        "patch_norm_in": _ln(sd, "visual_transformer.to_patch_emb.1"),
        "patch_proj": _linear(sd, "visual_transformer.to_patch_emb.2"),
        "patch_norm_out": _ln(sd, "visual_transformer.to_patch_emb.3"),
        "norm_out": {
            "gamma": _np(sd["visual_transformer.enc_3D.norm_out.gamma"])
        },
    }
    for i in range(transformer_blocks):
        a = f"visual_transformer.enc_3D.layers.{i}.1"
        f = f"visual_transformer.enc_3D.layers.{i}.3"
        visual[f"block{i}"] = {
            "attn": {
                "norm": {"gamma": _np(sd[a + ".norm.gamma"])},
                "to_q": _linear(sd, a + ".to_q", bias=False),
                "to_kv": _linear(sd, a + ".to_kv", bias=False),
                "to_out": _linear(sd, a + ".to_out", bias=False),
                "q_scale": _np(sd[a + ".q_scale"]),
                "k_scale": _np(sd[a + ".k_scale"]),
                "null_kv": _np(sd[a + ".null_kv"]),
            },
            "ff": {
                "norm": _ln(sd, f + ".0"),
                "wi": _linear(sd, f + ".1", bias=False),
                "wo": _linear(sd, f + ".4", bias=False),
            },
        }

    bert_sd = {
        k[len("text_transformer."):]: v
        for k, v in sd.items()
        if k.startswith("text_transformer.")
    }
    text = convert_hf_bert_params(bert_sd, bert_config)

    params: Dict[str, Any] = {
        "visual": visual,
        "text_transformer": text,
        "to_text_latent": _linear(sd, "to_text_latent", bias=False),
        "to_visual_latent": _linear(sd, "to_visual_latent", bias=False),
        "temperature": _np(sd["temperature"]),
    }
    for head in ("seg_head", "open_seg_head", "open_text_head", "fusion_head"):
        if f"{head}.0.weight" in sd:
            params[head] = _mlp_head(sd, head, n_head_layers)
    return params


def load_ctclip_checkpoint(path: str, **kwargs) -> Dict[str, Any]:
    """Load a reference CTClip.{step}.pt and convert (torch required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_ctclip_state_dict(sd, **kwargs)

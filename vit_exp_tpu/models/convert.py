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


def _ctvit_stack(sd, prefix: str, depth: int) -> Dict[str, Any]:
    """One reference Transformer (attention.py:386-452, the NAIVE path
    ctvit.py:177-187 uses: [PEG, Attention, cross=None, FeedForward]) →
    models/ctvit.TransformerStack params."""
    out: Dict[str, Any] = {
        "norm_out": {"gamma": _np(sd[f"{prefix}.norm_out.gamma"])}
    }
    for i in range(depth):
        peg = f"{prefix}.layers.{i}.0"
        a = f"{prefix}.layers.{i}.1"
        f = f"{prefix}.layers.{i}.3"
        # torch Conv3d weight (dim, 1, kt, kh, kw) → flax (kt, kh, kw, 1, dim)
        out[f"peg{i}"] = {"dsconv": {
            "kernel": _np(sd[peg + ".dsconv.weight"]).transpose(2, 3, 4, 1, 0),
            "bias": _np(sd[peg + ".dsconv.bias"]),
        }}
        out[f"attn{i}"] = {
            "norm": {"gamma": _np(sd[a + ".norm.gamma"])},
            "to_q": _linear(sd, a + ".to_q", bias=False),
            "to_kv": _linear(sd, a + ".to_kv", bias=False),
            "to_out": _linear(sd, a + ".to_out", bias=False),
            "q_scale": _np(sd[a + ".q_scale"]),
            "k_scale": _np(sd[a + ".k_scale"]),
            "null_kv": _np(sd[a + ".null_kv"]),  # (h, 0, d) — no self nulls
        }
        out[f"ff{i}"] = {
            "norm": _ln(sd, f + ".0"),
            "wi": _linear(sd, f + ".1", bias=False),
            "wo": _linear(sd, f + ".4", bias=False),
        }
    return out


def convert_ctvit_state_dict(
    state_dict: Dict[str, Any],
    *,
    spatial_depth: int = 4,
    temporal_depth: int = 4,
) -> Dict[str, Any]:
    """Reference CTViT (the legacy CT-LiPro/GenerateCT tower,
    ctvit.py:118-525) state dict → our models/ctvit.CTViT variables:
    {"params": ..., "codebook": ...}.

    Accepts a bare CTViT state dict or one nested under a prefix (pass
    the pre-stripped dict).  The VQ codebook maps from
    vector-quantize-pytorch's CosineSimCodebook buffers (embed /
    cluster_size / embed_avg, each optionally carrying a leading
    groups=1 axis)."""
    sd = _strip_module(state_dict)

    params: Dict[str, Any] = {
        "first_frame_norm_in": _ln(sd, "to_patch_emb_first_frame.1"),
        "first_frame_proj": _linear(sd, "to_patch_emb_first_frame.2"),
        "first_frame_norm_out": _ln(sd, "to_patch_emb_first_frame.3"),
        "rest_norm_in": _ln(sd, "to_patch_emb.1"),
        "rest_proj": _linear(sd, "to_patch_emb.2"),
        "rest_norm_out": _ln(sd, "to_patch_emb.3"),
        "enc_spatial": _ctvit_stack(
            sd, "enc_spatial_transformer", spatial_depth),
        "enc_temporal": _ctvit_stack(
            sd, "enc_temporal_transformer", temporal_depth),
        "dec_spatial": _ctvit_stack(
            sd, "dec_spatial_transformer", spatial_depth),
        "dec_temporal": _ctvit_stack(
            sd, "dec_temporal_transformer", temporal_depth),
        "spatial_rel_pos_bias": {
            "net0": _linear(sd, "spatial_rel_pos_bias.net.0.0"),
            "net1": _linear(sd, "spatial_rel_pos_bias.net.1.0"),
            "to_bias": _linear(sd, "spatial_rel_pos_bias.net.2"),
        },
        "to_pixels_first_frame": _linear(sd, "to_pixels_first_frame.0"),
        "to_pixels": _linear(sd, "to_pixels.0"),
    }

    def vq_buffer(*names):
        for n in names:
            if n in sd:
                v = _np(sd[n]).astype(np.float32)
                return v[0] if v.ndim > 0 and v.shape[0] == 1 and (
                    v.ndim == 3 or (v.ndim == 2 and "cluster" in n)) else v
        return None

    codes = vq_buffer("vq._codebook.embed", "vq.codebook.embed", "vq.embed")
    if codes is None:
        raise KeyError(
            "no VQ codebook found in state dict (looked for "
            "vq._codebook.embed / vq.codebook.embed / vq.embed)")
    counts = vq_buffer("vq._codebook.cluster_size", "vq.cluster_size")
    sums = vq_buffer("vq._codebook.embed_avg", "vq.embed_avg")
    codebook = {"vq": {
        "codes": codes,
        "counts": counts if counts is not None
        else np.ones((codes.shape[0],), np.float32),
        "embed_sum": sums if sums is not None else codes,
    }}
    return {"params": params, "codebook": codebook}

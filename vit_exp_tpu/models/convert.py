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


def _t(x):
    """flax kernel (in, out) → torch Linear weight (out, in), fp32 numpy."""
    return np.ascontiguousarray(_np(x).astype(np.float32).T)


def _f(x):
    return np.asarray(_np(x), np.float32)


def export_bert_state_dict(
    text_params: Dict[str, Any],
    config: BertConfig,
    *,
    pooler: bool = True,
    buffers: bool = False,
) -> Dict[str, Any]:
    """Reverse of models/bert.convert_hf_bert_params: our BertModel param
    tree → an HF torch BertModel state_dict (keys WITHOUT any leading
    'bert.'), numpy fp32 values.

    The reference text tower is `BertModel.from_pretrained(...)`
    (run_train.py:129-131), so its checkpoints carry a pooler our tree
    doesn't have — `pooler=True` emits zero pooler weights (the pooler is
    unused by every CTCLIP path; ct_clip.py:1271 takes hidden states).
    `buffers=True` additionally emits the `embeddings.position_ids` /
    `embeddings.token_type_ids` buffers (arange / zeros) that OLDER HF
    versions keep in state_dict — off by default because newer HF rejects
    them as unexpected keys under strict load.
    """
    p = text_params

    def linear(prefix, tree):
        return {prefix + ".weight": _t(tree["kernel"]),
                prefix + ".bias": _f(tree["bias"])}

    def ln(prefix, tree):
        return {prefix + ".weight": _f(tree["gamma"]),
                prefix + ".bias": _f(tree["beta"])}

    out: Dict[str, Any] = {
        "embeddings.word_embeddings.weight": _f(p["word_embeddings"]),
        "embeddings.position_embeddings.weight": _f(
            p["position_embeddings"]),
        "embeddings.token_type_embeddings.weight": _f(
            p["token_type_embeddings"]),
        **ln("embeddings.LayerNorm", p["emb_norm"]),
    }
    if buffers:
        out["embeddings.position_ids"] = np.arange(
            config.max_position_embeddings, dtype=np.int64)[None]
        out["embeddings.token_type_ids"] = np.zeros(
            (1, config.max_position_embeddings), np.int64)
    for i in range(config.num_hidden_layers):
        q = f"encoder.layer.{i}"
        lp = p[f"layer{i}"]
        out.update(linear(q + ".attention.self.query",
                          lp["self_attn"]["query"]))
        out.update(linear(q + ".attention.self.key",
                          lp["self_attn"]["key"]))
        out.update(linear(q + ".attention.self.value",
                          lp["self_attn"]["value"]))
        out.update(linear(q + ".attention.output.dense", lp["attn_out"]))
        out.update(ln(q + ".attention.output.LayerNorm", lp["attn_norm"]))
        out.update(linear(q + ".intermediate.dense", lp["intermediate"]))
        out.update(linear(q + ".output.dense", lp["output"]))
        out.update(ln(q + ".output.LayerNorm", lp["out_norm"]))
    if pooler:
        h = config.hidden_size
        out["pooler.dense.weight"] = np.zeros((h, h), np.float32)
        out["pooler.dense.bias"] = np.zeros((h,), np.float32)
    return out


def export_ctclip_state_dict(
    params: Dict[str, Any],
    *,
    grid: tuple,
    heads: int,
    bert_config: BertConfig | None = None,
    like: Dict[str, Any] | None = None,
    bert_buffers: bool = False,
) -> Dict[str, Any]:
    """Inverse of convert_ctclip_state_dict: our flax params → the
    reference CTClip.{step}.pt state_dict layout (numpy fp32 values;
    torch.save-able via save_ctclip_checkpoint).

    The reference loads with a STRICT load_state_dict (ct_clip.py:760-774),
    so beyond the inverse of the import mapping this emits every key a
    reference CTCLIP(CTViT3D, BertModel) registers but our tree doesn't
    carry, with reference-init values:

    - `visual_transformer.pos_embed` — the fixed sincos buffer,
      regenerated bit-identically (ctvit3d.py:278-280);
    - per-block `norm.beta` / `context_norm.{gamma,beta}` and
      `enc_3D.norm_out.beta` — the gamma-only LayerNorm's zero-beta
      buffer (attention.py:34-41) and the unused self-attn context norm
      (attention.py:215, context is always None in enc_3D);
    - `spatial_rel_pos_bias.*` / `to_pixels.0.*` — modules CTViT3D
      instantiates but the encode path never runs (ctvit3d.py:227,273);
      zero-filled unless `like` supplies originals;
    - `to_text_latent_extra` / `to_visual_latent_extra` — the
      unconditional deepcopies (ct_clip.py:644-647): mirrored from the
      non-extra projections, matching deepcopy-at-init semantics;
    - the BERT pooler (see export_bert_state_dict).

    `grid` is the token grid (n_t, n_h, n_w); `like` (an original
    reference state dict) pins the emitted key SET to the reference's
    exactly, passes through any key this export can't derive, and
    OVERRIDES every synthesized/reference-init key above with the
    original's values (the originals are ground truth for dead modules;
    e.g. a real checkpoint's `*_latent_extra` holds its own random init,
    not a mirror of the trained projection) — use it when round-tripping
    a converted checkpoint.
    """
    from vit_exp_tpu.ops.posemb import sincos_pos_embed_3d

    bert_config = bert_config or BertConfig()
    visual = params["visual"]
    dim = _np(visual["norm_out"]["gamma"]).shape[0]
    # keys whose values are synthesized (reference-init / mirrored), not
    # derived from `params` — `like` values win over these
    synth: set = set()

    def lin(prefix, tree, bias=True):
        out = {prefix + ".weight": _t(tree["kernel"])}
        if bias:
            out[prefix + ".bias"] = _f(tree["bias"])
        return out

    def ln(prefix, tree):
        return {prefix + ".weight": _f(tree["gamma"]),
                prefix + ".bias": _f(tree["beta"])}

    sd: Dict[str, Any] = {}
    v = "visual_transformer."
    sd.update(ln(v + "to_patch_emb.1", visual["patch_norm_in"]))
    sd.update(lin(v + "to_patch_emb.2", visual["patch_proj"]))
    sd.update(ln(v + "to_patch_emb.3", visual["patch_norm_out"]))
    sd[v + "pos_embed"] = sincos_pos_embed_3d(dim, tuple(grid))[None]
    synth.add(v + "pos_embed")

    n_blocks = sum(1 for k in visual if k.startswith("block"))
    for i in range(n_blocks):
        blk = visual[f"block{i}"]
        a = f"{v}enc_3D.layers.{i}.1"
        f = f"{v}enc_3D.layers.{i}.3"
        attn, ff = blk["attn"], blk["ff"]
        sd[a + ".norm.gamma"] = _f(attn["norm"]["gamma"])
        sd[a + ".norm.beta"] = np.zeros((dim,), np.float32)
        sd[a + ".context_norm.gamma"] = np.ones((dim,), np.float32)
        sd[a + ".context_norm.beta"] = np.zeros((dim,), np.float32)
        synth.update((a + ".norm.beta", a + ".context_norm.gamma",
                      a + ".context_norm.beta"))
        sd[a + ".null_kv"] = _f(attn["null_kv"])
        sd.update(lin(a + ".to_q", attn["to_q"], bias=False))
        sd.update(lin(a + ".to_kv", attn["to_kv"], bias=False))
        sd[a + ".q_scale"] = _f(attn["q_scale"])
        sd[a + ".k_scale"] = _f(attn["k_scale"])
        sd.update(lin(a + ".to_out", attn["to_out"], bias=False))
        sd.update(ln(f + ".0", ff["norm"]))
        sd.update(lin(f + ".1", ff["wi"], bias=False))
        sd.update(lin(f + ".4", ff["wo"], bias=False))
    sd[v + "enc_3D.norm_out.gamma"] = _f(visual["norm_out"]["gamma"])
    sd[v + "enc_3D.norm_out.beta"] = np.zeros((dim,), np.float32)
    synth.add(v + "enc_3D.norm_out.beta")

    # modules the encode path never runs (zero-filled; `like` overrides):
    # ContinuousPositionBias net = Linear(2,dim), Linear(dim,dim),
    # Linear(dim,heads) (attention.py:350-359) and the to_pixels head
    patch_dim = _np(visual["patch_proj"]["kernel"]).shape[0]
    rel = v + "spatial_rel_pos_bias.net."
    for key, shape in (
        (rel + "0.0.weight", (dim, 2)), (rel + "0.0.bias", (dim,)),
        (rel + "1.0.weight", (dim, dim)), (rel + "1.0.bias", (dim,)),
        (rel + "2.weight", (heads, dim)), (rel + "2.bias", (heads,)),
        (v + "to_pixels.0.weight", (patch_dim, dim)),
        (v + "to_pixels.0.bias", (patch_dim,)),
    ):
        sd[key] = np.zeros(shape, np.float32)
        synth.add(key)

    for k, val in export_bert_state_dict(
            params["text_transformer"], bert_config,
            buffers=bert_buffers).items():
        sd["text_transformer." + k] = val
    synth.update(("text_transformer.pooler.dense.weight",
                  "text_transformer.pooler.dense.bias",
                  "text_transformer.embeddings.position_ids",
                  "text_transformer.embeddings.token_type_ids"))

    sd["to_text_latent.weight"] = _t(params["to_text_latent"]["kernel"])
    sd["to_visual_latent.weight"] = _t(params["to_visual_latent"]["kernel"])
    sd["to_text_latent_extra.weight"] = sd["to_text_latent.weight"].copy()
    sd["to_visual_latent_extra.weight"] = (
        sd["to_visual_latent.weight"].copy())
    synth.update(("to_text_latent_extra.weight",
                  "to_visual_latent_extra.weight"))
    sd["temperature"] = _f(params["temperature"])

    for head in ("seg_head", "open_seg_head", "open_text_head",
                 "fusion_head"):
        if head in params:
            for i in sorted(int(k[2:]) for k in params[head]):
                sd.update(lin(f"{head}.{2 * i}", params[head][f"fc{i}"]))

    if like is not None:
        like = _strip_module(like)
        for k, val in like.items():
            # the original is ground truth both for keys we can't derive
            # AND for the synthesized reference-init fills above
            if k not in sd or k in synth:
                arr = _np(val)
                sd[k] = (arr.astype(np.float32)
                         if np.issubdtype(arr.dtype, np.floating) else arr)
        sd = {k: sd[k] for k in like}  # pin the reference's exact key set
    return sd


def save_ctclip_checkpoint(path: str, params: Dict[str, Any],
                           **kwargs) -> None:
    """export_ctclip_state_dict + torch.save as a CTClip.{step}.pt the
    reference's `clip.load` consumes.  Keys are saved WITH the 'module.'
    prefix: the reference load strips the first 7 characters of every key
    UNCONDITIONALLY (`{k[7:]: v}`, ct_clip.py:771), so an unprefixed file
    would be mangled — the prefix is mandatory, not cosmetic."""
    import torch

    # np.array (not ascontiguousarray, which PROMOTES 0-d arrays to (1,)
    # and would fail the reference's strict load on the scalar temperature —
    # caught by tests/test_real_weights_rehearsal.py)
    sd = {"module." + k: torch.from_numpy(np.array(v, copy=True, order="C"))
          for k, v in export_ctclip_state_dict(params, **kwargs).items()}
    torch.save(sd, path)


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

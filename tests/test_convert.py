"""Checkpoint conversion parity: a torch oracle of the reference CTViT3D /
CTCLIP forward (built from the specs verified piecewise in the other tests)
is run against our flax model loaded via convert_ctclip_state_dict from the
oracle's own state_dict.  This is the end-to-end analogue of the reference's
two-implementation comparison methodology (demo_tests, SURVEY.md §4.1).

Three shapes run (VERDICT round-1 item 3):
- toy cube (fast, every PR);
- NON-CUBIC grid (t=4, h=w=2): catches the posemb meshgrid-'xy' buffer
  reinterpretation (ctvit3d.py:121-169) that only coincidentally matches
  naive ordering on cubes;
- PRODUCTION shape (dim 768 / 8 blocks / 24³ tokens / d_head 32, marked
  slow): catches stride/layout bugs invisible at toy dims.  The torch
  oracle chunks its attention over query blocks to stay in RAM.
"""

import dataclasses
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.convert import convert_ctclip_state_dict
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.factory import build_ctclip
from vit_exp_tpu.ops.posemb import sincos_pos_embed_3d

transformers = pytest.importorskip("transformers")


@dataclasses.dataclass(frozen=True)
class Spec:
    dim: int = 24
    heads: int = 2
    dh: int = 4
    blocks: int = 2
    img: int = 8
    p: int = 4
    t: int = 8
    pt: int = 4
    n_null: int = 2
    vocab: int = 97
    atol: float = 5e-5

    @property
    def grid(self):
        return (self.t // self.pt, self.img // self.p, self.img // self.p)


TOY = Spec()
# t-grid 4 vs spatial 2×2 — posemb reinterpretation differs from raster order
NONCUBE = Spec(t=16, pt=4, img=8, p=4, dim=24)
# production: ct_clip_vit_open_seg_hpc_v5_1_80g.yaml arch block
PROD = Spec(dim=768, heads=8, dh=32, blocks=8, img=480, p=20, t=240, pt=10,
            n_null=2, atol=2e-3)


class TorchAttn(nn.Module):
    """Oracle of reference FlashAttention (attention.py:189-284, sdpa scale).

    Chunked over query blocks so the (n, n_kv) logits stay bounded at
    production shape (13824 tokens)."""

    def __init__(self, s: Spec):
        super().__init__()
        self.s = s
        inner = s.heads * s.dh
        self.norm = nn.LayerNorm(s.dim, elementwise_affine=True)
        self.norm.bias.requires_grad_(False)
        with torch.no_grad():
            self.norm.bias.zero_()
        # reference LayerNorm is gamma-only; emulate via zeroed frozen bias
        self.to_q = nn.Linear(s.dim, inner, bias=False)
        self.to_kv = nn.Linear(s.dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, s.dim, bias=False)
        self.q_scale = nn.Parameter(torch.rand(s.dh) + 0.5)
        self.k_scale = nn.Parameter(torch.rand(s.dh) + 0.5)
        self.null_kv = nn.Parameter(torch.randn(s.heads, 2 * s.n_null, s.dh))

    def forward(self, x):
        s = self.s
        b, n, _ = x.shape
        h, dh = s.heads, s.dh
        xn = F.layer_norm(x, (s.dim,), self.norm.weight, None)
        q = self.to_q(xn).view(b, n, h, dh).transpose(1, 2)
        # reference quirk (attention.py:240-244): kv_input binds BEFORE
        # x = self.norm(x) — k/v project from the PRE-norm input
        k, v = self.to_kv(x).chunk(2, dim=-1)
        k = k.view(b, n, h, dh).transpose(1, 2)
        v = v.view(b, n, h, dh).transpose(1, 2)
        nkv = self.null_kv.view(h, s.n_null, 2, dh)
        nk = nkv[:, :, 0].unsqueeze(0).expand(b, -1, -1, -1)
        nv = nkv[:, :, 1].unsqueeze(0).expand(b, -1, -1, -1)
        k = torch.cat([nk, k], dim=2)
        v = torch.cat([nv, v], dim=2)
        q = F.normalize(q, dim=-1) * self.q_scale
        k = F.normalize(k, dim=-1) * self.k_scale
        scale = 1.0 / math.sqrt(dh)
        outs = []
        for lo in range(0, n, 2048):
            qc = q[:, :, lo:lo + 2048]
            sim = torch.einsum("bhid,bhjd->bhij", qc, k) * scale
            outs.append(torch.einsum("bhij,bhjd->bhid", sim.softmax(-1), v))
        out = torch.cat(outs, dim=2)
        return self.to_out(out.transpose(1, 2).reshape(b, n, h * dh))


class TorchFF(nn.Module):
    def __init__(self, s: Spec):
        super().__init__()
        inner = int(4 * (2 / 3) * s.dim)
        self.seq = nn.Sequential(
            nn.LayerNorm(s.dim),
            nn.Linear(s.dim, inner * 2, bias=False),
            nn.Identity(),  # placeholder for GEGLU slot (index parity)
            nn.Dropout(0.0),
            nn.Linear(inner, s.dim, bias=False),
        )

    def forward(self, x):
        x = self.seq[0](x)
        x = self.seq[1](x)
        val, gate = x.chunk(2, dim=-1)
        return self.seq[4](F.gelu(gate) * val)


class TorchTower(nn.Module):
    """Oracle of CTViT3D (ctvit3d.py:175-490) with reference module paths."""

    def __init__(self, s: Spec):
        super().__init__()
        self.s = s
        patch_dim = s.pt * s.p * s.p
        self.to_patch_emb = nn.Sequential(
            nn.Identity(),  # slot 0: Rearrange
            nn.LayerNorm(patch_dim),
            nn.Linear(patch_dim, s.dim),
            nn.LayerNorm(s.dim),
        )
        spec = s

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [
                        nn.ModuleList(
                            [nn.Identity(), TorchAttn(spec), nn.Identity(),
                             TorchFF(spec)]
                        )
                        for _ in range(spec.blocks)
                    ]
                )

                class NormOut(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.gamma = nn.Parameter(torch.ones(spec.dim))

                    def forward(self, x):
                        return F.layer_norm(x, (spec.dim,), self.gamma, None)

                self.norm_out = NormOut()

            def forward(self, x):
                for _, attn, _, ff in self.layers:
                    x = attn(x) + x
                    x = ff(x) + x
                return self.norm_out(x)

        self.enc_3D = Enc()
        pos = sincos_pos_embed_3d(s.dim, s.grid)
        self.register_buffer("pos_embed", torch.tensor(pos).unsqueeze(0))

    def forward(self, video):
        s = self.s
        b, c = video.shape[:2]
        t, hh, ww = s.grid
        x = video.reshape(b, c, t, s.pt, hh, s.p, ww, s.p)
        x = x.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, t, hh, ww, c * s.pt * s.p * s.p
        )
        for m in self.to_patch_emb[1:]:
            x = m(x)
        x = x.reshape(b, t * hh * ww, s.dim) + self.pos_embed
        x = self.enc_3D(x)
        return x.reshape(b, t, hh, ww, s.dim)


def _build_pair(s: Spec, seed=0, with_text=True):
    torch.manual_seed(seed)
    tower = TorchTower(s).eval()
    sd = {}
    for k, v in tower.state_dict().items():
        if "pos_embed" in k or ".norm.bias" in k:
            continue
        # map oracle FF Sequential (.seq.N) back to reference layout (.N)
        k = k.replace(".seq.", ".")
        # reference gamma-only LN inside attention stores param as norm.gamma
        k = k.replace(".1.norm.weight", ".1.norm.gamma")
        sd[f"visual_transformer.{k}"] = v

    bert = to_text = to_visual = temp = None
    bc = BertConfig(
        vocab_size=s.vocab, hidden_size=s.dim, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2,
    )
    if with_text:
        hf_cfg = transformers.BertConfig(
            vocab_size=s.vocab, hidden_size=s.dim, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, type_vocab_size=2, hidden_act="gelu",
        )
        bert = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
        to_text = nn.Linear(s.dim, s.dim, bias=False)
        to_visual = nn.Linear(s.dim, s.dim, bias=False)
        temp = nn.Parameter(torch.tensor(0.7))
        for k, v in bert.state_dict().items():
            sd[f"text_transformer.{k}"] = v
        sd["to_text_latent.weight"] = to_text.weight
        sd["to_visual_latent.weight"] = to_visual.weight
        sd["temperature"] = temp
    else:
        # conversion requires the full CTCLIP layout; fill the text side
        # with a fresh tiny tower (unused by encode_image_tokens)
        hf_cfg = transformers.BertConfig(
            vocab_size=s.vocab, hidden_size=s.dim, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, type_vocab_size=2, hidden_act="gelu",
        )
        bert0 = transformers.BertModel(hf_cfg, add_pooling_layer=False)
        for k, v in bert0.state_dict().items():
            sd[f"text_transformer.{k}"] = v
        sd["to_text_latent.weight"] = torch.randn(s.dim, s.dim)
        sd["to_visual_latent.weight"] = torch.randn(s.dim, s.dim)
        sd["temperature"] = torch.tensor(0.7)

    config = ExperimentConfig.from_dict(
        {
            "arch": {
                "dim": s.dim, "image_size": s.img, "patch_size": s.p,
                "temporal_size": s.t, "temporal_patch_size": s.pt,
                "transformer_blocks": s.blocks, "dim_head": s.dh,
                "heads": s.heads, "use_flash_attention": True,
            }
        }
    )
    model = build_ctclip(config, bert_config=bc, policy=FP32_POLICY,
                         dim_latent=s.dim)
    params = convert_ctclip_state_dict(
        sd, transformer_blocks=s.blocks, bert_config=bc
    )
    return tower, bert, to_text, to_visual, temp, model, params, sd


@pytest.mark.parametrize("spec", [TOY, NONCUBE], ids=["cube", "noncube"])
def test_tower_tokens_parity(spec):
    tower, _, _, _, _, model, params, _ = _build_pair(spec)
    rng = np.random.default_rng(0)
    video = rng.standard_normal(
        (2, 1, spec.t, spec.img, spec.img)).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.tensor(video)).numpy()
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(video),
                    method=CTCLIP.encode_image_tokens)
    )
    np.testing.assert_allclose(ours, ref, atol=spec.atol)


def test_clip_score_parity():
    spec = TOY
    tower, bert, to_text, to_visual, temp, model, params, _ = _build_pair(
        spec, seed=1)
    rng = np.random.default_rng(1)
    video = rng.standard_normal(
        (2, 1, spec.t, spec.img, spec.img)).astype(np.float32)
    ids = rng.integers(0, spec.vocab, (2, 11))
    mask = np.ones((2, 11), dtype=np.int64)

    with torch.no_grad():
        tokens = tower(torch.tensor(video))
        b = tokens.shape[0]
        img_lat = to_visual(tokens.reshape(b, -1, spec.dim)).mean(dim=1)
        img_lat = F.normalize(img_lat, dim=-1)
        hidden = bert(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)).last_hidden_state
        txt_lat = F.normalize(to_text(hidden[:, 0, :]), dim=-1)
        ref_score = (
            torch.einsum("bd,bd->b", txt_lat, img_lat) * temp.exp()
        ).numpy()

    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(ids),
        jnp.asarray(mask),
    )
    ours = np.asarray(
        model.apply(
            {"params": params}, out["text_latents"], out["image_latents"],
            method=CTCLIP.forward_infer,
        )
    )
    np.testing.assert_allclose(ours, ref_score, atol=spec.atol)


@pytest.mark.slow
def test_tower_tokens_parity_production_shape():
    """Full 768-dim / 8-block / 24³-token conversion parity (VERDICT #3a).

    fp32 end to end; tolerance 2e-3 on the LayerNormed output absorbs
    BLAS-vs-XLA reduction-order drift accumulated over 8 blocks of 13.8k-
    token attention — layout/stride/transpose bugs produce O(1) errors."""
    spec = PROD
    tower, _, _, _, _, model, params, _ = _build_pair(spec, seed=2,
                                                   with_text=False)
    rng = np.random.default_rng(2)
    video = rng.standard_normal(
        (1, 1, spec.t, spec.img, spec.img)).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.tensor(video)).numpy()
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(video),
                    method=CTCLIP.encode_image_tokens)
    )
    assert ours.shape == ref.shape == (1, 24, 24, 24, 768)
    err = np.abs(ours - ref).max()
    assert err < spec.atol, f"max abs err {err}"


def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """File-level conversion: a CTClip.{step}.pt saved with the DDP
    'module.' key prefix (what accelerator.save(state_dict, unwrap=False)
    writes under DDP; CTClip.load strips it at ct_clip.py:760-774) →
    convert_checkpoint CLI → orbax restore equals the direct in-memory
    conversion, with the step parsed from the filename."""
    import yaml

    from vit_exp_tpu.cli.convert_checkpoint import main as convert_main
    from vit_exp_tpu.train.checkpoint import CheckpointManager
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import create_train_state

    *_, params, sd = _build_pair(TOY)
    pt_path = tmp_path / "CTClip.12345.pt"
    torch.save({f"module.{k}": v for k, v in sd.items()}, pt_path)

    s = TOY
    cfg = {
        "results_folder": str(tmp_path / "out"),
        "trainer": {"lr": 1e-4},
        "arch": {"dim": s.dim, "image_size": s.img, "patch_size": s.p,
                 "temporal_size": s.t, "temporal_patch_size": s.pt,
                 "transformer_blocks": s.blocks, "dim_head": s.dh,
                 "heads": s.heads},
        # yaml text_encoder section: shapes the toy oracle's 2-layer BERT
        "text_encoder": {"hidden_size": s.dim, "num_hidden_layers": 2,
                         "num_attention_heads": 2, "intermediate_size": 32,
                         "max_position_embeddings": 32},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out_dir = tmp_path / "ckpts"
    # the CLI builds BertConfig from the default tokenizer vocab; our toy
    # oracle uses a tiny vocab, so pass a vocab file matching it
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"tok{i}" for i in range(TOY.vocab - 5)]))
    convert_main(["--config", str(cfg_path), "--torch_ckpt", str(pt_path),
                  "--out", str(out_dir), "--vocab", str(vocab_path)])

    tx = build_optimizer(ExperimentConfig.from_dict(cfg).trainer)
    template = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, params), tx)
    mgr = CheckpointManager(str(out_dir))
    assert 12345 in mgr.all_steps()
    restored = mgr.restore(12345, jax.eval_shape(lambda: template))
    assert int(restored.step) == 12345
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, params)


def test_convert_legacy_ctvit_state_dict():
    """Legacy CTViT (CT-LiPro/GenerateCT tower) converter: a reference-
    named state dict (ctvit.py:118-525 module layout — Sequential patch
    embeds, Transformer layers [PEG, Attention, None, FeedForward], CPB
    net, vector-quantize-pytorch codebook buffers) converts to EXACTLY
    our CTViT variable tree, transposes land where marked, and the
    converted variables run encode+decode."""
    from vit_exp_tpu.models.convert import convert_ctvit_state_dict
    from vit_exp_tpu.models.ctvit import CTViT

    dim, heads, dim_head, cb = 16, 2, 4, 32
    inner = int(4 * (2 / 3) * dim)  # FeedForward inner (attention.py:51)
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {}

    def add_patch_emb(prefix, in_dim):
        sd[f"{prefix}.1.weight"] = t(in_dim)
        sd[f"{prefix}.1.bias"] = t(in_dim)
        sd[f"{prefix}.2.weight"] = t(dim, in_dim)
        sd[f"{prefix}.2.bias"] = t(dim)
        sd[f"{prefix}.3.weight"] = t(dim)
        sd[f"{prefix}.3.bias"] = t(dim)

    add_patch_emb("to_patch_emb_first_frame", 4 * 4)       # c·p·p
    add_patch_emb("to_patch_emb", 2 * 4 * 4)               # c·pt·p·p

    def add_stack(prefix, depth=1):
        sd[f"{prefix}.norm_out.gamma"] = t(dim)
        for i in range(depth):
            sd[f"{prefix}.layers.{i}.0.dsconv.weight"] = t(dim, 1, 3, 3, 3)
            sd[f"{prefix}.layers.{i}.0.dsconv.bias"] = t(dim)
            a = f"{prefix}.layers.{i}.1"
            sd[f"{a}.norm.gamma"] = t(dim)
            sd[f"{a}.to_q.weight"] = t(heads * dim_head, dim)
            sd[f"{a}.to_kv.weight"] = t(2 * heads * dim_head, dim)
            sd[f"{a}.to_out.weight"] = t(dim, heads * dim_head)
            sd[f"{a}.q_scale"] = t(dim_head)
            sd[f"{a}.k_scale"] = t(dim_head)
            sd[f"{a}.null_kv"] = torch.zeros(heads, 0, dim_head)
            f = f"{prefix}.layers.{i}.3"
            sd[f"{f}.0.weight"] = t(dim)
            sd[f"{f}.0.bias"] = t(dim)
            sd[f"{f}.1.weight"] = t(2 * inner, dim)
            sd[f"{f}.4.weight"] = t(dim, inner)

    for p in ("enc_spatial_transformer", "enc_temporal_transformer",
              "dec_spatial_transformer", "dec_temporal_transformer"):
        add_stack(p)

    sd["spatial_rel_pos_bias.net.0.0.weight"] = t(dim, 2)
    sd["spatial_rel_pos_bias.net.0.0.bias"] = t(dim)
    sd["spatial_rel_pos_bias.net.1.0.weight"] = t(dim, dim)
    sd["spatial_rel_pos_bias.net.1.0.bias"] = t(dim)
    sd["spatial_rel_pos_bias.net.2.weight"] = t(heads, dim)
    sd["spatial_rel_pos_bias.net.2.bias"] = t(heads)
    sd["to_pixels_first_frame.0.weight"] = t(4 * 4, dim)
    sd["to_pixels_first_frame.0.bias"] = t(4 * 4)
    sd["to_pixels.0.weight"] = t(2 * 4 * 4, dim)
    sd["to_pixels.0.bias"] = t(2 * 4 * 4)
    # grouped (leading groups=1 axis) codebook buffers, newer vq-pytorch
    sd["vq._codebook.embed"] = t(1, cb, dim)
    sd["vq._codebook.cluster_size"] = t(1, cb).abs()
    sd["vq._codebook.embed_avg"] = t(1, cb, dim)

    converted = convert_ctvit_state_dict(
        sd, spatial_depth=1, temporal_depth=1)

    import flax.linen as nn_flax

    model = CTViT(dim=dim, codebook_size=cb, image_size=8, patch_size=4,
                  temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
                  dim_head=dim_head, heads=heads, policy=FP32_POLICY)
    video = jnp.zeros((1, 1, 3, 8, 8), jnp.float32)
    init_vars = nn_flax.unbox(model.init(
        jax.random.PRNGKey(0), video,
        return_encoded_tokens=False, return_recons=True))

    # exact tree + shape + dtype-compatible match
    jax.tree_util.tree_map(
        lambda a, b: (np.testing.assert_array_equal(
            np.asarray(a).shape, np.asarray(b).shape)),
        init_vars, converted)

    # transposes: torch Linear weight (out, in) -> flax kernel (in, out)
    np.testing.assert_allclose(
        converted["params"]["first_frame_proj"]["kernel"],
        sd["to_patch_emb_first_frame.2.weight"].numpy().T)
    # torch Conv3d (dim, 1, kt, kh, kw) -> flax (kt, kh, kw, 1, dim)
    np.testing.assert_allclose(
        converted["params"]["enc_spatial"]["peg0"]["dsconv"]["kernel"],
        sd["enc_spatial_transformer.layers.0.0.dsconv.weight"]
        .numpy().transpose(2, 3, 4, 1, 0))
    # grouped VQ buffers squeeze their groups axis
    np.testing.assert_allclose(converted["codebook"]["vq"]["codes"],
                               sd["vq._codebook.embed"].numpy()[0])
    np.testing.assert_allclose(converted["codebook"]["vq"]["counts"],
                               sd["vq._codebook.cluster_size"].numpy()[0])

    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    recon, indices, commit = model.apply(
        converted, video, return_encoded_tokens=False, return_recons=True)
    assert recon.shape == video.shape
    assert np.isfinite(np.asarray(recon)).all()


# ---------------------------------------------------------------------------
# Reverse conversion: flax params → reference CTClip.{step}.pt layout
# (models/convert.export_ctclip_state_dict).  Together with the import
# tests above this proves the mapping is a BIJECTION on the derived keys —
# the strongest conversion guarantee available without real weights.


def _toy_bert_config(s: Spec = TOY):
    return BertConfig(vocab_size=s.vocab, hidden_size=s.dim,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=32, max_position_embeddings=32,
                      type_vocab_size=2)


# an awkward architecture for the bijection sweep: odd head count, inner
# attention width (heads·dh=24) != dim, odd block count, non-cubic grid
ODDARCH = Spec(dim=36, heads=3, dh=8, blocks=3, t=8, pt=2)


@pytest.mark.parametrize("s", [TOY, NONCUBE, ODDARCH],
                         ids=["cube", "noncube", "oddarch"])
def test_export_roundtrip_bitexact(s):
    """torch → flax → torch round trip: with `like` pinning the key set
    to the original's, every key comes back BIT-identical (derived keys
    invert exactly: .T∘.T; the rest pass through) — on cubic, non-cubic
    and odd-dimension architectures."""
    from vit_exp_tpu.models.convert import export_ctclip_state_dict

    *_, params, sd = _build_pair(s)
    out = export_ctclip_state_dict(params, grid=s.grid, heads=s.heads,
                                   bert_config=_toy_bert_config(s), like=sd)
    assert set(out) == set(sd)
    for k, v in sd.items():
        ref = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        np.testing.assert_array_equal(
            out[k], np.asarray(ref), err_msg=k)


@pytest.mark.parametrize("s", [TOY, ODDARCH], ids=["cube", "oddarch"])
def test_export_reimport_identity_and_strict_surface(s):
    """Without `like`: re-importing the export reproduces the flax tree
    exactly, and the export carries every reference-registered key the
    strict load needs (ct_clip.py:771 load_state_dict): gamma-only-LN
    beta buffers, the unused context_norm, the regenerated pos_embed
    buffer, CTViT3D's dead modules, the unconditional *_extra deepcopies
    (ct_clip.py:644-647) and the BERT pooler."""
    from vit_exp_tpu.models.convert import (convert_ctclip_state_dict,
                                            export_ctclip_state_dict)

    bc = _toy_bert_config(s)
    *_, params, _ = _build_pair(s)
    out = export_ctclip_state_dict(params, grid=s.grid, heads=s.heads,
                                   bert_config=bc)

    v = "visual_transformer."
    for key in (
        v + "pos_embed",
        v + "enc_3D.layers.0.1.norm.beta",
        v + "enc_3D.layers.0.1.context_norm.gamma",
        v + "enc_3D.layers.0.1.context_norm.beta",
        v + "enc_3D.norm_out.beta",
        v + "spatial_rel_pos_bias.net.0.0.weight",
        v + "spatial_rel_pos_bias.net.2.bias",
        v + "to_pixels.0.weight",
        "to_text_latent_extra.weight",
        "to_visual_latent_extra.weight",
        "text_transformer.pooler.dense.weight",
    ):
        assert key in out, key
    np.testing.assert_array_equal(
        out[v + "pos_embed"], sincos_pos_embed_3d(s.dim, s.grid)[None])
    np.testing.assert_array_equal(out["to_visual_latent_extra.weight"],
                                  out["to_visual_latent.weight"])
    assert out[v + "spatial_rel_pos_bias.net.0.0.weight"].shape == (
        s.dim, 2)
    assert out[v + "spatial_rel_pos_bias.net.2.weight"].shape == (
        s.heads, s.dim)
    patch_dim = s.pt * s.p * s.p
    assert out[v + "to_pixels.0.weight"].shape == (patch_dim, s.dim)

    params2 = convert_ctclip_state_dict(out, transformer_blocks=s.blocks,
                                        bert_config=bc)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params2)


def test_export_like_overrides_synthesized_keys():
    """`like` is ground truth for the keys the export merely synthesizes
    (dead modules, pooler, *_extra deepcopies, reference-init LN
    buffers): a real checkpoint's values for those keys must survive the
    round trip instead of being shadowed by the zero/mirror fills — e.g.
    a reference user running the decode path needs the ORIGINAL to_pixels
    weights back, and a real *_latent_extra holds its own random init,
    not a mirror of the trained projection."""
    from vit_exp_tpu.models.convert import export_ctclip_state_dict

    s = TOY
    bc = _toy_bert_config()
    *_, params, _ = _build_pair(s)
    base = export_ctclip_state_dict(params, grid=s.grid, heads=s.heads,
                                    bert_config=bc)

    v = "visual_transformer."
    synth_keys = [
        v + "pos_embed",
        v + "enc_3D.layers.0.1.norm.beta",
        v + "enc_3D.layers.0.1.context_norm.gamma",
        v + "enc_3D.layers.1.1.context_norm.beta",
        v + "enc_3D.norm_out.beta",
        v + "spatial_rel_pos_bias.net.0.0.weight",
        v + "spatial_rel_pos_bias.net.1.0.bias",
        v + "spatial_rel_pos_bias.net.2.weight",
        v + "to_pixels.0.weight",
        v + "to_pixels.0.bias",
        "to_text_latent_extra.weight",
        "to_visual_latent_extra.weight",
        "text_transformer.pooler.dense.weight",
        "text_transformer.pooler.dense.bias",
    ]
    rng = np.random.default_rng(7)
    like = {k: np.asarray(val).copy() for k, val in base.items()}
    for k in synth_keys:
        like[k] = rng.normal(size=like[k].shape).astype(np.float32)

    out = export_ctclip_state_dict(params, grid=s.grid, heads=s.heads,
                                   bert_config=bc, like=like)
    assert set(out) == set(like)
    for k in synth_keys:
        np.testing.assert_array_equal(out[k], like[k], err_msg=k)
    # derived keys still come from params, not from `like`
    np.testing.assert_array_equal(out["to_text_latent.weight"],
                                  base["to_text_latent.weight"])
    np.testing.assert_array_equal(
        out[v + "enc_3D.layers.0.1.norm.gamma"],
        base[v + "enc_3D.layers.0.1.norm.gamma"])


def test_export_bert_strict_torch_load():
    """The exported text subtree strict-loads into a REAL HF torch
    BertModel (pooler included) — the exact module the reference
    registers as text_transformer (run_train.py:129-131)."""
    from vit_exp_tpu.models.convert import export_bert_state_dict

    s = TOY
    bc = _toy_bert_config()
    *_, params, _ = _build_pair(s)
    hf_cfg = transformers.BertConfig(
        vocab_size=s.vocab, hidden_size=s.dim, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2, hidden_act="gelu")
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=True)
    want = set(hf.state_dict().keys())

    exported = export_bert_state_dict(params["text_transformer"], bc,
                                      pooler=True, buffers=True)
    # this HF version decides which embeddings buffers live in state_dict
    for buf in ("embeddings.position_ids", "embeddings.token_type_ids"):
        if buf not in want:
            exported.pop(buf, None)
    assert set(exported) == want
    hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=True)


def test_export_checkpoint_cli_full_circle(tmp_path):
    """pt → convert_checkpoint CLI → orbax → export_checkpoint CLI → pt:
    the final file loads with the reference's unconditional 7-char strip
    (ct_clip.py:771) and every original key is bit-identical."""
    import yaml

    from vit_exp_tpu.cli.convert_checkpoint import main as convert_main
    from vit_exp_tpu.cli.export_checkpoint import main as export_main

    s = TOY
    *_, params, sd = _build_pair(s)
    pt_path = tmp_path / "CTClip.777.pt"
    torch.save({f"module.{k}": v for k, v in sd.items()}, pt_path)

    cfg = {
        "results_folder": str(tmp_path / "out"),
        "trainer": {"lr": 1e-4},
        "arch": {"dim": s.dim, "image_size": s.img, "patch_size": s.p,
                 "temporal_size": s.t, "temporal_patch_size": s.pt,
                 "transformer_blocks": s.blocks, "dim_head": s.dh,
                 "heads": s.heads},
        "text_encoder": {"hidden_size": s.dim, "num_hidden_layers": 2,
                         "num_attention_heads": 2, "intermediate_size": 32,
                         "max_position_embeddings": 32},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"tok{i}" for i in range(TOY.vocab - 5)]))

    out_dir = tmp_path / "ckpts"
    convert_main(["--config", str(cfg_path), "--torch_ckpt", str(pt_path),
                  "--out", str(out_dir), "--vocab", str(vocab_path)])

    back_path = tmp_path / "CTClip.exported.777.pt"
    export_main(["--config", str(cfg_path),
                 "--ckpt", str(out_dir / "ckpt_777"),
                 "--out", str(back_path), "--vocab", str(vocab_path),
                 "--like", str(pt_path)])

    back = torch.load(back_path, map_location="cpu", weights_only=True)
    # reference load semantics: unconditional k[7:] strip
    stripped = {k[7:]: v for k, v in back.items()}
    assert set(stripped) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(
            stripped[k].numpy(), v.detach().cpu().numpy(), err_msg=k)

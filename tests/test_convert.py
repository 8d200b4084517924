"""Checkpoint conversion parity: a torch oracle of the reference CTViT3D /
CTCLIP forward (built from the specs verified piecewise in the other tests)
is run against our flax model loaded via convert_ctclip_state_dict from the
oracle's own state_dict.  This is the end-to-end analogue of the reference's
two-implementation comparison methodology (demo_tests, SURVEY.md §4.1)."""

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

DIM, HEADS, DH, BLOCKS = 24, 2, 4, 2
IMG, P, T, PT = 8, 4, 8, 4
GRID = (T // PT, IMG // P, IMG // P)
N_NULL = 2


class TorchAttn(nn.Module):
    """Oracle of reference FlashAttention (attention.py:189-284, sdpa scale)."""

    def __init__(self):
        super().__init__()
        inner = HEADS * DH
        self.norm = nn.LayerNorm(DIM, elementwise_affine=True)
        self.norm.bias.requires_grad_(False)
        with torch.no_grad():
            self.norm.bias.zero_()
        # reference LayerNorm is gamma-only; emulate via zeroed frozen bias
        self.to_q = nn.Linear(DIM, inner, bias=False)
        self.to_kv = nn.Linear(DIM, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, DIM, bias=False)
        self.q_scale = nn.Parameter(torch.rand(DH) + 0.5)
        self.k_scale = nn.Parameter(torch.rand(DH) + 0.5)
        self.null_kv = nn.Parameter(torch.randn(HEADS, 2 * N_NULL, DH))

    def forward(self, x):
        b, n, _ = x.shape
        h = HEADS
        xn = F.layer_norm(x, (DIM,), self.norm.weight, None)
        q = self.to_q(xn).view(b, n, h, DH).transpose(1, 2)
        k, v = self.to_kv(xn).chunk(2, dim=-1)
        k = k.view(b, n, h, DH).transpose(1, 2)
        v = v.view(b, n, h, DH).transpose(1, 2)
        nkv = self.null_kv.view(h, N_NULL, 2, DH)
        nk = nkv[:, :, 0].unsqueeze(0).expand(b, -1, -1, -1)
        nv = nkv[:, :, 1].unsqueeze(0).expand(b, -1, -1, -1)
        k = torch.cat([nk, k], dim=2)
        v = torch.cat([nv, v], dim=2)
        q = F.normalize(q, dim=-1) * self.q_scale
        k = F.normalize(k, dim=-1) * self.k_scale
        sim = torch.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(DH)
        out = torch.einsum("bhij,bhjd->bhid", sim.softmax(-1), v)
        return self.to_out(out.transpose(1, 2).reshape(b, n, h * DH))


class TorchFF(nn.Module):
    def __init__(self):
        super().__init__()
        inner = int(4 * (2 / 3) * DIM)
        self.seq = nn.Sequential(
            nn.LayerNorm(DIM),
            nn.Linear(DIM, inner * 2, bias=False),
            nn.Identity(),  # placeholder for GEGLU slot (index parity)
            nn.Dropout(0.0),
            nn.Linear(inner, DIM, bias=False),
        )

    def forward(self, x):
        x = self.seq[0](x)
        x = self.seq[1](x)
        val, gate = x.chunk(2, dim=-1)
        return self.seq[4](F.gelu(gate) * val)


class TorchTower(nn.Module):
    """Oracle of CTViT3D (ctvit3d.py:175-490) with reference module paths."""

    def __init__(self):
        super().__init__()
        patch_dim = PT * P * P
        self.to_patch_emb = nn.Sequential(
            nn.Identity(),  # slot 0: Rearrange
            nn.LayerNorm(patch_dim),
            nn.Linear(patch_dim, DIM),
            nn.LayerNorm(DIM),
        )

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [
                        nn.ModuleList(
                            [nn.Identity(), TorchAttn(), nn.Identity(),
                             TorchFF()]
                        )
                        for _ in range(BLOCKS)
                    ]
                )

                class NormOut(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.gamma = nn.Parameter(torch.ones(DIM))

                    def forward(self, x):
                        return F.layer_norm(x, (DIM,), self.gamma, None)

                self.norm_out = NormOut()

            def forward(self, x):
                for _, attn, _, ff in self.layers:
                    x = attn(x) + x
                    x = ff(x) + x
                return self.norm_out(x)

        self.enc_3D = Enc()
        pos = sincos_pos_embed_3d(DIM, GRID)
        self.register_buffer("pos_embed", torch.tensor(pos).unsqueeze(0))

    def forward(self, video):
        b, c = video.shape[:2]
        t, hh, ww = GRID
        x = video.reshape(b, c, t, PT, hh, P, ww, P)
        x = x.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, t, hh, ww, c * PT * P * P
        )
        for m in self.to_patch_emb[1:]:
            x = m(x)
        x = x.reshape(b, t * hh * ww, DIM) + self.pos_embed
        x = self.enc_3D(x)
        return x.reshape(b, t, hh, ww, DIM)


def _build_pair(seed=0):
    torch.manual_seed(seed)
    tower = TorchTower().eval()
    hf_cfg = transformers.BertConfig(
        vocab_size=97, hidden_size=DIM, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2, hidden_act="gelu",
    )
    bert = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    to_text = nn.Linear(DIM, DIM, bias=False)
    to_visual = nn.Linear(DIM, DIM, bias=False)
    temp = nn.Parameter(torch.tensor(0.7))

    sd = {}
    for k, v in tower.state_dict().items():
        if "pos_embed" in k or ".norm.bias" in k:
            continue
        # map oracle FF Sequential (.seq.N) back to reference layout (.N)
        k = k.replace(".seq.", ".")
        # reference gamma-only LN inside attention stores param as norm.gamma
        k = k.replace(".1.norm.weight", ".1.norm.gamma")
        sd[f"visual_transformer.{k}"] = v
    for k, v in bert.state_dict().items():
        sd[f"text_transformer.{k}"] = v
    sd["to_text_latent.weight"] = to_text.weight
    sd["to_visual_latent.weight"] = to_visual.weight
    sd["temperature"] = temp

    bc = BertConfig(
        vocab_size=97, hidden_size=DIM, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2,
    )
    config = ExperimentConfig.from_dict(
        {
            "arch": {
                "dim": DIM, "image_size": IMG, "patch_size": P,
                "temporal_size": T, "temporal_patch_size": PT,
                "transformer_blocks": BLOCKS, "dim_head": DH, "heads": HEADS,
                "use_flash_attention": True,
            }
        }
    )
    model = build_ctclip(config, bert_config=bc, policy=FP32_POLICY,
                         dim_latent=DIM)
    params = convert_ctclip_state_dict(
        sd, transformer_blocks=BLOCKS, bert_config=bc
    )
    return tower, bert, to_text, to_visual, temp, model, params


def test_tower_tokens_parity():
    tower, _, _, _, _, model, params = _build_pair()
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 1, T, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.tensor(video)).numpy()
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(video),
                    method=CTCLIP.encode_image_tokens)
    )
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_clip_score_parity():
    tower, bert, to_text, to_visual, temp, model, params = _build_pair(seed=1)
    rng = np.random.default_rng(1)
    video = rng.standard_normal((2, 1, T, IMG, IMG)).astype(np.float32)
    ids = rng.integers(0, 97, (2, 11))
    mask = np.ones((2, 11), dtype=np.int64)

    with torch.no_grad():
        tokens = tower(torch.tensor(video))
        b = tokens.shape[0]
        img_lat = to_visual(tokens.reshape(b, -1, DIM)).mean(dim=1)
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
    np.testing.assert_allclose(ours, ref_score, atol=5e-5)

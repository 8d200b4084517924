"""Fallback tower parity: torch oracles of the reference's generic
TextTransformer / 2D VisionTransformer (ct_clip.py:167-455) vs
models/fallback.py with converted weights."""


import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.models import fallback as fb

DIM, DH, HEADS, DEPTH = 24, 8, 2, 2


class TLayerNorm(nn.Module):
    """ct_clip.py:167-176 (gamma-only, biased var, eps 1e-5 fp32)."""

    def __init__(self, dim):
        super().__init__()
        self.g = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = torch.var(x, dim=-1, unbiased=False, keepdim=True)
        mean = torch.mean(x, dim=-1, keepdim=True)
        return (x - mean) * (var + 1e-5).rsqrt() * self.g


def t_rotary(rot_dim, n):
    inv = 1.0 / (10000 ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    t = torch.arange(n).float()
    freqs = torch.einsum("i,j->ij", t, inv)
    return torch.cat((freqs, freqs), dim=-1)


def t_rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


def t_apply_rotary(freqs, t):
    rot = freqs.shape[-1]
    tr, tp = t[..., :rot], t[..., rot:]
    tr = tr * freqs.cos() + t_rotate_half(tr) * freqs.sin()
    return torch.cat((tr, tp), dim=-1)


class TAttention(nn.Module):
    """ct_clip.py:256-300."""

    def __init__(self, causal=False):
        super().__init__()
        inner = DH * HEADS
        self.causal = causal
        self.to_qkv = nn.Linear(DIM, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, DIM, bias=False),
                                    TLayerNorm(DIM))

    def forward(self, x, mask=None, rotary=None):
        b, n, _ = x.shape
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (t.view(b, n, HEADS, DH).transpose(1, 2)
                   for t in (q, k, v))
        q = q * (DH ** -0.5)
        if rotary is not None:
            q, k, v = (t_apply_rotary(rotary, t) for t in (q, k, v))
        sim = torch.einsum("bhid,bhjd->bhij", q, k)
        neg = -torch.finfo(sim.dtype).max
        if mask is not None:
            sim = sim.masked_fill(~mask[:, None, None, :].bool(), neg)
        if self.causal:
            cm = torch.ones(n, n, dtype=torch.bool).triu(1)
            sim = sim.masked_fill(cm, neg)
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        return self.to_out(out.transpose(1, 2).reshape(b, n, HEADS * DH))


class TFF(nn.Module):
    """ct_clip.py:240-254."""

    def __init__(self):
        super().__init__()
        inner = DIM * 4
        self.wi = nn.Linear(DIM, inner * 2, bias=False)
        self.ln = TLayerNorm(inner)
        self.wo = nn.Linear(inner, DIM, bias=False)

    def forward(self, x):
        x, gate = self.wi(x).chunk(2, dim=-1)
        return self.wo(self.ln(x * F.gelu(gate)))


class TTransformer(nn.Module):
    def __init__(self, causal=False):
        super().__init__()
        self.norm_in = TLayerNorm(DIM)
        self.norm_out = TLayerNorm(DIM)
        self.layers = nn.ModuleList()
        for _ in range(DEPTH):
            self.layers.append(nn.ModuleList([
                TLayerNorm(DIM), TAttention(causal),
                TLayerNorm(DIM), TFF(),
            ]))

    def forward(self, x, mask=None, rotary=None):
        x = self.norm_in(x)
        for pn_a, attn, pn_f, ff in self.layers:
            x = attn(pn_a(x), mask, rotary) + x
            x = ff(pn_f(x)) + x
        return self.norm_out(x)


def _convert_transformer(t: TTransformer):
    p = {"norm_in": {"g": t.norm_in.g.detach().numpy()},
         "norm_out": {"g": t.norm_out.g.detach().numpy()}}
    for i, (pn_a, attn, pn_f, ff) in enumerate(t.layers):
        p[f"pre_attn{i}"] = {"g": pn_a.g.detach().numpy()}
        p[f"pre_ff{i}"] = {"g": pn_f.g.detach().numpy()}
        p[f"attn{i}"] = {
            "to_qkv": {"kernel": attn.to_qkv.weight.detach().numpy().T},
            "to_out": {"kernel": attn.to_out[0].weight.detach().numpy().T},
            "out_norm": {"g": attn.to_out[1].g.detach().numpy()},
        }
        p[f"ff{i}"] = {
            "wi": {"kernel": ff.wi.weight.detach().numpy().T},
            "ln_inner": {"g": ff.ln.g.detach().numpy()},
            "wo": {"kernel": ff.wo.weight.detach().numpy().T},
        }
    return p


def test_rotary_matches_torch():
    for rot, n in ((8, 7), (32, 12)):
        ours = np.asarray(fb.rotary_freqs(rot, n))
        ref = t_rotary(rot, n).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)
    x = torch.randn(1, 2, 5, 8)
    fr = t_rotary(8, 5)
    ref = t_apply_rotary(fr, x).numpy()
    got = np.asarray(fb.apply_rotary_pos_emb(
        jnp.asarray(fr.numpy()), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("rotary,causal", [(False, False), (True, False),
                                           (False, True)])
def test_text_transformer_parity(rotary, causal):
    torch.manual_seed(0)
    vocab, max_len, n, b = 50, 16, 9, 2
    tt = TTransformer(causal=causal).eval()
    token_emb = nn.Embedding(vocab, DIM)
    abs_pos = nn.Embedding(max_len, DIM)
    cls = nn.Parameter(torch.randn(DIM))

    ids_np = np.random.default_rng(0).integers(0, vocab, (b, n))
    mask_np = np.ones((b, n), np.int64)
    mask_np[0, -3:] = 0

    with torch.no_grad():
        ids = torch.tensor(ids_np)
        mask = torch.tensor(mask_np)
        x = token_emb(ids)
        rot = None
        if not rotary:
            x = x + abs_pos(torch.arange(n))[None]
        if not causal:
            x = torch.cat(
                [cls[None, None].expand(b, 1, DIM), x], dim=1)
            mask = F.pad(mask, (1, 0), value=1)
        if rotary:
            rot = t_rotary(min(DH, 32), x.shape[1])
        ref = tt(x, mask=mask, rotary=rot).numpy()

    model = fb.TextTransformer(
        dim=DIM, num_tokens=vocab, max_seq_len=max_len, depth=DEPTH,
        dim_head=DH, heads=HEADS, rotary_pos_emb=rotary, causal=causal,
        policy=FP32_POLICY,
    )
    params = {
        "token_emb": {"embedding": token_emb.weight.detach().numpy()},
        "transformer": _convert_transformer(tt),
    }
    if not rotary:
        params["abs_pos_emb"] = {"embedding": abs_pos.weight.detach().numpy()}
    if not causal:
        params["cls_token"] = cls.detach().numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids_np),
                                 jnp.asarray(mask_np)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_vision_transformer_parity():
    torch.manual_seed(1)
    img, patch, c, b = 8, 4, 1, 2
    n = (img // patch) ** 2
    tt = TTransformer().eval()
    to_tokens = nn.Linear(c * patch * patch, DIM)
    pos = nn.Embedding(n, DIM)
    to_cls = nn.Linear(DIM, DIM, bias=False)

    imgs_np = np.random.default_rng(1).standard_normal(
        (b, c, img, img)).astype(np.float32)
    with torch.no_grad():
        x = torch.tensor(imgs_np)
        gh = img // patch
        x = x.view(b, c, gh, patch, gh, patch)
        x = x.permute(0, 2, 4, 3, 5, 1).reshape(b, n, patch * patch * c)
        x = to_tokens(x) + pos(torch.arange(n))[None]
        out = tt(x)
        cls_tok = to_cls(out.mean(dim=1))
        ref = torch.cat([cls_tok[:, None], out], dim=1).numpy()

    model = fb.VisionTransformer(
        dim=DIM, image_size=img, patch_size=patch, channels=c, depth=DEPTH,
        dim_head=DH, heads=HEADS, policy=FP32_POLICY,
    )
    params = {
        "to_tokens": {"kernel": to_tokens.weight.detach().numpy().T,
                      "bias": to_tokens.bias.detach().numpy()},
        "pos_emb": {"embedding": pos.weight.detach().numpy()},
        "to_cls": {"kernel": to_cls.weight.detach().numpy().T},
        "transformer": _convert_transformer(tt),
    }
    got = np.asarray(model.apply({"params": params}, jnp.asarray(imgs_np)))
    assert got.shape == (b, n + 1, DIM)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_patch_dropout_active_in_vision_tower():
    model = fb.VisionTransformer(
        dim=DIM, image_size=8, patch_size=4, channels=1, depth=1,
        dim_head=DH, heads=HEADS, patch_dropout=0.5, policy=FP32_POLICY,
    )
    imgs = jnp.ones((1, 1, 8, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    dropped = model.apply(
        {"params": params}, imgs, keep_all_patches=False,
        deterministic=False,
        rngs={"patch_dropout": jax.random.PRNGKey(1)},
    )
    # 4 patches → keeps max(1, int(4·0.5)) = 2, +1 CLS
    assert dropped.shape == (1, 3, DIM)
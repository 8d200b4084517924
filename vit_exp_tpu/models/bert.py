"""Flax BERT encoder — the text tower.

The reference uses HF `BertModel.from_pretrained('microsoft/BiomedVLP-CXR-
BERT-specialized')` (run_train.py:129-131) and consumes `output[0][:, 0, :]`
(the CLS hidden state, ct_clip.py:1300-1310).  Here the same architecture is
implemented natively in flax so it jits into the one XLA program with the
vision tower, plus `convert_hf_bert_params` to load any HF torch BERT
checkpoint (weights are fetched offline; nothing is downloaded here).

Behavior parity notes:
- token_type_ids default to zeros via the registered buffer
  (ct_clip.py:781-789 token_embedding) — reproduced by defaulting to zeros;
- attention_mask is the HF additive-mask convention;
- gelu is the exact erf form (HF "gelu");
- layernorm eps 1e-12 (HF default).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.models.layers import PDense, _logical_init


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def tiny(cls) -> "BertConfig":
        return cls(vocab_size=128, hidden_size=36, num_hidden_layers=2,
                   num_attention_heads=3, intermediate_size=64,
                   max_position_embeddings=64)


class _LayerNorm(nn.Module):
    eps: float
    policy: Policy

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones_init(), (dim,),
                           self.policy.param_dtype)
        beta = self.param("beta", nn.initializers.zeros_init(), (dim,),
                          self.policy.param_dtype)
        x32 = x.astype(self.policy.reduce_dtype)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        return (y * gamma + beta).astype(self.policy.compute_dtype)


class BertSelfAttention(nn.Module):
    config: BertConfig
    policy: Policy

    @nn.compact
    def __call__(self, x, additive_mask):
        cfg = self.config
        b, n, d = x.shape
        h = cfg.num_attention_heads
        dh = cfg.hidden_size // h

        def proj(name):
            y = PDense(cfg.hidden_size, axes=("embed", "heads"),
                       policy=self.policy, name=name)(x)
            return y.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = proj("query"), proj("key"), proj("value")
        logits = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh)
        if additive_mask is not None:
            logits = logits + additive_mask
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        return out


class BertLayer(nn.Module):
    config: BertConfig
    policy: Policy

    @nn.compact
    def __call__(self, x, additive_mask):
        cfg = self.config
        attn = BertSelfAttention(cfg, self.policy, name="self_attn")(
            x, additive_mask
        )
        attn = PDense(cfg.hidden_size, axes=("heads", "embed"),
                      policy=self.policy, name="attn_out")(attn)
        x = _LayerNorm(cfg.layer_norm_eps, self.policy, name="attn_norm")(x + attn)
        inter = PDense(cfg.intermediate_size, axes=("embed", "mlp"),
                       policy=self.policy, name="intermediate")(x)
        inter = nn.gelu(inter, approximate=False)
        out = PDense(cfg.hidden_size, axes=("mlp", "embed"),
                     policy=self.policy, name="output")(inter)
        return _LayerNorm(cfg.layer_norm_eps, self.policy, name="out_norm")(x + out)


class BertModel(nn.Module):
    config: BertConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Returns last_hidden_state (b, n, hidden)."""
        cfg = self.config
        b, n = input_ids.shape
        word = self.param(
            "word_embeddings",
            _logical_init(nn.initializers.normal(0.02), ("vocab", "embed")),
            (cfg.vocab_size, cfg.hidden_size), self.policy.param_dtype,
        )
        pos = self.param(
            "position_embeddings",
            _logical_init(nn.initializers.normal(0.02), (None, "embed")),
            (cfg.max_position_embeddings, cfg.hidden_size),
            self.policy.param_dtype,
        )
        typ = self.param(
            "token_type_embeddings",
            _logical_init(nn.initializers.normal(0.02), (None, "embed")),
            (cfg.type_vocab_size, cfg.hidden_size), self.policy.param_dtype,
        )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = word[input_ids] + pos[None, :n] + typ[token_type_ids]
        x = _LayerNorm(cfg.layer_norm_eps, self.policy, name="emb_norm")(
            x.astype(self.policy.compute_dtype)
        )

        additive_mask = None
        if attention_mask is not None:
            additive_mask = jnp.where(
                attention_mask[:, None, None, :].astype(bool),
                0.0, jnp.finfo(jnp.float32).min,
            ).astype(jnp.float32)

        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, self.policy, name=f"layer{i}")(x, additive_mask)
        return x


def convert_hf_bert_params(state_dict: Dict[str, Any], config: BertConfig):
    """Map an HF torch BertModel state_dict onto BertModel's param tree.

    Accepts tensors or numpy arrays; key layout is the HF `bert.` tree with or
    without the leading "bert." prefix.  Handles the token-type buffer quirk
    (ct_clip.py:781-789) implicitly: buffers are ignored, zeros are assumed.
    """

    def get(key):
        for k in (key, "bert." + key):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        raise KeyError(key)

    def linear(prefix):
        return {"kernel": get(prefix + ".weight").T, "bias": get(prefix + ".bias")}

    def ln(prefix):
        return {"gamma": get(prefix + ".weight"), "beta": get(prefix + ".bias")}

    params: Dict[str, Any] = {
        "word_embeddings": get("embeddings.word_embeddings.weight"),
        "position_embeddings": get("embeddings.position_embeddings.weight"),
        "token_type_embeddings": get("embeddings.token_type_embeddings.weight"),
        "emb_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "self_attn": {
                "query": linear(p + ".attention.self.query"),
                "key": linear(p + ".attention.self.key"),
                "value": linear(p + ".attention.self.value"),
            },
            "attn_out": linear(p + ".attention.output.dense"),
            "attn_norm": ln(p + ".attention.output.LayerNorm"),
            "intermediate": linear(p + ".intermediate.dense"),
            "output": linear(p + ".output.dense"),
            "out_norm": ln(p + ".output.LayerNorm"),
        }
    return params

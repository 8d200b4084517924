"""Flax BERT vs HF torch BertModel numerical parity (random weights,
converted via convert_hf_bert_params; SURVEY.md §7 hard-part #2)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.models.bert import BertConfig, BertModel, convert_hf_bert_params

transformers = pytest.importorskip("transformers")


def _hf_pair(seed=0):
    torch.manual_seed(seed)
    hf_cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_act="gelu",
    )
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=2,
    )
    params = convert_hf_bert_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_last_hidden_state_parity():
    hf, cfg, params = _hf_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, size=(2, 17))
    mask = np.ones((2, 17), dtype=np.int64)
    mask[1, 9:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    model = BertModel(cfg, policy=FP32_POLICY)
    ours = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_token_type_buffer_quirk():
    """token_type_ids default to zeros (ct_clip.py:781-789 buffer handling)."""
    hf, cfg, params = _hf_pair(seed=1)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 99, size=(1, 8))
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            token_type_ids=torch.zeros(1, 8, dtype=torch.long),
        ).last_hidden_state.numpy()
    model = BertModel(cfg, policy=FP32_POLICY)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)

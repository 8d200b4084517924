"""Report → multi-label classifier (text_classifier/classifier.py:5-18).

The reference wraps HF 'zzxslp/RadBERT-RoBERTa-4m' and a Linear head on the
POOLER output (tanh(W·CLS)).  Here the encoder is our flax BERT with
RoBERTa-style position indexing, a pooler layer, and a Dense head; weights
convert from any HF roberta/bert checkpoint via convert_hf_bert_params plus
the pooler mapping below.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import numpy as np

from vit_exp_tpu.core.precision import Policy, FP32_POLICY
from vit_exp_tpu.models.bert import BertConfig, BertModel, convert_hf_bert_params


class RadBertClassifier(nn.Module):
    config: BertConfig
    n_classes: int = 18
    roberta_positions: bool = True
    policy: Policy = FP32_POLICY

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        # RoBERTa position handling is entirely static: HF RoBERTa uses
        # position_ids = cumsum(mask)·mask + padding_idx(1), our BertModel
        # uses arange — the converter (convert_hf_radbert) slices the
        # position table by the offset, which is exact because padding is
        # trailing under max_length tokenization.  No runtime remap here.
        hidden = BertModel(self.config, policy=self.policy, name="encoder")(
            input_ids, attention_mask
        )
        pooled = nn.tanh(
            nn.Dense(self.config.hidden_size, name="pooler")(hidden[:, 0, :])
        )
        return nn.Dense(self.n_classes, name="classifier")(pooled)


def convert_hf_radbert(state_dict: Dict[str, Any], config: BertConfig,
                       n_classes: int, *, roberta: bool = True
                       ) -> Dict[str, Any]:
    """HF roberta/bert state_dict (+ classifier head) → flax params.

    roberta=True (RadBERT is RoBERTa-based) applies the position-offset fix;
    pass False for plain BERT checkpoints."""

    def np_(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    prefix = "model." if any(k.startswith("model.") for k in state_dict) else ""
    enc_sd = {
        k[len(prefix):].replace("roberta.", ""): v
        for k, v in state_dict.items()
        if not k.startswith("classifier")
    }
    params = {"encoder": convert_hf_bert_params(enc_sd, config)}
    if roberta:
        # HF Roberta position ids start at padding_idx+1 = 2; our encoder
        # indexes positions from 0 → drop the first two (pad-reserved) rows
        # (config.max_position_embeddings should be the HF value minus 2)
        table = np.asarray(params["encoder"]["position_embeddings"])
        params["encoder"]["position_embeddings"] = table[
            2:2 + config.max_position_embeddings
        ]
    for pool_key in ("pooler.dense", "bert.pooler.dense"):
        if f"{prefix}{pool_key}.weight" in state_dict:
            params["pooler"] = {
                "kernel": np_(state_dict[f"{prefix}{pool_key}.weight"]).T,
                "bias": np_(state_dict[f"{prefix}{pool_key}.bias"]),
            }
            break
    if "classifier.weight" in state_dict:
        params["classifier"] = {
            "kernel": np_(state_dict["classifier.weight"]).T,
            "bias": np_(state_dict["classifier.bias"]),
        }
    return params

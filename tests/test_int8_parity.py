"""End-to-end accuracy parity of the int8 serving path vs bf16/fp32.

Backs the int8-default serving configuration (bench.py / cli --int8): the
FULL quantized pipeline — W8A8 static-max attention, W8A8 fused qkv
prologue + out projection, W8A8 GEGLU-FF — must produce zero-shot
pathology probabilities within a tight envelope of the fp32 engine on the
same weights, so throughput gains never silently trade away AUROC.
Kernels run in interpret mode on CPU (same kernel code the TPU compiles).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_trainer_e2e import _config
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.factory import build_ctclip


def test_int8_serving_probs_match_fp32(tmp_path):
    import flax.linen as nn

    config = _config(tmp_path)
    tok = HashTokenizer(vocab_size=128, max_length=12)
    kwargs = dict(bert_config=BertConfig.tiny(), policy=FP32_POLICY,
                  dim_latent=16)
    model_fp = build_ctclip(config, **kwargs)
    model_i8 = build_ctclip(config, attn_impl="pallas_static_int8",
                            ff_impl="pallas_int8", fuse_qkv=True, **kwargs)

    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    params = nn.unbox(
        model_fp.init(jax.random.PRNGKey(0), video,
                      jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]

    paths = ["nodule", "effusion", "edema"]
    eng_fp = ZeroShotClassifier(model_fp, params, tok, pathologies=paths,
                                max_text_len=12, batch_size=2)
    eng_i8 = ZeroShotClassifier(model_i8, params, tok, pathologies=paths,
                                max_text_len=12, batch_size=2)
    rng = np.random.default_rng(0)
    vols = rng.uniform(-1, 1, (2, 1, 8, 8, 8)).astype(np.float32)
    p_fp = eng_fp.predict_batch(vols)
    p_i8 = eng_i8.predict_batch(vols)
    assert p_fp.shape == p_i8.shape == (2, 3)
    # probability-space parity envelope: quantization noise must not move
    # any softmaxed pathology probability by more than 2 points
    assert np.abs(p_fp - p_i8).max() < 0.02, np.abs(p_fp - p_i8).max()


def test_int8_serving_probs_match_fp32_heads_packed(tmp_path):
    """Same parity envelope through the HEADS-PACKED serving attention:
    dim_head=32 / heads=4 (inner=128) satisfies the hp gate
    (models/ctvit3d.py::_packed_int8_attention), so the whole quantized
    pipeline runs the zero-relayout kernels the production shape uses."""
    import flax.linen as nn

    from vit_exp_tpu.ops.flash_attention import hp_supported

    config = _config(tmp_path)
    config.arch.dim_head = 32
    config.arch.heads = 4
    n_tokens = (config.arch.image_size // config.arch.patch_size) ** 2 * (
        config.arch.temporal_size // config.arch.temporal_patch_size)
    assert hp_supported(n_tokens, n_tokens, 4, 32)  # gate really engages

    tok = HashTokenizer(vocab_size=128, max_length=12)
    kwargs = dict(bert_config=BertConfig.tiny(), policy=FP32_POLICY,
                  dim_latent=16)
    model_fp = build_ctclip(config, **kwargs)
    model_i8 = build_ctclip(config, attn_impl="pallas_static_int8",
                            ff_impl="pallas_int8", fuse_qkv=True, **kwargs)

    video = jnp.ones((1, 1, 8, 8, 8), jnp.float32)
    params = nn.unbox(
        model_fp.init(jax.random.PRNGKey(0), video,
                      jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all)
    )["params"]

    paths = ["nodule", "effusion", "edema"]
    eng_fp = ZeroShotClassifier(model_fp, params, tok, pathologies=paths,
                                max_text_len=12, batch_size=2)
    eng_i8 = ZeroShotClassifier(model_i8, params, tok, pathologies=paths,
                                max_text_len=12, batch_size=2)
    rng = np.random.default_rng(3)
    vols = rng.uniform(-1, 1, (2, 1, 8, 8, 8)).astype(np.float32)
    p_fp = eng_fp.predict_batch(vols)
    p_i8 = eng_i8.predict_batch(vols)
    assert np.abs(p_fp - p_i8).max() < 0.02, np.abs(p_fp - p_i8).max()


def test_int8_rejects_naive_scale_convention(tmp_path):
    """The factory's naive-path convention (attn_scale=8) must be refused
    by the quantized kernel (ADVICE round-1: docstring-only guard)."""
    from vit_exp_tpu.ops.attention import cosine_attention

    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 8, 4)), jnp.float32)
               for _ in range(3))
    with pytest.raises(ValueError, match="scale convention"):
        cosine_attention(q, k, v, scale=8.0, impl="pallas",
                         static_max=True, quantized=True)

"""Config-named eval hook factory tests."""


import jax
import jax.numpy as jnp

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.data.synthetic import (
    SyntheticCTDataset,
    SyntheticInferenceDataset,
)
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.eval.hooks import build_eval_hooks
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.factory import build_ctclip


def test_build_and_run_hooks(tmp_path):
    config = ExperimentConfig.from_dict(
        {
            "results_folder": str(tmp_path),
            "arch": {
                "dim": 24, "image_size": 8, "patch_size": 4,
                "temporal_size": 8, "temporal_patch_size": 4,
                "transformer_blocks": 1, "dim_head": 4, "heads": 2,
            },
            "ct_clip_arch": {
                "use_seg": True,
                "seg_head": {"head_out_dim": 2, "head_in_dim": 24},
                "use_open_seg": True,
                "open_seg_head": {"out_dim": 8, "in_dim": 24},
                "open_text_head": {"out_dim": 8, "in_dim": 36},
                "open_seg_loss_down_factor": 2,
            },
            "valid_test_list": [
                "ctclip_image_report_zero_shot_cls_test",
                "radgenome_image_seg_test",
            ],
            "sample_test_list": [
                "radgenome_image_open_seg_test_ten_images",
            ],
        }
    )
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    params = __import__("flax.linen", fromlist=["linen"]).unbox(
        model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 1, 8, 8, 8), jnp.float32),
            jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all,
        )
    )["params"]

    cls_ds = SyntheticInferenceDataset(4, arch=config.arch, n_labels=2)
    seg_ds = SyntheticCTDataset("imageseg", n=2, arch=config.arch, n_classes=2)
    open_ds = SyntheticCTDataset("imageopenseg", n=2, arch=config.arch,
                                 tokenizer=tok, n_classes=2, max_text_len=12)
    hooks = build_eval_hooks(
        config, model, tok, cls_dataset=cls_ds, seg_dataset=seg_ds,
        open_seg_dataset=open_ds,
    )
    assert len(hooks["eval_hooks"]) == 2
    assert len(hooks["sample_hooks"]) == 1

    # the cls hook uses the 18-pathology defaults but only 2 labels exist in
    # the synthetic set → restrict pathologies
    from vit_exp_tpu.eval.hooks import make_zero_shot_cls_hook

    cls_hook = make_zero_shot_cls_hook(
        model, tok, cls_ds, pathologies=["nodule", "effusion"],
        max_text_len=12,
    )
    res = cls_hook(params)
    assert "mean_auc" in res

    seg_res = hooks["eval_hooks"]["radgenome_image_seg_test"](params)
    assert "mean_dice" in seg_res

    vis = hooks["sample_hooks"]["radgenome_image_open_seg_test_ten_images"](
        params, 1
    )
    assert len(vis) > 0

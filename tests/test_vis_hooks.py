"""Visual-sampling hook + slice grid tests."""

import os

import numpy as np

import jax

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.core.precision import FP32_POLICY
from vit_exp_tpu.data.synthetic import SyntheticCTDataset
from vit_exp_tpu.data.tokenizer import HashTokenizer
from vit_exp_tpu.models.bert import BertConfig
from vit_exp_tpu.models.factory import build_ctclip
from vit_exp_tpu.utils.vis import slice_grid_3d, vis_3d_img_list


def test_slice_grid_shapes():
    vol = np.random.default_rng(0).uniform(0, 1, (8, 10, 12))
    grid = slice_grid_3d(vol)
    # slices: (10,12), (8,12), (8,10) → cell (10, 12); 3 rows × 3 cols
    assert grid.shape == (30, 36)
    assert 0.0 <= grid.min() and grid.max() <= 1.0
    d = vis_3d_img_list([vol, vol], img_name="v")
    assert set(d) == {"v_0", "v_1"}


def test_open_seg_vis_hook(tmp_path):
    config = ExperimentConfig.from_dict(
        {
            "arch": {
                "dim": 24, "image_size": 8, "patch_size": 4,
                "temporal_size": 8, "temporal_patch_size": 4,
                "transformer_blocks": 1, "dim_head": 4, "heads": 2,
            },
            "ct_clip_arch": {
                "use_open_seg": True,
                "open_seg_head": {"out_dim": 8, "in_dim": 24},
                "open_text_head": {"out_dim": 8, "in_dim": 36},
                "open_seg_loss_down_factor": 2,
            },
        }
    )
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    import flax.linen as nn
    import jax.numpy as jnp

    from vit_exp_tpu.eval.vis_hooks import make_open_seg_vis_hook
    from vit_exp_tpu.models.ctclip import CTCLIP

    params = nn.unbox(
        model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 1, 8, 8, 8), jnp.float32),
            jnp.ones((1, 12), jnp.int32), method=CTCLIP.init_all,
        )
    )["params"]
    tok = HashTokenizer(vocab_size=128, max_length=12)
    ds = SyntheticCTDataset("imageopenseg", n=2, arch=config.arch,
                            tokenizer=tok, n_classes=2, max_text_len=12)
    hook = make_open_seg_vis_hook(model, ds, out_dir=str(tmp_path), n_samples=1)
    out = hook(params, step=5)
    assert len(out) == 6  # 1 sample × 2 classes × {img, sim, gt}
    assert all(os.path.getsize(p) > 0 for p in out.values())

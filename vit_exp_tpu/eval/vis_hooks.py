"""In-training visual sampling hooks.

Parity with the trainer's sample_val hooks (CTCLIPTrainer.py:49-84
radgenome_image_open_seg_test_ten_images + ct_clip.py:1140-1186 vis path):
every sample_val_every steps, run the open-seg forward on a few validation
volumes, compute per-class cosine similarity maps, and emit 3-plane slice
grids (utils/vis.py) for [downsampled image, similarity, gt mask] per class.
Images are saved as PNGs under the results folder (wandb.Image upload when
wandb is importable is handled by the logger layer).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vit_exp_tpu.models.ctclip import CTCLIP, downsample_stride
from vit_exp_tpu.models.losses import cosine_similarity
from vit_exp_tpu.utils.vis import slice_grid_3d


def _save_png(path: str, img: np.ndarray):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(img, cmap="gray")
    ax.axis("off")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def make_open_seg_vis_hook(
    model: CTCLIP,
    dataset,
    *,
    out_dir: str,
    n_samples: int = 3,
    down_factor: Optional[int] = None,
) -> Callable:
    """Returns hook(params, step) → {name: png_path}."""

    @jax.jit
    def forward(params, video, prompt_ids, prompt_mask):
        return model.apply(
            {"params": params}, video, prompt_ids, prompt_mask,
            method=CTCLIP.open_seg_forward,
        )

    def hook(params, step: int = 0) -> Dict[str, str]:
        os.makedirs(out_dir, exist_ok=True)
        out: Dict[str, str] = {}
        factor = down_factor or model.clip_arch.open_seg_loss_down_factor
        for s in range(min(n_samples, len(dataset))):
            item = dataset[s]
            video = jnp.asarray(item["image"][None])
            res = forward(
                params, video, jnp.asarray(item["prompt_ids"]),
                jnp.asarray(item.get("prompt_mask")),
            )
            seg_preds = res["seg_preds"]          # (1, L, h)
            prompt_logits = res["prompt_logits"]  # (1, C, h)
            mask = downsample_stride(
                jnp.asarray(item["seg_mask"][None]), factor
            )
            down_img = downsample_stride(video, factor)[0, 0]
            d, w, h = mask.shape[2:]
            for c in range(prompt_logits.shape[1]):
                sim = (
                    cosine_similarity(
                        seg_preds, prompt_logits[:, c][:, None, :]
                    ) + 1.0
                ) / 2.0
                sim_vol = np.asarray(sim[0].reshape(d, w, h))
                for name, vol in (
                    ("img", np.asarray(down_img)),
                    ("sim", sim_vol),
                    ("gt", np.asarray(mask[0, c])),
                ):
                    grid = slice_grid_3d(vol)
                    path = os.path.join(
                        out_dir,
                        f"step{step}_sample{s}_class{c}_{name}.png",
                    )
                    _save_png(path, grid)
                    out[f"sample{s}_class{c}_{name}"] = path
        return out

    return hook

"""Host-side sample loading used by datasets (numpy; device work is in
ops/preprocess.py).

npz layout matches the reference's offline output: arr_0 of shape (D, H, W)
for volumes (preprocess_ctrate_train.py:105-117) and (C, D, H, W) for masks
(data_process_scripts/mask_full.py:31-80)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from vit_exp_tpu.ops.preprocess import (
    RUNTIME_TARGET_HWD,
    preprocess_mask_numpy,
    preprocess_runtime_numpy,
)


def load_npz_volume(path: str) -> np.ndarray:
    with np.load(path) as data:
        return data["arr_0"]


def runtime_volume(
    img_dhw: np.ndarray, target_hwd: Tuple[int, int, int] = RUNTIME_TARGET_HWD
) -> np.ndarray:
    """(D, H, W) stored npz → (1, 240, 480, 480) model input."""
    return preprocess_runtime_numpy(img_dhw, target_hwd)


def runtime_mask(
    mask_cdhw: np.ndarray, target_dhw: Tuple[int, int, int] = (240, 480, 480)
) -> np.ndarray:
    return preprocess_mask_numpy(mask_cdhw, target_dhw)

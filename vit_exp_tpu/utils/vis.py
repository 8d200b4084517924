"""3D volume visualization — slice grids for logging.

Parity with CT_CLIP/ct_clip/utils.py:11-91 (vis_3d_img_list): slice each 3D
volume at ratios [0.25, 0.5, 0.75] along each of the three axes, tile the
nine slices into one 2D grid per volume, normalize to [0, 1].  Returns
numpy images (the logger decides whether they become wandb.Image or PNGs).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

RATIOS = (0.25, 0.5, 0.75)


def _norm01(img: np.ndarray) -> np.ndarray:
    lo, hi = float(img.min()), float(img.max())
    if hi - lo < 1e-12:
        return np.zeros_like(img)
    return (img - lo) / (hi - lo)


def slice_grid_3d(volume: np.ndarray, ratios: Sequence[float] = RATIOS
                  ) -> np.ndarray:
    """(D, H, W) volume → one 2D grid image: rows = axes, cols = ratios.

    Slices are zero-padded to a common (max_h, max_w) cell before tiling.
    """
    volume = np.asarray(volume)
    assert volume.ndim == 3, volume.shape
    d, h, w = volume.shape
    cells: List[List[np.ndarray]] = []
    for axis, size in enumerate((d, h, w)):
        row = []
        for r in ratios:
            idx = int(size * r)
            sl = np.take(volume, idx, axis=axis)
            row.append(_norm01(sl))
        cells.append(row)
    cell_h = max(c.shape[0] for row in cells for c in row)
    cell_w = max(c.shape[1] for row in cells for c in row)
    grid = np.zeros((3 * cell_h, len(ratios) * cell_w), dtype=np.float32)
    for i, row in enumerate(cells):
        for j, c in enumerate(row):
            grid[i * cell_h:i * cell_h + c.shape[0],
                 j * cell_w:j * cell_w + c.shape[1]] = c
    return grid


def vis_3d_img_list(volumes: Sequence[np.ndarray], img_name: str = "vol"
                    ) -> Dict[str, np.ndarray]:
    """List of (D, H, W) arrays → {f"{img_name}_{i}": grid image}."""
    return {
        f"{img_name}_{i}": slice_grid_3d(np.asarray(v))
        for i, v in enumerate(volumes)
    }

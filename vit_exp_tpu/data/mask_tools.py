"""Offline mask alignment / integrity utilities.

Capability parity with data_process_scripts/ (SURVEY.md §2.4):
- align_mask_to_image (mask_full.py:31-80): find the scan-level mask for a
  train image, transpose (0,3,1,2), trilinear-resize to the image shape on
  mismatch, save compressed;
- reorder_mask (correct_order.py:12-19): transpose (0,3,1,2) re-save;
- flip_mask_by_metadata (flip_img.py:17-60): orientation fix from metadata
  spacing/rows/cols;
- check_npz_tree (check_load_npz.py:5-33): parallel load-test of every npz;
- compare_name_sets (demo_tests/compare_names.py): img/mask set diff.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Tuple

import numpy as np


def _resize_mask_trilinear(mask_cdhw: np.ndarray, target_dhw) -> np.ndarray:
    import jax.numpy as jnp

    from vit_exp_tpu.ops.preprocess import resize_trilinear

    out = resize_trilinear(jnp.asarray(mask_cdhw, jnp.float32), target_dhw)
    return np.asarray(out)


def reorder_mask(mask: np.ndarray) -> np.ndarray:
    """(C, H, W, D) → (C, D, H, W) (correct_order.py:12-19)."""
    assert mask.ndim == 4
    return np.transpose(mask, (0, 3, 1, 2))


def align_mask_to_image(
    mask: np.ndarray, image_shape_dhw: Tuple[int, int, int],
    *, reorder: bool = True, binarize: bool = True,
) -> np.ndarray:
    """Scan-level mask → image-aligned (C, D, H, W) (mask_full.py:55-80):
    the (0,3,1,2) reorder is UNCONDITIONAL (the reference transposes
    before any shape comparison — a cubic mask must still reorder), and
    post-resize binarization is astype(bool), i.e. ANY nonzero
    interpolated value is foreground (not a 0.5 threshold)."""
    if reorder:
        mask = reorder_mask(mask)
    if mask.shape[1:] != tuple(image_shape_dhw):
        mask = _resize_mask_trilinear(mask, image_shape_dhw)
        if binarize:
            mask = (mask != 0).astype(np.float32)
    return mask.astype(np.float32)


def flip_mask_by_metadata(
    mask: np.ndarray, *, z_flip: bool = False, xy_transpose: bool = False,
) -> np.ndarray:
    """Orientation fixes derived from metadata (flip_img.py:17-60): optional
    z-axis flip and/or in-plane transpose."""
    out = mask
    if z_flip:
        out = out[:, ::-1]
    if xy_transpose:
        out = np.transpose(out, (0, 1, 3, 2))
    return np.ascontiguousarray(out)


def check_npz_tree(root: str, workers: int = 8) -> Dict[str, str]:
    """Load-test every npz under root; returns {path: error} for failures
    (check_load_npz.py:5-33)."""
    paths: List[str] = []
    for dirpath, _, names in os.walk(root):
        paths += [os.path.join(dirpath, n) for n in names
                  if n.endswith(".npz")]

    def check(path):
        try:
            with np.load(path) as d:
                _ = d["arr_0"].shape
            return path, None
        except Exception as e:
            return path, str(e)

    failures = {}
    with ThreadPoolExecutor(workers) as pool:
        for path, err in pool.map(check, paths):
            if err:
                failures[path] = err
    return failures


def compare_name_sets(
    img_folder: str, mask_folder: str, strip=lambda name: name
) -> Dict[str, List[str]]:
    """Set diff of npz basenames between two trees (compare_names.py)."""

    def names(root):
        out = set()
        for dirpath, _, files in os.walk(root):
            out |= {strip(f) for f in files if f.endswith(".npz")}
        return out

    imgs, masks = names(img_folder), names(mask_folder)
    return {
        "img_only": sorted(imgs - masks),
        "mask_only": sorted(masks - imgs),
        "common": sorted(imgs & masks),
    }


def copy_tree_parallel(
    src_root: str, dst_root: str, workers: int = 8,
    skip_existing: bool = True,
) -> int:
    """Thread-pool recursive tree copy (copy_multi_process.py:5-31 /
    copy_multi_process_az.py) — dataset staging onto fast local disk.
    Returns the number of files copied; existing same-size files are
    skipped so interrupted copies resume."""
    import shutil

    jobs: List[tuple] = []
    for dirpath, _, names in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        out_dir = os.path.join(dst_root, rel) if rel != "." else dst_root
        os.makedirs(out_dir, exist_ok=True)
        for n in names:
            src = os.path.join(dirpath, n)
            dst = os.path.join(out_dir, n)
            if (skip_existing and os.path.exists(dst)
                    and os.path.getsize(dst) == os.path.getsize(src)):
                continue
            jobs.append((src, dst))

    def copy(job):
        shutil.copyfile(job[0], job[1])
        return 1

    with ThreadPoolExecutor(workers) as pool:
        return sum(pool.map(copy, jobs))

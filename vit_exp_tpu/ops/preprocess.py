"""CT preprocessing chain as fused on-device XLA ops.

Replaces the reference's two-stage numpy/torch pipeline (native-kernel
obligation #3, SURVEY.md §2.9):

offline (data_preprocess/preprocess_ctrate_train.py:69-117):
  HU rescale slope·x+intercept → clip [-1000, 1000] → /1000 fp32 →
  transpose (H,W,D)→(D,H,W) → trilinear resample to spacing
  (z 1.5, x/y 0.75) with F.interpolate(align_corners=False) semantics.

runtime (scripts/data.py:49-111 npz_to_tensor):
  load (D,H,W) npz → transpose to (H,W,D) → clip [-1,1] → min-max to [0,1]
  → center crop/pad to (480,480,240) with pad value −1 (yes, −1 in the
  [0,1]-normalized space — reference quirk, reproduced) → permute to
  (1, 240, 480, 480).

The trilinear resample is implemented separably (three 1-D lerps) — exactly
equal to trilinear interpolation and much cheaper than 8-corner gathers;
XLA fuses the clip/normalize into the gathers.  Each distinct input shape
compiles once; loaders bucket shapes to bound retracing.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SPACING = (1.5, 0.75, 0.75)  # (z, x, y)
RUNTIME_TARGET_HWD = (480, 480, 240)


def hu_normalize(img: jnp.ndarray, slope: float, intercept: float) -> jnp.ndarray:
    """HU rescale + window: clip [-1000, 1000], scale to [-1, 1] fp32."""
    x = img.astype(jnp.float32) * slope + intercept
    return jnp.clip(x, -1000.0, 1000.0) / 1000.0


def _axis_lerp(x: jnp.ndarray, new_size: int, axis: int) -> jnp.ndarray:
    """1-D linear resize along `axis`, align_corners=False (torch/PIL
    convention): src = (i + 0.5) * in/out − 0.5, edges clamped."""
    in_size = x.shape[axis]
    if in_size == new_size:
        return x
    scale = in_size / new_size
    src = (jnp.arange(new_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w = (src - i0.astype(jnp.float32))
    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = new_size
    w = w.reshape(shape)
    return lo * (1.0 - w) + hi * w


def resize_trilinear(x: jnp.ndarray, new_shape: Sequence[int]) -> jnp.ndarray:
    """Trilinear resize of the LAST THREE axes to new_shape; separable."""
    offset = x.ndim - 3
    for i, size in enumerate(new_shape):
        x = _axis_lerp(x, int(size), axis=offset + i)
    return x


def spacing_resample_shape(
    shape_dhw: Sequence[int], current_spacing: Sequence[float],
    target_spacing: Sequence[float] = TARGET_SPACING,
) -> Tuple[int, int, int]:
    """new_shape[i] = int(orig[i] * current/target) (resize_array semantics,
    preprocess_ctrate_train.py:45-67: truncation, not rounding)."""
    return tuple(
        int(shape_dhw[i] * current_spacing[i] / target_spacing[i])
        for i in range(3)
    )


@functools.partial(jax.jit, static_argnames=("new_shape",))
def _preprocess_offline_volume(img_hwd, slope, intercept, new_shape):
    x = hu_normalize(img_hwd, slope, intercept)
    x = jnp.transpose(x, (2, 0, 1))  # (D, H, W)
    return resize_trilinear(x, new_shape)


def preprocess_offline_volume(
    img_hwd: jnp.ndarray, *, slope: float, intercept: float,
    new_shape: Tuple[int, int, int],
) -> jnp.ndarray:
    """Offline stage on device: (H, W, D) raw → (D', H', W') normalized.

    slope/intercept are traced scalars (DICOM rescale pairs vary across
    scanner vendors; baking them in statically would force one 1-2 min
    remote recompile per distinct pair) — only shapes key the compile."""
    return _preprocess_offline_volume(
        img_hwd, jnp.float32(slope), jnp.float32(intercept),
        tuple(int(s) for s in new_shape))


def _center_crop_pad_1d(size: int, target: int) -> Tuple[int, int, int]:
    """(crop_start, kept, pad_before) for one axis (data.py:74-100 math)."""
    start = max((size - target) // 2, 0)
    kept = min(start + target, size) - start
    pad_before = (target - kept) // 2
    return start, kept, pad_before


def crop_pad_hwd(
    x_hwd: jnp.ndarray, target_hwd: Tuple[int, int, int] = RUNTIME_TARGET_HWD,
    pad_value: float = -1.0,
) -> jnp.ndarray:
    """Center crop/pad (H, W, D) to target; pad with −1 (data.py:74-100)."""
    slices, pads = [], []
    for ax in range(3):
        start, kept, before = _center_crop_pad_1d(x_hwd.shape[ax], target_hwd[ax])
        slices.append(slice(start, start + kept))
        pads.append((before, target_hwd[ax] - kept - before))
    x = x_hwd[tuple(slices)]
    return jnp.pad(x, pads, constant_values=pad_value)


@functools.partial(jax.jit, static_argnames=("target_hwd",))
def preprocess_runtime_volume(
    img_dhw: jnp.ndarray, target_hwd: Tuple[int, int, int] = RUNTIME_TARGET_HWD,
) -> jnp.ndarray:
    """Runtime stage on device: stored (D, H, W) npz → (1, 240, 480, 480).

    Matches npz_to_tensor (data.py:49-111): transpose to (H, W, D), clip to
    [-1, 1], min-max to [0, 1], center crop/pad (pad −1), permute to
    (D, H, W), add channel axis.
    """
    x = jnp.transpose(img_dhw.astype(jnp.float32), (1, 2, 0))  # (H, W, D)
    x = jnp.clip(x, -1.0, 1.0)
    x = (x + 1.0) / 2.0
    x = crop_pad_hwd(x, target_hwd, pad_value=-1.0)
    x = jnp.transpose(x, (2, 0, 1))  # (D, H, W)
    return x[None]


def preprocess_runtime_numpy(
    img_dhw: np.ndarray, target_hwd: Tuple[int, int, int] = RUNTIME_TARGET_HWD,
) -> np.ndarray:
    """Pure-numpy twin of preprocess_runtime_volume for host-side loaders."""
    x = np.transpose(img_dhw.astype(np.float32), (1, 2, 0))
    x = np.clip(x, -1.0, 1.0)
    x = (x + 1.0) / 2.0
    out = np.full(target_hwd, -1.0, dtype=np.float32)
    src_slices, dst_slices = [], []
    for ax in range(3):
        start, kept, before = _center_crop_pad_1d(x.shape[ax], target_hwd[ax])
        src_slices.append(slice(start, start + kept))
        dst_slices.append(slice(before, before + kept))
    out[tuple(dst_slices)] = x[tuple(src_slices)]
    return np.transpose(out, (2, 0, 1))[None]


def preprocess_mask_numpy(
    mask_cdhw: np.ndarray,
    target_dhw: Tuple[int, int, int] = (240, 480, 480),
) -> np.ndarray:
    """Runtime mask crop/pad: (C, D, H, W) → (C, 240, 480, 480), pad 0
    (npz_mask_to_tensor semantics, data.py:182-234)."""
    c = mask_cdhw.shape[0]
    out = np.zeros((c,) + tuple(target_dhw), dtype=np.float32)
    src_slices, dst_slices = [slice(None)], [slice(None)]
    for ax in range(3):
        start, kept, before = _center_crop_pad_1d(
            mask_cdhw.shape[ax + 1], target_dhw[ax]
        )
        src_slices.append(slice(start, start + kept))
        dst_slices.append(slice(before, before + kept))
    out[tuple(dst_slices)] = mask_cdhw[tuple(src_slices)].astype(np.float32)
    return out

"""Minimal self-contained NIfTI-1 reader (nibabel is not available here).

Reads .nii / .nii.gz volumes the way nib.load().get_fdata() does for the
CT-RATE files the reference preprocesses (data_preprocess/
preprocess_ctrate_train.py:27-43): little/big-endian NIfTI-1, scl_slope/
scl_inter applied, data returned in (x, y, z) Fortran-style axis order.
Supports the dtypes CT data ships in (int16/uint16/int32/float32/float64).
"""

from __future__ import annotations

import gzip
import struct
from typing import Tuple

import numpy as np

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
    64: np.float64, 256: np.int8, 512: np.uint16, 768: np.uint32,
}


def read_nifti_shape(path: str) -> tuple:
    """Header-only shape read (first 348 bytes) — cheap dataset filters
    without decompressing the voxel payload."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read(348)
    sizeof_hdr = struct.unpack("<i", raw[:4])[0]
    endian = "<"
    if sizeof_hdr != 348:
        if struct.unpack(">i", raw[:4])[0] != 348:
            raise ValueError(f"{path}: not a NIfTI-1 file")
        endian = ">"
    dim = struct.unpack(endian + "8h", raw[40:56])
    return tuple(dim[1:1 + dim[0]])


def read_nifti(path: str) -> np.ndarray:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()

    sizeof_hdr = struct.unpack("<i", raw[:4])[0]
    endian = "<"
    if sizeof_hdr != 348:
        sizeof_hdr = struct.unpack(">i", raw[:4])[0]
        if sizeof_hdr != 348:
            raise ValueError(f"{path}: not a NIfTI-1 file")
        endian = ">"

    dim = struct.unpack(endian + "8h", raw[40:56])
    ndim = dim[0]
    shape = tuple(dim[1:1 + ndim])
    datatype = struct.unpack(endian + "h", raw[70:72])[0]
    if datatype not in _DTYPES:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    scl_slope = struct.unpack(endian + "f", raw[112:116])[0]
    scl_inter = struct.unpack(endian + "f", raw[116:120])[0]
    vox_offset = int(struct.unpack(endian + "f", raw[108:112])[0])

    dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
    count = int(np.prod(shape))
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=vox_offset)
    data = data.reshape(shape, order="F")
    # NIfTI-1 scaling semantics (nibabel parity): slope==0 or NaN means
    # UNSCALED — the intercept is ignored too, not applied on its own
    import math

    if (scl_slope not in (0.0, 1.0) or scl_inter != 0.0) and not (
            math.isnan(scl_slope) or scl_slope == 0.0
            or math.isnan(scl_inter)):
        data = data.astype(np.float64) * scl_slope + scl_inter
    return np.asarray(data)


def read_nifti_spacing(path: str) -> Tuple[np.ndarray, Tuple[float, ...]]:
    """(data, pixdim spacing per axis)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read(256)
    endian = "<" if struct.unpack("<i", raw[:4])[0] == 348 else ">"
    dim = struct.unpack(endian + "8h", raw[40:56])
    pixdim = struct.unpack(endian + "8f", raw[76:108])
    spacing = tuple(float(p) for p in pixdim[1:1 + dim[0]])
    return read_nifti(path), spacing

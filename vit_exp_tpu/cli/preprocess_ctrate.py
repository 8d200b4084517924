"""Offline CT-RATE preprocessing CLI — data_preprocess/preprocess_ctrate_*.py.

Usage:
    python -m vit_exp_tpu.cli.preprocess_ctrate --src dir_of_nii_gz \
        --metadata metadata.csv --out out_dir [--split train] [--workers 8] \
        [--device]

Per volume (preprocess_ctrate_train.py:69-117): HU rescale slope·x+intercept
from the metadata CSV, clip [-1000,1000], /1000 fp32, transpose to (D,H,W),
trilinear resample to spacing (z 1.5, xy 0.75), save npz into the
{split}_{patient}/{patient}{scan}/ tree.  --device runs the
normalize+resample fused on the TPU (ops/preprocess.py) instead of host
numpy; IO and NIfTI decode stay on worker threads either way (our own
NIfTI-1 reader, data/nifti.py — nibabel-free).
"""

from __future__ import annotations

import argparse
import ast
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _parse_xy_spacing(value) -> float:
    # metadata stores XYSpacing like "[0.75, 0.75]" (string)
    if isinstance(value, str):
        return float(ast.literal_eval(value)[0])
    return float(value)


def process_file(path, row, out_root, split, device=False):
    from vit_exp_tpu.data.nifti import read_nifti
    from vit_exp_tpu.ops import preprocess as pp

    img = read_nifti(path)  # (H, W, D) fortran-order data
    slope = float(row["RescaleSlope"])
    intercept = float(row["RescaleIntercept"])
    xy = _parse_xy_spacing(row["XYSpacing"])
    z = float(row["ZSpacing"])
    d, h, w = img.shape[2], img.shape[0], img.shape[1]
    new_shape = pp.spacing_resample_shape((d, h, w), (z, xy, xy))

    if device:
        import jax.numpy as jnp

        out = np.asarray(
            pp.preprocess_offline_volume(
                jnp.asarray(img, jnp.float32), slope=slope,
                intercept=intercept, new_shape=new_shape,
            )
        )
    else:
        x = np.clip(img.astype(np.float32) * slope + intercept, -1000, 1000)
        x = (x / 1000.0).astype(np.float32).transpose(2, 0, 1)
        import jax.numpy as jnp

        out = np.asarray(pp.resize_trilinear(jnp.asarray(x), new_shape))

    name = os.path.basename(path)
    parts = name.split("_")
    folder = os.path.join(
        out_root, f"{split}_{parts[1]}", f"{split}_{parts[1]}{parts[2]}"
    ) if len(parts) >= 3 else os.path.join(out_root, name.split(".")[0])
    os.makedirs(folder, exist_ok=True)
    np.savez(os.path.join(folder, name.split(".")[0] + ".npz"), out)


def main(argv=None):
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--metadata", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--device", action="store_true")
    args = parser.parse_args(argv)

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    df = pd.read_csv(args.metadata).set_index("VolumeName")
    files = []
    for dirpath, _, names in os.walk(args.src):
        files += [os.path.join(dirpath, n) for n in names
                  if n.endswith(".nii.gz") or n.endswith(".nii")]

    def work(path):
        name = os.path.basename(path)
        if name not in df.index:
            print(f"skip {name}: no metadata row")
            return
        try:
            process_file(path, df.loc[name], args.out, args.split,
                         device=args.device)
        except Exception as e:
            print(f"failed {name}: {e}")

    with ThreadPoolExecutor(args.workers) as pool:
        list(pool.map(work, files))
    print(f"processed {len(files)} volumes → {args.out}")


if __name__ == "__main__":
    main()

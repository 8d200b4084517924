"""Convert a CT-RATE npz tree (+ reports CSV) to packed binary shards.

Usage:
  python -m vit_exp_tpu.cli.pack_dataset \
      --data_folder <npz tree> --csv_file <reports.csv> --out <packed dir> \
      [--dtype float16] [--shard_gb 1]

Each record stores the runtime-cropped volume (the exact array the loader
would feed the device) plus the cleaned report text in the record meta, so
training needs no CSV join at read time.  See data/packed.py for the
format and the why (npz-per-sample starves TPU ingest).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", required=True)
    p.add_argument("--csv_file", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--dtype", default="float16",
                   help="storage dtype (float16 halves bytes; cast back on read)")
    p.add_argument("--shard_gb", type=float, default=1.0)
    p.add_argument("--limit", type=int, default=0, help="pack first N only")
    args = p.parse_args(argv)

    from vit_exp_tpu.data.datasets import CTReportDataset
    from vit_exp_tpu.data.packed import PackedShardWriter

    ds = CTReportDataset(args.data_folder, args.csv_file, keep_percent=100)
    n = len(ds.samples) if not args.limit else min(args.limit, len(ds.samples))
    dtype = np.dtype(args.dtype)
    t0 = time.time()
    with PackedShardWriter(args.out, shard_bytes=int(args.shard_gb * 2**30)) as w:
        for i in range(n):
            path, text = ds.samples[i]
            item = ds[i]
            key = os.path.basename(path).replace(".npz", ".nii.gz")
            w.append(key, item["image"].astype(dtype), meta={"text": text})
            if (i + 1) % 50 == 0:
                rate = (i + 1) / (time.time() - t0)
                print(f"packed {i + 1}/{n} ({rate:.1f} vol/s)", flush=True)
    print(f"done: {n} volumes -> {args.out} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()

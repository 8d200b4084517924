#!/usr/bin/env python
"""Write synthetic production-shape packed shards for the sustained
run_train integration proof (VERDICT r2 next-round #1): N flagship volumes
(1, 240, 480, 480) fp16 + report text metas, in the exact format
cli/pack_dataset.py produces from real CT-RATE — so the REAL pipelined
loader (CTReportPackedDataset → Loader threads → native reader) feeds the
real trainer, no synthetic-dataset shortcut.

    python scripts/make_synth_shards.py --out /tmp/synth_packed [--n 12]
    [--shape 240,480,480]

~110 MB/volume fp16; on the 11 MB/s-throttled dev container budget ~10
s/volume of write time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPORTS = [
    "There is a small left pleural effusion. No pericardial effusion.",
    "Bilateral ground glass opacities consistent with infection.",
    "No acute cardiopulmonary abnormality. Lungs are clear.",
    "Calcified granuloma in the right upper lobe. No lymphadenopathy.",
    "Mild emphysematous changes. Trachea and bronchi are patent.",
    "Consolidation in the left lower lobe with air bronchograms.",
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=12)
    p.add_argument("--shape", default="240,480,480",
                   help="D,H,W of each volume (channel dim added)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from vit_exp_tpu.data.packed import PackedShardWriter

    d, h, w = (int(x) for x in args.shape.split(","))
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    with PackedShardWriter(args.out) as wr:
        for i in range(args.n):
            # cheap structured content in [0, 1] (the loader range):
            # a separable low-frequency field + noise, distinct per volume
            zz = np.linspace(0, np.pi * (1 + i % 3), d, dtype=np.float32)
            yy = np.linspace(0, np.pi * 2, h, dtype=np.float32)
            vol = (0.4 + 0.3 * np.sin(zz)[:, None, None]
                   * np.cos(yy)[None, :, None]
                   + 0.1 * rng.standard_normal((d, h, w), np.float32))
            vol = np.clip(vol, 0.0, 1.0)[None].astype(np.float16)
            wr.append(f"synth_{i:04d}.nii.gz", vol,
                      meta={"text": REPORTS[i % len(REPORTS)]})
            print(f"wrote {i + 1}/{args.n} "
                  f"({(i + 1) / (time.time() - t0):.2f} vol/s)", flush=True)
    print(f"done: {args.n} volumes → {args.out} "
          f"in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

"""CTViT reconstruction-inference driver — the CTVIT_inf capability
(transformer_maskgit/ctvit_inference.py:109-309): iterate a volume
dataset through a trained CTViT VQGAN, save each reconstruction as
NIfTI under {results}/samples.{accession}/{name}.nii.gz — exactly the
tree VideoTextSuperresDataset consumes as its low-res source.

Usage:
    python -m vit_exp_tpu.cli.run_ctvit_recon --data_folder vols/ \
        --results_folder out/ [--checkpoint ckpt_dir --step N] \
        [--num_frames 17] [--image_size 128] [--synthetic N]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_folder", default=None)
    parser.add_argument("--results_folder", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir (train/checkpoint.py)")
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--temporal_patch_size", type=int, default=2)
    parser.add_argument("--num_frames", type=int, default=17,
                        help="frame count ≡ 1 (mod temporal_patch_size)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="run on N synthetic volumes instead of data")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    from vit_exp_tpu.data.video import (VideoDataset, cast_num_frames_mod1,
                                        write_nifti)
    from vit_exp_tpu.models.ctvit import CTViT

    enable_compilation_cache()
    model = CTViT(
        dim=args.dim, image_size=args.image_size,
        patch_size=args.patch_size,
        temporal_patch_size=args.temporal_patch_size,
        attn_impl="xla",
    )
    # init with a frame count ≡ 1 (mod tps) — CTViT's first-frame + temporal
    # patch layout; the per-volume crop below enforces the same invariant
    init_frames = 1 + 2 * args.temporal_patch_size
    video0 = jnp.zeros(
        (1, 1, init_frames, args.image_size, args.image_size),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), video0,
                           return_encoded_tokens=False, return_recons=True)
    params, codebook = variables["params"], variables.get("codebook", {})

    if args.checkpoint:
        from vit_exp_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.checkpoint)
        # restore BOTH collections: the trained VQ codebook lives in the
        # 'codebook' variable collection (EMA buffers, models/vq.py), not
        # in params — a params-only restore would quantize every volume
        # against random-init codes
        restored = mgr.restore(args.step,
                               {"params": params, "codebook": codebook})
        params, codebook = restored["params"], restored["codebook"]

    @jax.jit
    def recon_fn(p, cb, video):
        recon, _, _ = model.apply(
            {"params": p, "codebook": cb}, video,
            return_encoded_tokens=False, return_recons=True,
        )
        return recon

    if args.synthetic:
        rng = np.random.default_rng(0)
        items = [
            (f"SYN{i}", f"vol{i}.nii.gz",
             rng.uniform(-1, 1, (1, args.num_frames, args.image_size,
                                 args.image_size)).astype(np.float32))
            for i in range(args.synthetic)
        ]
    else:
        assert args.data_folder, "--data_folder or --synthetic required"
        ds = VideoDataset(
            args.data_folder,
            target=(args.num_frames, args.image_size, args.image_size),
        )
        items = []
        for i in range(len(ds)):
            path = ds.paths[i]
            acc = os.path.basename(os.path.dirname(path))
            items.append((acc, os.path.basename(path), ds[i]["image"]))

    for acc, name, vol in items:
        # vol is (c, F, H, W): crop the frame axis BEFORE batching so
        # cast_num_frames_mod1 sees it at axis 1
        vol = cast_num_frames_mod1(vol, args.temporal_patch_size)[None]
        recon = np.asarray(recon_fn(params, codebook, vol)[0, 0],
                           np.float32)
        out_dir = os.path.join(args.results_folder, f"samples.{acc}")
        os.makedirs(out_dir, exist_ok=True)
        if not name.endswith(".nii.gz"):
            name += ".nii.gz"
        # (D, H, W) → NIfTI (H, W, S) axis order, matching tensor_to_nifti
        write_nifti(os.path.join(out_dir, name),
                    np.transpose(recon, (1, 2, 0)))
        print(f"saved samples.{acc}/{name}", flush=True)
    print(f"reconstructed {len(items)} volumes → {args.results_folder}",
          flush=True)


if __name__ == "__main__":
    main()

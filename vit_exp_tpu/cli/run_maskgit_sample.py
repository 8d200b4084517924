"""Text→CT-video generation driver — the GenerateCT-style sampling the
reference runs inside its MaskGIT training loop
(train_transformer.py:303-311: `model.sample(texts=..., num_frames=201,
cond_scale=5.)` saved to media) exposed as a standalone CLI over a trained
CTViT VQGAN + MaskGit pair.

Usage:
    python -m vit_exp_tpu.cli.run_maskgit_sample --results_folder out/ \
        --prompt "chest CT with small left pleural effusion" \
        [--prompt "follow-up scene" ...]   # >1 prompt → make_video chaining
        [--ctvit_checkpoint dir --ctvit_step N] \
        [--maskgit_checkpoint dir --maskgit_step N] \
        [--t5_pretrained path]   # local HF T5 encoder (t5.py:64-104); \
                                 # default: offline tiny random-init T5
        [--num_frames 17 --steps 18 --cond_scale 5.0]

Multiple --prompt values chain scenes with prime-token conditioning
(MaskGITTransformer.py:699-720 make_video); the concatenated video is
written as one NIfTI, matching the recon driver's axis order.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_folder", required=True)
    parser.add_argument("--prompt", action="append", required=True,
                        help="repeatable; >1 chains scenes via prime tokens")
    # CTViT arch (mirror run_ctvit_recon)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--codebook_size", type=int, default=8192)
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--temporal_patch_size", type=int, default=2)
    parser.add_argument("--num_frames", type=int, default=17,
                        help="frame count ≡ 1 (mod temporal_patch_size)")
    # MaskGit arch
    parser.add_argument("--mg_dim", type=int, default=512)
    parser.add_argument("--mg_depth", type=int, default=6)
    parser.add_argument("--mg_heads", type=int, default=8)
    parser.add_argument("--mg_dim_head", type=int, default=64)
    parser.add_argument("--mg_max_seq_len", type=int, default=None,
                        help="MaskGit position-table size; default "
                        "seq_len (+ prime tokens when chaining scenes) — "
                        "must match the trained checkpoint")
    # checkpoints
    parser.add_argument("--ctvit_checkpoint", default=None,
                        help="orbax dir from CTViTTrainer.save")
    parser.add_argument("--ctvit_step", type=int, default=None)
    parser.add_argument("--maskgit_checkpoint", default=None,
                        help="orbax dir from MaskGITTrainer.save")
    parser.add_argument("--maskgit_step", type=int, default=None)
    # conditioning / sampling
    parser.add_argument("--t5_pretrained", default=None,
                        help="local HF T5 encoder path (flax or torch); "
                        "default is an offline tiny random-init T5 — "
                        "shape-correct, NOT semantically conditioned")
    parser.add_argument("--vocab", default=None,
                        help="vocab.txt for WordPiece prompt tokenization "
                        "(default HashTokenizer — pair it with the same "
                        "tokenizer used at training time)")
    parser.add_argument("--max_text_len", type=int, default=256)
    parser.add_argument("--steps", type=int, default=18,
                        help="demasking rounds (MaskGITTransformer.py:417)")
    parser.add_argument("--cond_scale", type=float, default=5.0,
                        help="classifier-free guidance "
                        "(train_transformer.py:306 samples at 5.0)")
    parser.add_argument("--prime_length", type=int, default=1,
                        help="trailing frames conditioning the next scene")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.data.video import write_nifti
    from vit_exp_tpu.models import t5_adapter
    from vit_exp_tpu.models.ctvit import CTViT
    from vit_exp_tpu.models.maskgit import MaskGit
    from vit_exp_tpu.models.maskgit_pipeline import (
        MaskGITTransformer,
        t5_text_encode,
    )

    enable_compilation_cache()
    tps = args.temporal_patch_size
    if (args.num_frames - 1) % tps:
        parser.error(f"--num_frames must be ≡ 1 (mod {tps})")
    token_grid = (1 + (args.num_frames - 1) // tps,
                  args.image_size // args.patch_size,
                  args.image_size // args.patch_size)
    seq_len = token_grid[0] * token_grid[1] * token_grid[2]

    # --- CTViT VQGAN (frozen decoder) ------------------------------------
    ctvit = CTViT(
        dim=args.dim, codebook_size=args.codebook_size,
        image_size=args.image_size, patch_size=args.patch_size,
        temporal_patch_size=tps, attn_impl="xla",
    )
    video0 = jnp.zeros((1, 1, 1 + 2 * tps, args.image_size,
                        args.image_size), jnp.float32)
    ctvit_vars = dict(ctvit.init(jax.random.PRNGKey(0), video0,
                                 return_encoded_tokens=False,
                                 return_recons=True))
    if args.ctvit_checkpoint:
        from vit_exp_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ctvit_checkpoint)
        step = args.ctvit_step
        if step is None:
            step = mgr.latest_step()
            if step is None:
                parser.error(f"no ckpt_N entries in {args.ctvit_checkpoint}")
        restored = mgr.restore(
            step,
            {"params": ctvit_vars["params"],
             "codebook": ctvit_vars.get("codebook", {})},
        )
        ctvit_vars = {"params": restored["params"],
                      "codebook": restored["codebook"]}
    else:
        print("WARNING: random-init CTViT (no --ctvit_checkpoint) — "
              "decoded volumes are noise", flush=True)

    # --- T5 conditioning (t5.py:64-104) -----------------------------------
    if args.t5_pretrained:
        enc = t5_adapter.T5TextEncoder(pretrained=args.t5_pretrained)
    else:
        enc = t5_adapter.T5TextEncoder()  # offline tiny config
        print("WARNING: random-init tiny T5 (no --t5_pretrained) — "
              "prompts are not semantically grounded", flush=True)
    text_encode = t5_text_encode(enc)
    # Tokenization must be PAIRED with the conditioning encoder: the
    # reference couples T5Tokenizer with the T5 encoder (t5.py:25,69-77) —
    # WordPiece/hash ids index the wrong (sentencepiece) vocabulary and can
    # exceed the embedding table.
    toks = None
    if args.t5_pretrained:
        if args.vocab:
            parser.error("--vocab conflicts with --t5_pretrained: prompts "
                         "must use the T5's own paired tokenizer")
        try:
            from transformers import AutoTokenizer

            t5_tok = AutoTokenizer.from_pretrained(args.t5_pretrained)
            enc_out = t5_tok(list(args.prompt), padding="max_length",
                             truncation=True, max_length=args.max_text_len,
                             return_tensors="np")
            toks = {"input_ids": enc_out["input_ids"],
                    "attention_mask": enc_out["attention_mask"]}
        except Exception as e:  # no tokenizer files / backend missing
            print(f"WARNING: could not load the T5's paired tokenizer from "
                  f"{args.t5_pretrained} ({e}); falling back to the local "
                  "tokenizer — conditioning ids may be semantically "
                  "meaningless", flush=True)
    if toks is None:
        tokenizer = load_tokenizer(args.vocab)
        toks = tokenizer(list(args.prompt), max_length=args.max_text_len)
    all_ids = jnp.asarray(toks["input_ids"])
    all_mask = jnp.asarray(toks["attention_mask"])
    t5_vocab = int(enc.model.config.vocab_size)
    if int(np.asarray(all_ids).max()) >= t5_vocab:
        msg = (f"prompt token ids exceed the T5 vocab ({t5_vocab}): the "
               "tokenizer is not paired with the conditioning encoder")
        if args.t5_pretrained:
            raise SystemExit(msg)  # real encoder: garbage conditioning
        # random-init tiny T5: already semantically ungrounded — warn only
        print(f"WARNING: {msg}", flush=True)

    # --- MaskGit -----------------------------------------------------------
    # scene chaining prepends the previous clip's prime tokens each round
    # (maskgit_sample prime_ids), so the position table must cover them
    if (args.prime_length - 1) % tps:
        parser.error(f"--prime_length must be ≡ 1 (mod {tps})")
    prime_tokens = 0
    if len(args.prompt) > 1:
        prime_t = 1 + (args.prime_length - 1) // tps
        prime_tokens = prime_t * token_grid[1] * token_grid[2]
    max_seq_len = args.mg_max_seq_len or (seq_len + prime_tokens)
    mg = MaskGit(
        num_tokens=args.codebook_size, max_seq_len=max_seq_len,
        dim=args.mg_dim, depth=args.mg_depth, heads=args.mg_heads,
        dim_head=args.mg_dim_head, dim_context=enc.ctx_dim,
    )
    ctx0 = text_encode(all_ids[:1], all_mask[:1])
    mg_vars = dict(mg.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, seq_len), jnp.int32), context=ctx0,
        context_mask=all_mask[:1],
    ))
    if args.maskgit_checkpoint:
        from vit_exp_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.maskgit_checkpoint)
        step = args.maskgit_step
        if step is None:
            step = mgr.latest_step()
            if step is None:
                parser.error(
                    f"no ckpt_N entries in {args.maskgit_checkpoint}")
        mg_vars = mgr.restore(step, {"params": mg_vars["params"]})
    else:
        print("WARNING: random-init MaskGit (no --maskgit_checkpoint)",
              flush=True)

    pipe = MaskGITTransformer(ctvit, ctvit_vars, mg, mg_vars, text_encode)
    rng = jax.random.PRNGKey(args.seed)
    prompts = [(all_ids[i:i + 1], all_mask[i:i + 1])
               for i in range(all_ids.shape[0])]
    if len(prompts) == 1:
        video = pipe.sample(rng, *prompts[0], token_grid=token_grid,
                            steps=args.steps, cond_scale=args.cond_scale)
    else:
        video = pipe.make_video(rng, prompts, token_grid=token_grid,
                                prime_length=args.prime_length,
                                steps=args.steps,
                                cond_scale=args.cond_scale)

    os.makedirs(args.results_folder, exist_ok=True)
    vol = np.asarray(video[0, 0], np.float32)       # (F, H, W)
    out = os.path.join(args.results_folder, "sample.nii.gz")
    # (D, H, W) → NIfTI (H, W, S) axis order, matching tensor_to_nifti
    write_nifti(out, np.transpose(vol, (1, 2, 0)))
    print(f"generated {vol.shape} volume from {len(prompts)} prompt(s) "
          f"→ {out}", flush=True)


if __name__ == "__main__":
    main()

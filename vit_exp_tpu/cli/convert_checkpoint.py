"""Convert a reference torch checkpoint (CTClip.{step}.pt) to an orbax
checkpoint loadable by this framework.

Usage:
    python -m vit_exp_tpu.cli.convert_checkpoint --config cfg.yaml \
        --torch_ckpt CTClip.100000.pt --out results/x/checkpoints \
        [--step 100000]

The step defaults to the number embedded in the filename (the reference's
step-from-filename convention, CTCLIPTrainer.py:435-447).
"""

from __future__ import annotations

import argparse
import os
import re


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--vocab", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.models.factory import bert_config_for
    from vit_exp_tpu.models.convert import load_ctclip_checkpoint
    from vit_exp_tpu.train.checkpoint import CheckpointManager
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import create_train_state

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    config = load_config(args.config)
    tokenizer = load_tokenizer(args.vocab)
    bert_cfg = bert_config_for(config, tokenizer)
    params = load_ctclip_checkpoint(
        args.torch_ckpt,
        transformer_blocks=config.arch.transformer_blocks,
        bert_config=bert_cfg,
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    step = args.step
    if step is None:
        m = re.search(r"\.(\d+)\.pt$", os.path.basename(args.torch_ckpt))
        step = int(m.group(1)) if m else 0

    tx = build_optimizer(config.trainer)
    state = create_train_state(params, tx)
    state.step = jnp.asarray(step, jnp.int32)
    CheckpointManager(args.out).save(step, state, wait=True)
    print(f"wrote orbax checkpoint step {step} → {args.out}/ckpt_{step}")


if __name__ == "__main__":
    main()

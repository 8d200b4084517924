"""Capture a jax.profiler trace of the flagship contrastive train step.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_train.py [outdir]
Builds the same step as bench.py --train (static-max fwd, remat off for a
clean fwd/bwd split in the trace), warms up, traces 2 dispatches.
"""

import sys
import time

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models import losses
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import TrainState, create_train_state

    assert jax.default_backend() == "tpu"
    arch = {
        "dim": 768, "image_size": 480, "patch_size": 20,
        "temporal_size": 240, "temporal_patch_size": 10,
        "transformer_blocks": 8, "dim_head": 32, "heads": 8,
    }
    batch, text_len = 4, 512
    bert_cfg = BertConfig()
    config = ExperimentConfig.from_dict(
        {"trainer": {"lr": 1e-5, "max_grad_norm": 0.5}, "arch": arch}
    )
    model = build_ctclip(config, bert_config=bert_cfg,
                         attn_impl="pallas_static", remat=False)
    a = config.arch
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 1, a.temporal_size, a.image_size,
                             a.image_size)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, bert_cfg.vocab_size,
                                   (batch, text_len)), jnp.int32)
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1])
    )["params"]
    tx = build_optimizer(config.trainer)
    batch_dict = {"image": video, "input_ids": ids, "attention_mask": mask}

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["image"],
                              batch["input_ids"], batch["attention_mask"])
            return losses.infonce_loss(
                out["text_latents"], out["image_latents"], out["temperature"]
            )
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(optax.apply_updates(state.params, updates),
                          opt_state, state.step + 1), loss

    perturb = jax.jit(lambda p, s: jax.tree_util.tree_map(lambda x: x * s, p))
    state = create_train_state(perturb(params, jnp.float32(1.0)), tx)
    print("warmup compile...", flush=True)
    t0 = time.perf_counter()
    state, loss = step(state, batch_dict)
    print(f"compiled+ran in {time.perf_counter()-t0:.0f}s loss={float(loss):.4f}",
          flush=True)
    jax.profiler.start_trace(outdir)
    for _ in range(2):
        state, loss = step(state, batch_dict)
        float(loss)
    jax.profiler.stop_trace()
    print("trace done", flush=True)
    import subprocess
    print(subprocess.run(["find", outdir, "-name", "*.json.gz"],
                         capture_output=True, text=True).stdout)


if __name__ == "__main__":
    main()

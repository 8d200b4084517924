"""Benchmark: zero-shot CT-volume classification throughput on one TPU chip.

Measures the workload of the reference's CTClipInferenceFast loop
(scripts/zero_shot.py:528-611): per CT volume, one CTViT3D encode
(480×480×240 → 13,824 tokens, dim 768, 8 blocks) followed by 18
prompt-pair scores against cached text embeddings.  Here the whole thing is
one jitted program: batched encode → per-token projection → mean/l2norm →
(B, 768) @ (768, 36) scores → 18 softmax pairs.

Baseline denominators are DERIVED, line by line, in BASELINE.md
("Derivation of the bench.py denominators"): the reference pipeline is
data-bound at 6-12 vol/s (measured npz decompress cost × 6 workers) with a
20-26 vol/s GPU-side ceiling, and its train step lands at 1.5-2.5 steps/s
(36.6 TF/step at 25-35% A100 MFU + ingest overlap).  The constants below
are the midpoints of those ranges.  BASELINE.md "The defended performance
position" is the official interpretation of this bench's output: the
structural ceiling at this architecture is ~26.1 vol/s (inference) /
1.65 steps/s (train) on a v5e, the vs-baseline ratio is a pipeline-level
comparison (ingest feasibility math there), and compute-vs-compute the
honest cross-hardware framing is ~1.0-1.27× inference / 2.43
A100-equivalent steps/s FLOPs-normalized.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import threading
import time

import numpy as np

# set the moment the real result JSON line is printed: the whole-run
# deadline (_arm_deadline) must not append a second zero line after it
_RESULT_PRINTED = threading.Event()

# See BASELINE.md "Derivation" — midpoint of the 6-12 vol/s data-bound range
# (GPU-side ceiling 20-26 vol/s), generous to the reference.
BASELINE_VOLUMES_PER_SEC = 8.0
# See BASELINE.md "Derivation" — midpoint of 1.5-2.5 steps/s (36.6 TF/step,
# 25-35% A100 MFU, batch-4 ingest partially overlapped).
BASELINE_TRAIN_STEPS_PER_SEC = 2.0


def bench_train():
    """Flagship contrastive train-step throughput on one chip."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.train.optimizer import build_optimizer
    from vit_exp_tpu.train.steps import create_train_state

    on_tpu = jax.default_backend() == "tpu"
    arch = {
        "dim": 768, "image_size": 480, "patch_size": 20,
        "temporal_size": 240, "temporal_patch_size": 10,
        "transformer_blocks": 8, "dim_head": 32, "heads": 8,
    } if on_tpu else {
        "dim": 48, "image_size": 32, "patch_size": 8,
        "temporal_size": 16, "temporal_patch_size": 4,
        "transformer_blocks": 2, "dim_head": 8, "heads": 4,
    }
    batch, text_len, iters = (4, 512, 8) if on_tpu else (2, 16, 2)
    bert_cfg = BertConfig() if on_tpu else BertConfig.tiny()
    config = ExperimentConfig.from_dict(
        {"trainer": {"lr": 1e-5, "max_grad_norm": 0.5}, "arch": arch}
    )
    import os

    # longer chains sharpen the paired diff: each diff measures
    # BENCH_ITERS steps of compute against two ~tens-of-seconds uploads
    iters = int(os.environ.get("BENCH_ITERS", iters))

    # static-max fwd is differentiable (bwd reuses the standard kernels
    # via lse = B + log l) and measured 5% faster end-to-end than the
    # online kernel; BENCH_TRAIN_ATTN/BENCH_TRAIN_REMAT override
    train_attn = os.environ.get(
        "BENCH_TRAIN_ATTN", "pallas_static" if on_tpu else "xla"
    )
    # default OFF since the fused attention/FF backwards: recompute now
    # costs more than the saved activations (1.551 vs 1.527 steps/s)
    remat = os.environ.get("BENCH_TRAIN_REMAT", "0") == "1"
    train_ff = os.environ.get(
        "BENCH_TRAIN_FF", "pallas" if on_tpu else "xla"
    )
    model = build_ctclip(
        config, bert_config=bert_cfg, attn_impl=train_attn,
        ff_impl=train_ff, remat=remat,
    )
    a = config.arch
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((batch, 1, a.temporal_size, a.image_size,
                             a.image_size)), jnp.bfloat16,
    )
    ids = jnp.asarray(rng.integers(0, bert_cfg.vocab_size,
                                   (batch, text_len)), jnp.int32)
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = nn.unbox(
        model.init(jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1])
    )["params"]
    tx = build_optimizer(config.trainer)
    batch_dict = {"image": video, "input_ids": ids, "attention_mask": mask}

    # serial chain of n steps inside one dispatch (relay-robust timing).
    # batch is a jit ARGUMENT — closing over it would embed the 442 MB
    # video as an HLO literal and blow the relay's request-size limit
    def run_n(n):
        def chained(state, batch):
            def body(_, st):
                st, _m = _raw_step(st, batch, 1.0)
                return st
            return jax.lax.fori_loop(0, n, body, state)

        # donate the input state: ~2.8 GB of fp32 params+Adam moments per
        # TrainState — without donation two live states + the returned one
        # exhaust the 16 GB chip
        return jax.jit(chained, donate_argnums=(0,))

    # un-jitted step body for composition inside the fori_loop chain
    import optax

    def _raw_step(state, batch, w):
        from vit_exp_tpu.models import losses
        from vit_exp_tpu.models.ctclip import CTCLIP

        def loss_fn(p):
            out = model.apply({"params": p}, batch["image"],
                              batch["input_ids"], batch["attention_mask"])
            return losses.infonce_loss(
                out["text_latents"], out["image_latents"],
                out["temperature"],
            ) * w

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from vit_exp_tpu.train.steps import TrainState

        return TrainState(new_params, opt_state, state.step + 1), loss

    run1, runk = run_n(1), run_n(1 + iters)
    # ONE jitted program for the whole-tree perturbation (eager tree_map
    # would be ~300 separate relay dispatches); scale is a TRACED arg so
    # per-trial perturbations reuse one executable.  Every state gets its
    # OWN param copy — donation consumes the buffers.
    perturb_tree = jax.jit(
        lambda p, s: jax.tree_util.tree_map(lambda x: x * s, p)
    )

    def fresh_state(scale):
        return create_train_state(perturb_tree(params, jnp.float32(scale)), tx)

    # the relay executes lazily: a HOST READ (float(...)) is required to
    # force execution — block_until_ready alone returns without running
    float(run1(fresh_state(1.0), batch_dict).step)
    float(runk(fresh_state(1.0), batch_dict).step)
    # per-dispatch arg upload (~800 MB params+batch ⇒ tens of seconds) has
    # seconds of network variance — repeat the pair and take the median diff
    diffs = []
    # BENCH_TRIALS > 3 = the paired-band protocol (BENCH_NOTES "train-step
    # band"): many alternating (run1, runk) pairs in ONE session bound the
    # relay/measurement variance so the session-to-session 1.54-1.60
    # spread can be attributed (or not) to the environment
    trials = int(os.environ.get("BENCH_TRIALS", 3 if on_tpu else 1))
    for trial in range(trials):
        sa = fresh_state(1 + 1e-6 * (2 * trial + 1))
        t0 = time.perf_counter()
        float(run1(sa, batch_dict).step)
        dt1 = time.perf_counter() - t0
        sb = fresh_state(1 + 1e-6 * (2 * trial + 2))
        t0 = time.perf_counter()
        float(runk(sb, batch_dict).step)
        dtk = time.perf_counter() - t0
        diffs.append(dtk - dt1)
        print(f"# trial {trial}: run1 {dt1:.2f}s  run{1 + iters} {dtk:.2f}s "
              f"diff {dtk - dt1:.2f}s -> "
              f"{iters / max(dtk - dt1, 1e-9):.3f} steps/s", file=sys.stderr)
    dt = max(sorted(diffs)[len(diffs) // 2], 1e-9)
    steps_per_sec = iters / dt
    if trials > 3:  # paired-band protocol: report the spread too
        rates = sorted(iters / max(d, 1e-9) for d in diffs)
        print(f"# band over {trials} paired trials: "
              f"min {rates[0]:.3f} / p25 {rates[trials // 4]:.3f} / "
              f"median {rates[trials // 2]:.3f} / "
              f"p75 {rates[(3 * trials) // 4]:.3f} / max {rates[-1]:.3f}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "contrastive_train_steps_per_sec_per_chip_bs4",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_TRAIN_STEPS_PER_SEC, 3),
    }), flush=True)
    _RESULT_PRINTED.set()


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    # Serialized-executable reloads work through the axon relay (validated
    # 2026-08-18: "Persistent compilation cache hit" on a second process;
    # cold bench 5.4 min → warm 2.5 min).  Best-effort, opt out with
    # VIT_EXP_NO_COMPILE_CACHE=1.
    from vit_exp_tpu.core.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.models.ctclip import CTCLIP

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        arch = {
            "dim": 768, "image_size": 480, "patch_size": 20,
            "temporal_size": 240, "temporal_patch_size": 10,
            "transformer_blocks": 8, "dim_head": 32, "heads": 8,
        }
        bert_cfg = BertConfig()
        batch, text_len, iters = 4, 512, 5
        import os as _os

        # Serving default is the int8 path (int8-QK attention, W8A8 FF +
        # qkv/out projections): 23.4 vs 20.x vol/s bf16, with end-to-end
        # probability parity ≤0.02 vs fp32 enforced by
        # tests/test_int8_parity.py.  BENCH_ATTN_IMPL=pallas_static /
        # BENCH_FF_IMPL=pallas select the bf16 measurement.
        attn_impl = _os.environ.get("BENCH_ATTN_IMPL", "pallas_static_int8")
    else:  # CPU smoke mode for development only
        arch = {
            "dim": 48, "image_size": 32, "patch_size": 8,
            "temporal_size": 16, "temporal_patch_size": 4,
            "transformer_blocks": 2, "dim_head": 8, "heads": 4,
        }
        bert_cfg = BertConfig.tiny()
        batch, text_len, iters = 2, 16, 2
        attn_impl = "xla"

    config = ExperimentConfig.from_dict({"arch": arch})
    import os

    # the FF default follows the attention impl's precision family so
    # BENCH_ATTN_IMPL=pallas_static alone measures the documented bf16
    # config, not a silent bf16-attn/int8-FF hybrid
    if not on_tpu:
        ff_default = "xla"
    elif attn_impl.endswith("int8"):
        ff_default = "pallas_int8"
    else:
        ff_default = "pallas"
    ff_impl = os.environ.get("BENCH_FF_IMPL", ff_default)
    model = build_ctclip(config, bert_config=bert_cfg, attn_impl=attn_impl,
                         ff_impl=ff_impl, fuse_qkv=on_tpu)
    a = config.arch

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal(
            (batch, 1, a.temporal_size, a.image_size, a.image_size)
        ),
        jnp.bfloat16,
    )
    prompt_ids = jnp.asarray(
        rng.integers(0, bert_cfg.vocab_size, (36, text_len)), jnp.int32
    )
    prompt_mask = jnp.ones((36, text_len), jnp.int32)

    params = nn.unbox(
        model.init(
            jax.random.PRNGKey(0), video[:1], prompt_ids[:1], prompt_mask[:1]
        )
    )["params"]

    @jax.jit
    def cache_text(params, ids, mask):
        hidden = model.apply({"params": params}, ids, mask,
                             method=CTCLIP.encode_text_hidden)
        return model.apply({"params": params}, hidden,
                           method=CTCLIP.text_latents_from_hidden)

    @jax.jit
    def classify(params, video, text_latents):
        tokens = model.apply({"params": params}, video,
                             method=CTCLIP.encode_image_tokens)
        img = model.apply({"params": params}, tokens,
                          method=CTCLIP.image_latents_from_tokens)
        temp = jnp.exp(params["temperature"])
        scores = (img @ text_latents.T) * temp          # (B, 36)
        pairs = scores.reshape(video.shape[0], 18, 2)   # (present, absent)
        return jax.nn.softmax(pairs, axis=-1)[..., 0]

    # text prompts embedded once per run (zero_shot.py:480-497)
    text_latents = jax.block_until_ready(cache_text(params, prompt_ids, prompt_mask))

    # Timing on the axon relay (measured, see .claude/skills/verify/SKILL.md):
    # (1) identical (executable, args) dispatches can be memoized remotely, so
    # each iteration must see fresh data; (2) every dispatch pays a large
    # fixed relay overhead that scales with argument bytes (params ~400 MB).
    # So: run the whole loop INSIDE one jitted program with a serial data
    # dependency between iterations, and difference two loop lengths to
    # cancel the fixed dispatch cost.
    def classify_n(n):
        @jax.jit
        def run(params, video, text_latents):
            def body(_, carry):
                acc, vid = carry
                probs = classify(params, vid, text_latents)
                s = jnp.sum(probs.astype(jnp.float32))
                # serial dependency so iterations can't be CSE'd/hoisted
                vid = vid * (1.0 + 1e-9 * s).astype(vid.dtype)
                return acc + s, vid
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), video))
            return acc
        return run

    run1, runk = classify_n(1), classify_n(1 + iters)
    float(run1(params, video, text_latents))   # compile 1
    float(runk(params, video, text_latents))   # compile 2
    # Paired-trial protocol (same structure as bench_train, VERDICT r3 #1):
    # each trial times a fresh (run1, runk) dispatch pair — the difference
    # cancels the per-dispatch relay overhead — and the MEDIAN of the
    # per-trial rates is reported.  A single two-point difference swung the
    # round-2/3 headlines 25.3 ↔ 29.5 (+17%); the relay's per-dispatch
    # upload variance is seconds against a ~0.8 s compute delta.
    # Fresh (perturbed) input per dispatch: identical (executable, args)
    # pairs are memoized remotely.
    perturb = jax.jit(lambda x, s: x * s)
    trials = int(os.environ.get("BENCH_TRIALS", 5 if on_tpu else 1))
    # perturbation steps must be bf16-REPRESENTABLE (eps ≈ 0.0039): a 1e-4
    # nudge rounds back to exactly 1.0 and the "fresh" args memoize
    step = 1.0 / 128.0
    diffs = []
    for trial in range(trials):
        va = jax.block_until_ready(
            perturb(video, jnp.bfloat16(1.0 + step * (2 * trial + 1))))
        t0 = time.perf_counter()
        float(run1(params, va, text_latents))
        dt1 = time.perf_counter() - t0
        vb = jax.block_until_ready(
            perturb(video, jnp.bfloat16(1.0 + step * (2 * trial + 2))))
        t0 = time.perf_counter()
        float(runk(params, vb, text_latents))
        dtk = time.perf_counter() - t0
        diffs.append(dtk - dt1)
        print(f"# trial {trial}: run1 {dt1:.2f}s  run{1 + iters} {dtk:.2f}s "
              f"diff {dtk - dt1:.2f}s -> "
              f"{batch * iters / max(dtk - dt1, 1e-9):.3f} vol/s",
              file=sys.stderr)
    dt = max(sorted(diffs)[len(diffs) // 2], 1e-9)
    volumes_per_sec = batch * iters / dt
    if trials > 1:
        rates = sorted(batch * iters / max(d, 1e-9) for d in diffs)
        print(f"# band over {trials} paired trials: min {rates[0]:.3f} / "
              f"median {rates[trials // 2]:.3f} / max {rates[-1]:.3f} vol/s",
              file=sys.stderr)
    print(json.dumps({
        "metric": "zero_shot_volumes_per_sec_per_chip",
        "value": round(volumes_per_sec, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(volumes_per_sec / BASELINE_VOLUMES_PER_SEC, 3),
    }), flush=True)
    _RESULT_PRINTED.set()


def _zero_line(train: bool, err: str) -> str:
    return json.dumps({
        "metric": ("contrastive_train_steps_per_sec_per_chip_bs4"
                   if train else "zero_shot_volumes_per_sec_per_chip"),
        "value": 0.0,
        "unit": "steps/sec/chip" if train else "volumes/sec/chip",
        "vs_baseline": 0.0,
        "error": err,
    })


def _arm_deadline(train: bool, seconds: float = 1500.0):
    """Whole-run deadline: emit the zero JSON line and exit if the bench
    hasn't printed its result in time.

    Needed beyond the init probe below: in the relay's FLAPPING failure
    mode (BENCH_NOTES 2026-08-20) backend init and small ops succeed while
    the first ≥~2 MB host→device transfer hangs forever — a bench that
    passed _require_backend would still wedge the driver mid-run.

    If the REAL result line already printed (_RESULT_PRINTED) but the
    process then wedged in teardown, fire() exits WITHOUT printing a
    second (zero) JSON line — the driver must see exactly one."""
    import os
    import threading

    def fire():
        time.sleep(seconds)
        if not _RESULT_PRINTED.is_set():
            print(_zero_line(
                train,
                f"bench exceeded the {seconds:.0f}s deadline — relay wedged "
                "mid-run? (flapping-mode transfers hang without erroring)"),
                flush=True)
        os._exit(0)

    t = threading.Thread(target=fire, daemon=True)
    t.start()


def _require_backend(train: bool, timeout_s: float = 600.0):
    """Fail fast with a valid JSON line if backend init hangs.

    jax.devices() blocks forever when the axon TPU tunnel is down (observed
    2026-08-17/18 outage); the driver still needs its ONE JSON line rather
    than a wedged process, so probe initialization on a watchdog thread and
    report value 0 + an error field on timeout."""
    import os
    import threading

    result = {}

    def probe():
        try:
            import jax

            result["backend"] = jax.default_backend()
        except Exception as e:  # noqa: BLE001 — reported verbatim below
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "backend" not in result:
        err = result.get(
            "error",
            f"jax backend init timed out after {timeout_s:.0f}s "
            "(TPU tunnel down?)")
        print(_zero_line(train, err), flush=True)
        os._exit(0)  # the probe thread may be wedged; don't wait on it


if __name__ == "__main__":
    train_mode = "--train" in sys.argv
    _require_backend(train_mode)
    _arm_deadline(train_mode)
    if train_mode:
        bench_train()
    else:
        main()

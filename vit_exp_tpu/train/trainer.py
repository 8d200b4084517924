"""The training loop — scripts/CTCLIPTrainer.py re-imagined for one mesh.

Capability parity (file:line in /root/reference/scripts/CTCLIPTrainer.py):
- N train datasets with per-dataset batch sizes from `train_data_list`
  (346, 393), each cycled infinitely;
- DatasetSampler decides per-step micro-batch counts per dataset (232-268)
  — here the schedule is deterministic and resumable (train/sampler.py);
- per-dataset balance_loss_weight (362, 603-606);
- gradient accumulation: optax.MultiSteps applies the update every
  `gradient_accumulation_steps` micro-steps (593-600 accelerate.accumulate);
- grad clipping (711-712) and the constant-lr placeholder schedule
  (410-416) live in train/optimizer.py;
- periodic hooks: eval_model_every → zero-shot AUROC (730-735),
  save_model_every → checkpoint (797-807), sample_val_every → seg
  visualization samples (722-727);
- resume: full train state via orbax (improving on the reference's
  weights-only + step-from-filename path, 435-447).

What disappears relative to the reference: Accelerator construction, NCCL
timeouts, find_unused_parameters, autocast context — replaced by the mesh +
shardings set up once here and the bf16 policy inside the modules.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.core.mesh import MeshConfig, create_mesh, logical_rules
from vit_exp_tpu.data.loader import InfiniteLoader, Loader
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.parallel.sharding import param_shardings
from vit_exp_tpu.train.checkpoint import CheckpointManager
from vit_exp_tpu.train.optimizer import build_optimizer
from vit_exp_tpu.train.sampler import build_dataset_sampler
from vit_exp_tpu.train.steps import create_train_state, make_train_steps
from vit_exp_tpu.utils.logging import MetricLogger

# RSS watchdog helpers (axon transfer-leak guard) — shared with cli/serve
from vit_exp_tpu.utils.memguard import (
    rss_bytes as _rss_bytes,
    rss_limit_bytes as _rss_exit_bytes,
)
from vit_exp_tpu.utils.profiling import StepTimer

_BATCH_KEYS = (
    "image", "input_ids", "attention_mask", "seg_mask", "prompt_ids",
    "prompt_mask",
)


class CTClipTrainer:
    def __init__(
        self,
        model: CTCLIP,
        config: ExperimentConfig,
        *,
        datasets: Optional[List[Any]] = None,
        mesh_config: Optional[MeshConfig] = None,
        resume_step: Optional[int] = None,
        eval_hooks: Optional[Dict[str, Callable]] = None,
        sample_hooks: Optional[Dict[str, Callable]] = None,
        rng_seed: Optional[int] = None,
    ):
        self.model = model
        self.config = config
        self.trainer_cfg = config.trainer
        self.results_folder = config.results_folder
        os.makedirs(self.results_folder, exist_ok=True)

        self.mesh_cfg = mesh_config or MeshConfig()
        self.mesh = create_mesh(self.mesh_cfg)
        self.rules = logical_rules(self.mesh_cfg)
        self.n_data_shards = self.mesh.shape["data"] * self.mesh.shape["fsdp"]

        # datasets + infinite loaders, one per train_data_list entry.
        # Multihost: each process loads ONLY its slice of the global batch
        # (loader index-sharding by process, core/multihost.py); the global
        # device array is assembled in _device_batch.  Mirrors the
        # reference's accelerate per-rank DataLoaders (CTCLIPTrainer.py:
        # 346-393) without the duplicate-ingest of replicating the batch.
        self.process_count = jax.process_count()
        self.datasets = datasets or []
        self.loaders: List[InfiniteLoader] = []
        for spec, ds in zip(config.train_data_list, self.datasets):
            global_batch = (
                int(spec.get("batch_size", 1)) * self.n_data_shards)
            if global_batch % self.process_count:
                raise ValueError(
                    f"global batch {global_batch} (batch_size × data×fsdp "
                    f"shards) must divide evenly across "
                    f"{self.process_count} processes")
            loader = Loader(
                ds,
                batch_size=global_batch // self.process_count,
                shuffle=True,
                seed=config.random_seed,
                drop_last=True,
                num_workers=int(spec.get("num_workers", 4)),
                shard_id=jax.process_index(),
                num_shards=self.process_count,
            )
            self.loaders.append(InfiniteLoader(loader))
        self.data_types = [
            spec.get("type", "imagereport") for spec in config.train_data_list
        ]
        self.balance = list(self.trainer_cfg.balance_loss_weight) or [1.0] * max(
            len(self.loaders), 1
        )
        self.sampler = build_dataset_sampler(
            config.dataset_sampler, seed=config.random_seed
        )

        # params on the mesh
        seed = config.random_seed if rng_seed is None else rng_seed
        boxed = self._init_params(jax.random.PRNGKey(seed))
        shardings = nn.unbox(param_shardings(self.mesh, self.rules, boxed))
        self.params = jax.device_put(nn.unbox(boxed)["params"],
                                     shardings["params"])

        self.tx = build_optimizer(self.trainer_cfg)
        self.steps_by_type = make_train_steps(
            model, self.tx, config, n_data_shards=self.n_data_shards
        )
        self.state = create_train_state(self.params, self.tx)
        self.step = 0

        self.ckpt = CheckpointManager(
            os.path.join(self.results_folder, "checkpoints")
        )
        if resume_step == -1:  # --auto_resume: latest loadable
            resume_step = self.ckpt.latest_step()
        if resume_step:
            target = jax.eval_shape(lambda: self.state)
            self.state = self.ckpt.restore(resume_step, target)
            self.step = int(resume_step)

        self.logger = MetricLogger(
            self.results_folder, project=config.project_name,
            exp_name=config.exp_name,
            enabled=jax.process_index() == 0,
        )
        self.eval_hooks = eval_hooks or {}
        # sample_val hooks: visual tests every sample_val_every steps
        # (CTCLIPTrainer.py:722-727); hook(params, step) → {name: path}
        self.sample_hooks = sample_hooks or {}

    def _init_params(self, rng):
        a = self.config.arch
        video = jnp.zeros(
            (1, a.channels, a.temporal_size, a.image_size, a.image_size),
            jnp.float32,
        )
        ids = jnp.zeros((1, 16), jnp.int32)
        return self.model.init(
            rng, video, ids, jnp.ones((1, 16), jnp.int32),
            method=CTCLIP.init_all,
        )

    # -- batch plumbing ------------------------------------------------------

    def _device_batch(self, batch: Dict) -> Dict:
        out = {}
        for k in _BATCH_KEYS:
            if k not in batch:
                continue
            v = np.asarray(batch[k])
            if k in ("prompt_ids", "prompt_mask"):
                sharding = NamedSharding(self.mesh, P())
            else:
                sharding = NamedSharding(
                    self.mesh, P(("data", "fsdp"), *([None] * (v.ndim - 1)))
                )
            if self.process_count > 1:
                # v is this process's slice of the global batch (for the
                # replicated prompt tensors, the full array — every host
                # loads identical prompts); jax assembles the global array
                # from per-process shards without any cross-host transfer
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
        return out

    # -- the loop ------------------------------------------------------------

    def train_step(self) -> Dict:
        """One optimizer step = sampler-scheduled micro-steps over datasets
        (train_step_single, CTCLIPTrainer.py:622-652).  Returns the step's
        metrics as DEVICE arrays — the train loop materializes them one
        step late so the host never blocks on the in-flight step and the
        device queue stays fed (dispatch is async; the donated state future
        chains the next step)."""
        acc_steps = self.sampler.sample(self.step)
        logs: Dict = {}
        for ds_idx, n_micro in enumerate(acc_steps):
            step_fn = self.steps_by_type[self.data_types[ds_idx]]
            weight = float(self.balance[ds_idx])
            for _ in range(int(n_micro)):
                batch = self._device_batch(next(self.loaders[ds_idx]))
                self.state, metrics = step_fn(self.state, batch, weight)
                for k, v in metrics.items():
                    logs[f"ds{ds_idx}_{k}"] = v
        self.step += 1
        return logs

    def install_preemption_handler(self, signals=None):
        """Checkpoint-on-preemption: SIGTERM/SIGINT set a flag; the loop
        finishes the in-flight step, saves full train state, and returns
        cleanly — resumable via --auto_resume.  (The reference has no
        elasticity story, SURVEY §5; on preemptible TPU pools this is
        table stakes.)"""
        import signal as _signal

        self._preempted = False
        for sig in signals or (_signal.SIGTERM, _signal.SIGINT):
            _signal.signal(
                sig, lambda *_: setattr(self, "_preempted", True))

    def train(self, num_steps: Optional[int] = None,
              profile_dir: Optional[str] = None) -> str:
        """Run to `num_steps`; returns "completed", "preempted", or
        "mem_exit".  The mem_exit path is the RSS watchdog: when host RSS
        crosses the ceiling (_rss_exit_bytes), the loop saves full state
        and returns instead of letting the kernel OOM-killer SIGKILL the
        process mid-write.  Needed on axon-relay hosts, where the PJRT
        client LEAKS every host→device transfer ~1:1 in RSS (measured
        +189 MB per 189 MB device_put; a 221 MB/step run OOM-kills at
        ~565 steps on a 132 GB host) — callers relaunch and auto-resume."""
        tcfg = self.trainer_cfg
        total = num_steps or tcfg.num_train_steps
        timer = StepTimer()
        rss_limit = _rss_exit_bytes()
        steps_this_session = 0  # watchdog fires only after ≥1 step of
        pending = None  # (step idx, logs w/ device arrays): read 1 step late

        def flush_pending():
            nonlocal pending
            if pending is None:
                return
            pstep, plogs = pending
            self.logger.log(
                {k: (float(v) if hasattr(v, "dtype") else v)
                 for k, v in plogs.items()},
                step=pstep,
            )
            pending = None

        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        while self.step < total:
            if getattr(self, "_preempted", False):
                if profile_dir:
                    jax.profiler.stop_trace()
                flush_pending()
                # orbax save is a collective on multi-host meshes —
                # every process joins; orbax writes shards per host and
                # metadata from process 0
                self.ckpt.save(self.step, self.state, wait=True)
                print(f"preempted at step {self.step}: state saved, exiting",
                      flush=True)
                return "preempted"
            # progress this invocation — a threshold below the process's
            # baseline RSS must still advance ≥1 step per relaunch
            if (rss_limit and steps_this_session > 0
                    and _rss_bytes() >= rss_limit):
                if profile_dir:
                    jax.profiler.stop_trace()
                flush_pending()
                self.ckpt.save(self.step, self.state, wait=True)
                print(
                    f"host RSS {_rss_bytes() / 2**30:.1f} GiB >= "
                    f"{rss_limit / 2**30:.1f} GiB ceiling at step "
                    f"{self.step}: state saved, exiting for relaunch "
                    f"(axon transfer leak — relaunch resumes here)",
                    flush=True)
                return "mem_exit"
            with timer:
                # dispatch step i, then materialize step i-1's metrics while
                # i computes — in steady state the timer still spans one full
                # step (dispatch latency + the wait for the previous step)
                logs = self.train_step()
                flush_pending()
            steps_this_session += 1
            logs.update(timer.metrics())
            pending = (self.step, logs)

            if (
                tcfg.save_model_every
                and self.step % tcfg.save_model_every == 0
            ):
                self.ckpt.save(self.step, self.state)
            if (
                tcfg.eval_model_every
                and self.step % tcfg.eval_model_every == 0
            ):
                # hooks block anyway — write step i's train line first so
                # metrics.jsonl stays append-ordered by step
                flush_pending()
                for name, hook in self.eval_hooks.items():
                    res = hook(self.state.params)
                    self.logger.log(
                        {f"eval/{name}/{k}": v for k, v in res.items()},
                        step=self.step,
                    )
            if (
                tcfg.sample_val_every and self.sample_hooks
                and self.step % tcfg.sample_val_every == 0
            ):
                flush_pending()
                for name, hook in self.sample_hooks.items():
                    paths = hook(self.state.params, self.step)
                    self.logger.log(
                        {f"sample/{name}/{k}": str(v)
                         for k, v in paths.items()},
                        step=self.step,
                    )
        flush_pending()
        if profile_dir:
            jax.profiler.stop_trace()
        self.ckpt.save(self.step, self.state, wait=True)
        print("Training complete")
        return "completed"

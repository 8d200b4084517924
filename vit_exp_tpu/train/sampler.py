"""Multi-dataset step composition (CTCLIPTrainer.py:232-268 semantics).

Each train step draws a per-dataset gradient-accumulation count:
- CombinedDatasetSampler: fixed acc_steps_list every step;
- RandDatasetSampler: one-hot draw proportional to ratio_list.

The random sampler here is deterministic-by-step (seeded numpy) instead of
global `random.random()` — same distribution, reproducible and
checkpoint-resumable.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from vit_exp_tpu.core.config import DatasetSamplerConfig


class CombinedDatasetSampler:
    def __init__(self, acc_steps_list: Sequence[int]):
        acc = [int(a) for a in acc_steps_list]
        assert sum(acc) > 0 and all(a >= 0 for a in acc)
        self.acc_steps_list = acc
        self.n_datasets = len(acc)

    def sample(self, step: int) -> List[int]:
        return list(self.acc_steps_list)


class RandDatasetSampler:
    def __init__(self, ratio_list: Sequence[float], seed: int = 0):
        total = float(sum(ratio_list))
        assert total > 0
        self.probs = np.asarray([r / total for r in ratio_list])
        self.n_datasets = len(ratio_list)
        self.seed = seed

    def sample(self, step: int) -> List[int]:
        rng = np.random.default_rng((self.seed, step))
        idx = int(rng.choice(self.n_datasets, p=self.probs))
        out = [0] * self.n_datasets
        out[idx] = 1
        return out


def build_dataset_sampler(config: DatasetSamplerConfig, seed: int = 0):
    if config.type == "Random":
        return RandDatasetSampler(config.ratio_list, seed=seed)
    if config.type == "Combined":
        return CombinedDatasetSampler(config.acc_steps_list)
    raise ValueError(f"unknown DatasetSampler type {config.type!r}")

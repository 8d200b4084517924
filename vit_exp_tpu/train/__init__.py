from vit_exp_tpu.train.optimizer import build_optimizer
from vit_exp_tpu.train.sampler import (
    RandDatasetSampler,
    CombinedDatasetSampler,
    build_dataset_sampler,
)

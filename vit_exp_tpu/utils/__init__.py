from vit_exp_tpu.utils.logging import MetricLogger
from vit_exp_tpu.utils.vis import slice_grid_3d

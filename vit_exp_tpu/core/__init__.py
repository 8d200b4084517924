from vit_exp_tpu.core.mesh import MeshConfig, create_mesh, logical_rules, shard_logical
from vit_exp_tpu.core.precision import Policy, DEFAULT_POLICY
from vit_exp_tpu.core.config import ExperimentConfig, load_config

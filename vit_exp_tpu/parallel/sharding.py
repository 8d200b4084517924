"""Parameter/batch sharding utilities on the global mesh.

This module is the whole replacement for the reference's distributed stack
(HF accelerate DDP + custom AllGather autograd fn + FSDP launch flag,
SURVEY.md §2.8): parameters carry logical axis names (models/layers.py),
these helpers turn them into NamedShardings via the rules table
(core/mesh.py), and jit/GSPMD inserts every collective — the contrastive
all-gather of distributed.py:9-20 appears automatically when batch-sharded
latents meet the global similarity einsum, and its backward IS the local
gradient chunk by construction.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_exp_tpu.core.mesh import MeshConfig, create_mesh, logical_rules


def param_shardings(mesh: Mesh, rules, boxed_variables) -> Any:
    """Boxed (LogicallyPartitioned) variables → NamedSharding pytree."""
    logical_specs = nn.get_partition_spec(boxed_variables)
    return nn.logical_to_mesh_sharding(logical_specs, mesh, rules)


def unbox(variables):
    return nn.unbox(variables)


def init_sharded_params(
    init_fn: Callable[[], Mapping],
    mesh: Mesh,
    rules,
):
    """Run a model init with params placed directly into their mesh sharding
    (avoids materializing everything on device 0).  Returns (unboxed params,
    shardings pytree)."""
    boxed_shape = jax.eval_shape(init_fn)
    shardings = param_shardings(mesh, rules, boxed_shape)
    jit_init = jax.jit(
        lambda: nn.unbox(init_fn()),
        out_shardings=nn.unbox(
            jax.tree_util.tree_map(
                lambda s: s, shardings,
                is_leaf=lambda x: isinstance(x, NamedSharding),
            )
        ),
    )
    params = jit_init()
    return params, nn.unbox(shardings)


def make_train_mesh_context(config: MeshConfig | None = None, devices=None):
    """(mesh, rules, batch_sharding_fn) convenience bundle."""
    config = config or MeshConfig()
    mesh = create_mesh(config, devices)
    rules = logical_rules(config)

    def batch_sharding(ndim: int) -> NamedSharding:
        return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (ndim - 1))))

    return mesh, rules, batch_sharding

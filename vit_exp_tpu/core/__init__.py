"""Core layer: mesh/sharding rules, precision policy, config schema.

Re-exports are LAZY (PEP 562): importing a sibling like
``vit_exp_tpu.core.multihost`` must not pull jax (via core.mesh) as a
side effect — CLIs import that module before argparse, and --help has to
stay responsive even when the TPU tunnel is down.
"""

_EXPORTS = {
    "MeshConfig": "vit_exp_tpu.core.mesh",
    "create_mesh": "vit_exp_tpu.core.mesh",
    "logical_rules": "vit_exp_tpu.core.mesh",
    "shard_logical": "vit_exp_tpu.core.mesh",
    "Policy": "vit_exp_tpu.core.precision",
    "DEFAULT_POLICY": "vit_exp_tpu.core.precision",
    "ExperimentConfig": "vit_exp_tpu.core.config",
    "load_config": "vit_exp_tpu.core.config",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

"""Device mesh and logical-axis sharding rules.

The reference (jackhu-bme/VIT-EXP) scales via HF accelerate DDP + a custom
differentiable NCCL AllGather (CT_CLIP/ct_clip/distributed.py:9-20) and FSDP
as a launch flag (scripts/README.md:19-24).  Here all of that collapses into
ONE `jax.sharding.Mesh` with named axes and a table of logical-axis → mesh-
axis rules consumed by `flax.linen` logical partitioning:

- ``data``  : batch / data parallelism (DDP equivalent);
- ``fsdp``  : parameter sharding (ZeRO/FSDP equivalent) — folded into the
              data axis by default so dp+fsdp share devices;
- ``model`` : tensor parallelism over attention heads / MLP hidden units
              (absent in the reference, available here for headroom);
- sequence parallelism is a rules switch (map "seq" to a mesh axis) rather
  than a rewrite — see ops/attention.py.

Collectives (all_gather for the global contrastive loss, grad all-reduce)
are inserted by XLA GSPMD from these shardings; none are hand-written.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Logical axis names used throughout the model code.
BATCH = "batch"
SEQ = "seq"          # image/text token axis (sequence sharding switch)
EMBED = "embed"      # model dimension
HEADS = "heads"      # attention heads
KV = "kv"            # per-head dim
MLP = "mlp"          # feedforward hidden
VOCAB = "vocab"      # token embedding rows
LATENT = "latent"    # CLIP latent dim


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to carve the device grid into (data, fsdp, model) axes."""

    data: int = -1      # -1: all remaining devices
    fsdp: int = 1
    model: int = 1
    # map logical "seq" onto a mesh axis name to enable sequence sharding
    seq_axis: Optional[str] = None

    def axis_sizes(self, n_devices: int) -> tuple[int, int, int]:
        fsdp, model = self.fsdp, self.model
        data = self.data
        if data == -1:
            assert n_devices % (fsdp * model) == 0, (
                f"{n_devices} devices not divisible by fsdp*model={fsdp * model}"
            )
            data = n_devices // (fsdp * model)
        assert data * fsdp * model == n_devices, (
            f"mesh {data}x{fsdp}x{model} != {n_devices} devices"
        )
        return data, fsdp, model


def create_mesh(
    config: MeshConfig | None = None, devices: Optional[Sequence[Any]] = None
) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    d, f, m = config.axis_sizes(len(devices))
    dev_array = np.asarray(devices).reshape(d, f, m)
    return Mesh(dev_array, ("data", "fsdp", "model"))


def mesh_config_from(config, mesh_arg: Optional[str] = None
                     ) -> Optional[MeshConfig]:
    """MeshConfig from the yaml `mesh:` section and/or --mesh DATA,FSDP,MODEL.

    The yaml section (ours — the reference topology lives in `accelerate
    launch` flags instead) accepts `{data, fsdp, model, seq_axis}`; the CLI
    flag overrides the axis sizes.  Returns None (single device / trainer
    default: pure DP over all devices) when neither is given.
    """
    spec = dict(config.extra.get("mesh") or {})
    if mesh_arg:
        d, f, m = (int(x) for x in mesh_arg.split(","))
        spec.update(data=d, fsdp=f, model=m)
    if not spec:
        return None
    return MeshConfig(
        data=spec.get("data", -1), fsdp=spec.get("fsdp", 1),
        model=spec.get("model", 1), seq_axis=spec.get("seq_axis"),
    )


def mesh_from_cli(config, mesh_arg: Optional[str] = None) -> Optional[Mesh]:
    """The eval/serve CLIs' mesh: yaml `mesh:` and/or --mesh, else None
    (single-device dispatch).  Unlike the trainer there is no pure-DP
    default — unsharded serving skips the device_put round trip."""
    mc = mesh_config_from(config, mesh_arg)
    return None if mc is None else create_mesh(mc)


def logical_rules(config: MeshConfig | None = None) -> tuple[tuple[str, Any], ...]:
    """Logical-axis → mesh-axis rules for flax logical partitioning.

    Batch shards over (data, fsdp) so pure-dp and dp+fsdp meshes both keep
    per-device batch = global/ (data*fsdp).  Params shard heads/mlp/vocab
    over 'model' (TP) and embed over 'fsdp' (ZeRO-3 style).
    """
    config = config or MeshConfig()
    rules = [
        (BATCH, ("data", "fsdp")),
        (EMBED, "fsdp"),
        (HEADS, "model"),
        (KV, None),
        (MLP, "model"),
        (VOCAB, "model"),
        (LATENT, None),
        (SEQ, config.seq_axis),
    ]
    return tuple(rules)


def shard_logical(mesh: Mesh, rules, *logical_axes: Optional[str]) -> NamedSharding:
    """Build a NamedSharding from logical axis names using the rules table."""
    table = dict(rules)
    spec = []
    for ax in logical_axes:
        if ax is None:
            spec.append(None)
        else:
            spec.append(table.get(ax))
    return NamedSharding(mesh, P(*spec))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading axis over (data, fsdp); replicate the rest."""
    return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (ndim - 1))))

"""Multi-host / multi-process utilities.

The reference scales across hosts with `accelerate launch` + NCCL env
plumbing (scripts/README.md:19-27, run_train_from_sratch.sh).  The JAX
equivalent is jax.distributed: every host runs the same program, the mesh
spans all hosts' devices, and per-host responsibilities (logging,
checkpoint writes, eval) are guarded by process_index — helpers below.

On a single host everything is a no-op, so the same entry points run
unchanged from a laptop CPU to a multi-slice pod.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-op
    when single-process."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        # A multi-process cluster shape without a coordinator is a
        # misconfigured pod launch, not a single-process run: silently
        # proceeding would give N independent trainers that all think
        # they're process 0 and write the same results_folder
        # concurrently.  Check args AND the env vars (the launcher path
        # this module advertises); a 1-process / id-0 shape is a genuine
        # single-process run and stays a no-op.
        if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and os.environ.get("JAX_PROCESS_ID"):
            process_id = int(os.environ["JAX_PROCESS_ID"])
        if (num_processes not in (None, 1)) or (process_id not in (None, 0)):
            raise ValueError(
                "--num_processes/--process_id (or JAX_NUM_PROCESSES/"
                "JAX_PROCESS_ID) describe a multi-process cluster but no "
                "--coordinator_address / JAX_COORDINATOR_ADDRESS is set; "
                "refusing to run as N independent single-process jobs"
            )
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        # explicit arguments win over env vars even when falsy —
        # process_id=0 IS the main process, `or` would let a stale
        # JAX_PROCESS_ID silently reassign it
        num_processes=int(
            num_processes if num_processes is not None
            else os.environ.get("JAX_NUM_PROCESSES", 1)
        ),
        process_id=int(process_id if process_id is not None
                       else os.environ.get("JAX_PROCESS_ID", 0)),
    )
    return True


def add_cli_args(parser):
    """Attach the standard multihost flags (shared by train + eval CLIs)."""
    parser.add_argument("--coordinator_address", default=None,
                        metavar="HOST:PORT",
                        help="multihost: jax.distributed coordinator "
                        "(process 0's address).  With --num_processes/"
                        "--process_id (or the JAX_* env vars), run the "
                        "same command once per host and the mesh spans "
                        "all hosts' devices")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser


def initialize_from_args(args) -> bool:
    """initialize() from the add_cli_args flags; call BEFORE any backend
    touch (device enumeration pins the topology)."""
    return initialize(args.coordinator_address, args.num_processes,
                      args.process_id)


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def process_count() -> int:
    import jax

    return jax.process_count()


def sync_hosts(name: str = "barrier"):
    """Cross-host barrier via a tiny psum (cheap, compiled)."""
    import jax

    if jax.process_count() == 1:
        return
    import jax.numpy as jnp

    x = jnp.ones((jax.local_device_count(),))
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    )

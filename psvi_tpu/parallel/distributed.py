"""Multi-host (multi-controller) execution helpers.

The reference's only scaling mechanism is one OS process per GPU on a
single node (``psvi/experiments/flow-psvi-parallel.py:58,455-463``) — it
has no multi-host story at all. Here multi-host is the standard JAX
multi-controller model: every host runs the SAME SPMD program,
``jax.distributed.initialize`` wires them to a coordinator, and meshes are
built over the GLOBAL device list so shardings span hosts (collectives ride
ICI within a slice and DCN across hosts, inserted by XLA from the same
sharding annotations used single-host — nothing in the engine changes).

Typical 2-host launch (the BASELINE.md "1 chip → 2 hosts" target):

    # host 0                                   # host 1
    JAX_COORDINATOR_ADDRESS=h0:1234 \
    JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 ...   ... JAX_PROCESS_ID=1 ...
    python -m psvi_tpu.experiments --distributed ...

Validated without hardware by ``scripts/multihost_dryrun.py``: 2 CPU
processes × 4 virtual devices each form one global 8-device mesh and run
trial-sharded and batch-sharded PSVI ELBO steps with cross-process
collectives.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from psvi_tpu.parallel.mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-controller mode. Arguments fall back to the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID; on TPU pods jax.distributed auto-detects all three).

    Returns True if distributed mode was initialized, False if this is a
    single-process run (no-op)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(trial: int = 1, data: int = 1, mc: int = 1):
    """A ('trial','data','mc') mesh over the GLOBAL device list — identical
    to parallel.make_mesh on one host; spans hosts in multi-controller
    mode (jax.devices() is global there)."""
    return make_mesh(trial=trial, data=data, mc=mc, devices=jax.devices())


def make_global_array(arr, mesh, spec):
    """A global jax.Array from an identical host copy on every process.

    ``arr`` must be the SAME full (global-shape) numpy array on all
    processes (our data layer is deterministic per seed, so read_dataset
    satisfies this); each process donates only its addressable shards."""
    import numpy as np
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])

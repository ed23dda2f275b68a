"""Device-mesh and sharding helpers.

First-class TPU replacement for the reference's only scaling mechanism —
a ``multiprocessing.Pool`` with one (dataset, method, coreset-size, trial)
job per GPU process (``psvi/experiments/flow-psvi-parallel.py:58,455-463``).
Here trials are a MESH AXIS of one SPMD program: independent trials shard
over ``'trial'``, minibatch rows shard over ``'data'`` (the ``N/|B|·Σ nll``
term reduces with an XLA-inserted psum over ICI), and MC sample chains can
shard over ``'mc'``. No process pool, no pickling, no NCCL analog — just
``jax.sharding`` + collectives.
"""

from __future__ import annotations


import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(trial: int = 1, data: int = 1, mc: int = 1,
              devices=None) -> Mesh:
    """Build a ('trial', 'data', 'mc') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    need = trial * data * mc
    if need > len(devices):
        raise ValueError(
            f"mesh ({trial}x{data}x{mc}) needs {need} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.asarray(devices[:need]).reshape(trial, data, mc)
    return Mesh(dev_array, axis_names=("trial", "data", "mc"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension of an (B, ...) array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def trial_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("trial", *([None] * (ndim - 1))))


def shard_pytree_leading(tree, mesh: Mesh, axis: str = "trial"):
    """Place every leaf with its leading axis sharded over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)

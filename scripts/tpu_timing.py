"""Honest TPU timing under the axon tunnel.

``jax.block_until_ready`` can return before device completion on the
tunneled 'axon' platform, and every host-forced transfer pays ~30 ms RTT.
Correct methodology (validated in round-1 profiling):

- queue K dependent dispatches (or chain steps in one ``lax.scan`` jit),
- force completion ONCE with a host transfer (``float(x)``),
- subtract nothing: with K large the RTT amortizes below noise.

Use ``timeit_chain`` for any per-step measurement on this setup.
"""

from __future__ import annotations

import time

import jax


def timeit_chain(fn, state, key, n_steps: int = 10, warmup: int = 2):
    """Time fn(state, key)->state-like over n_steps queued dispatches.

    fn must return something whose first leaf depends on all compute.
    Returns seconds per step.
    """
    import jax.numpy as jnp

    s = state
    for i in range(warmup):
        s = fn(s, jax.random.fold_in(key, 1000 + i))
    _force(s)
    t0 = time.perf_counter()
    for i in range(n_steps):
        s = fn(s, jax.random.fold_in(key, i))
    _force(s)
    return (time.perf_counter() - t0) / n_steps


def _force(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    import numpy as np

    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))

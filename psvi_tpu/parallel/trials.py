"""Trial-parallel PSVI: independent trials as a sharded vmap axis.

The reference runs `num_trials` independent seeds as separate OS processes
pinned round-robin to GPUs (``flow-psvi-parallel.py:401-463``). Here the
trials are STACKED into one pytree whose leading axis is sharded over the
mesh's ``'trial'`` axis; one jitted SPMD program advances all trials per
step. Per-trial PRNG streams come from ``fold_in(seed, trial)`` so results
are bitwise identical however many devices participate.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.data.datasets import DataBundle
from psvi_tpu.inference.psvi import PSVI, PSVIRegressor
from psvi_tpu.parallel.mesh import make_mesh, shard_pytree_leading
from psvi_tpu.utils.config import METHOD_SPECS
from psvi_tpu.utils.prng import trial_key

tmap = jax.tree_util.tree_map


class TrialParallelPSVI:
    def __init__(
        self,
        data: DataBundle,
        num_trials: int,
        method: str = "psvi_learn_v",
        mesh=None,
        **engine_kwargs,
    ):
        spec = METHOD_SPECS[method]
        cls = PSVIRegressor if spec.regressor else PSVI
        self.mesh = mesh if mesh is not None else make_mesh(trial=1)
        # the stacked-trial leading axis shards over 'trial' — pad the
        # trial count up to a multiple of the axis size (extra seeds run
        # as real trials; run() returns only the requested ones)
        axis = self.mesh.shape["trial"]
        self.num_trials = num_trials
        self._padded_trials = -(-num_trials // axis) * axis
        # one engine per trial (identical static config, different seeds) —
        # the base engine carries the pure step functions; states get
        # stacked, so the per-trial engines are dropped after init (each
        # pins device copies of the dataset otherwise)
        self.base = cls(data, method=method, seed=0, **engine_kwargs)
        states = [self.base.state]
        for t in range(1, self._padded_trials):
            self.base.reseed(t)
            states.append(self.base.state)
        self.base.reseed(0)

        stacked = tmap(lambda *xs: jnp.stack(xs), *states)
        self.states = shard_pytree_leading(stacked, self.mesh, "trial")

        step_fn = self.base._trainer_fn()
        eval_fn = lambda s, k: self.base._evaluate_fn(s, k, True)
        self._vstep = jax.jit(jax.vmap(step_fn), donate_argnums=(0,))
        self._veval = jax.jit(jax.vmap(eval_fn))

        self.keys = jnp.stack(
            [trial_key(1000, t) for t in range(self._padded_trials)]
        )
        self.keys = shard_pytree_leading(self.keys, self.mesh, "trial")

    def run(self):
        base = self.base
        results = [
            {"accs": [], "nlls": [], "csizes": [], "times": [], "ness": []}
            for _ in range(self.num_trials)
        ]
        times0 = time.time()
        for it in range(base.num_epochs):
            fold = jax.vmap(lambda k: jax.random.fold_in(k, it))
            step_keys = fold(self.keys)
            eval_keys = jax.vmap(
                lambda k: jax.random.fold_in(jax.random.fold_in(k, 0x5EED), it)
            )(self.keys)
            if it % base.log_every == 0:
                accs, nlls, iw, ness, vent = self._veval(self.states, eval_keys)
                accs, nlls, ness = map(np.asarray, (accs, nlls, ness))
                for t in range(self.num_trials):
                    results[t]["accs"].append(float(accs[t]))
                    results[t]["nlls"].append(float(nlls[t]))
                    results[t]["ness"].append(float(ness[t]))
                    results[t]["csizes"].append(base.num_pseudo)
                    results[t]["times"].append(time.time() - times0)
            self.states, _ = self._vstep(self.states, step_keys)
        return results


def run_trials(data: DataBundle, num_trials: int, mesh=None, **kwargs):
    return TrialParallelPSVI(data, num_trials, mesh=mesh, **kwargs).run()

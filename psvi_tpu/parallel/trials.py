"""Trial-parallel PSVI: independent trials as a sharded vmap axis.

The reference runs `num_trials` independent seeds as separate OS processes
pinned round-robin to GPUs (``flow-psvi-parallel.py:401-463``). Here the
trials are STACKED into one pytree whose leading axis is sharded over the
mesh's ``'trial'`` axis; one jitted SPMD program advances all trials per
step. Per-trial PRNG streams come from ``fold_in(seed, trial)`` so results
are bitwise identical however many devices participate.

Steps between logging boundaries are CHAINED into one dispatch (a
``lax.scan`` over the vmapped step, mirroring the single-engine
``PSVI._multi_step_dyn``): per-dispatch host→device latency (~30 ms over
the axon tunnel) would otherwise dominate small per-trial steps. The scan
uses a static slot count (``log_every``) with a dynamic active count so the
final partial chunk reuses the same executable instead of recompiling.
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
        for flag in ("reset", "prune", "increment"):
            if engine_kwargs.get(flag):
                raise ValueError(
                    f"{flag}=True is not supported in trial-parallel mode "
                    "(lifecycle runs mutate static shapes mid-run; run "
                    "them through the single-engine path)"
                )
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

        # the per-trial step runs under jax.vmap below — exclude the fused
        # Pallas nested step (vmapped pallas_call is an untested Mosaic
        # path; fused_nested.supports() checks this flag). The flag is set
        # only around step-fn resolution so the shared base engine keeps
        # its fused path when used directly afterwards.
        self.base._in_trial_vmap = True
        try:
            step_fn = self.base._trainer_fn()
        finally:
            self.base._in_trial_vmap = False
        eval_fn = lambda s, k: self.base._evaluate_fn(s, k, True)
        self._vstep = jax.jit(jax.vmap(step_fn), donate_argnums=(0,))
        self._veval = jax.jit(jax.vmap(eval_fn))

        T = self._padded_trials

        def multi_vstep_dyn(states, keys, it0, n_active, n_slots: int):
            """Chain up to ``n_slots`` vmapped trial-steps in ONE dispatch,
            executing only the first ``n_active`` (dynamic); the per-trial
            per-iteration keys fold inside the scan so the key streams are
            bit-identical to the unchained loop."""
            idx = jnp.arange(n_slots)

            def body(s, i):
                ks = jax.vmap(
                    lambda k: jax.random.fold_in(k, it0 + i)
                )(keys)

                def do(s):
                    s2, aux = jax.vmap(step_fn)(s, ks)
                    return s2, aux["outer_loss"]

                def skip(s):
                    return s, jnp.full((T,), jnp.nan, jnp.float32)

                return jax.lax.cond(i < n_active, do, skip, s)

            states, losses = jax.lax.scan(body, states, idx)
            return states, losses

        self._vmulti = jax.jit(
            multi_vstep_dyn, static_argnums=(4,), donate_argnums=(0,)
        )

        self.keys = jnp.stack(
            [trial_key(1000, t) for t in range(self._padded_trials)]
        )
        self.keys = shard_pytree_leading(self.keys, self.mesh, "trial")

    def _eval_now(self, it, results, times0):
        base = self.base
        eval_keys = jax.vmap(
            lambda k: jax.random.fold_in(jax.random.fold_in(k, 0x5EED), it)
        )(self.keys)
        accs, nlls, iw, ness, vent = self._veval(self.states, eval_keys)
        accs, nlls, ness = map(np.asarray, (accs, nlls, ness))
        for t in range(self.num_trials):
            results[t]["accs"].append(float(accs[t]))
            results[t]["nlls"].append(float(nlls[t]))
            results[t]["ness"].append(float(ness[t]))
            results[t]["csizes"].append(base.num_pseudo)
            results[t]["times"].append(time.time() - times0)

    def run(self, chain_steps: bool = True):
        """Advance all trials to ``num_epochs``.

        chain_steps=True (default) dispatches each ``log_every``-step block
        as ONE executable; False falls back to one dispatch per step (kept
        for latency-free debugging and the equivalence test)."""
        base = self.base
        results = [
            {"accs": [], "nlls": [], "csizes": [], "times": [], "ness": []}
            for _ in range(self.num_trials)
        ]
        times0 = time.time()
        if not chain_steps:
            for it in range(base.num_epochs):
                if it % base.log_every == 0:
                    self._eval_now(it, results, times0)
                step_keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, it)
                )(self.keys)
                self.states, _ = self._vstep(self.states, step_keys)
            return results

        slots = max(1, min(base.log_every, base.num_epochs))
        it = 0
        while it < base.num_epochs:
            if it % base.log_every == 0:
                self._eval_now(it, results, times0)
            n = min(slots - (it % slots), base.num_epochs - it)
            self.states, _ = self._vmulti(
                self.states, self.keys, jnp.int32(it), jnp.int32(n), slots
            )
            it += n
        return results


def run_trials(data: DataBundle, num_trials: int, mesh=None, **kwargs):
    return TrialParallelPSVI(data, num_trials, mesh=mesh, **kwargs).run()

"""PRNG discipline: explicit key folding.

The reference reseeds global torch/numpy RNGs per trial
(``psvi_experiments.py:536``: seed = trial index;
``psvi_classes.py:140``). In JAX we thread explicit keys: one root key per
(experiment), folded per (trial), then per (step), then per (purpose).
This keeps trials independent AND bitwise-reproducible regardless of how
they are sharded across a device mesh.
"""

import jax


def trial_key(seed: int, trial: int):
    return jax.random.fold_in(jax.random.PRNGKey(seed), trial)


def step_keys(key, it, n: int):
    """Per-iteration subkeys: fold the iteration index, split n ways."""
    return jax.random.split(jax.random.fold_in(key, it), n)

"""Full-state checkpointing.

The reference has NO mid-training resume — only three ad-hoc mechanisms
(pretrained-net state_dicts, score CSVs, whole-run results-pickle warm
starts; SURVEY.md §5). Here the ENTIRE ``PSVIState`` pytree (variational
params, pseudodata, weights, all optimizer moments, scheduler counter) is
checkpointed, so a run resumes bit-exactly mid-training.

Format: a single .npz of the flattened leaves + an iteration/key sidecar;
restore rebuilds onto the treedef of a freshly initialized engine with the
same static config.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _norm_path(path: str) -> str:
    # np.savez appends '.npz' when absent; normalize so save/load agree
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: Any, extra: dict = None):
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
    path = _norm_path(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_state(path: str, template: Any):
    """Restore into the pytree structure of `template`."""
    d = np.load(_norm_path(path))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = d[f"leaf_{i}"]
        # jax/numpy leaves expose shape/dtype without a device transfer
        if arr.shape != tuple(getattr(leaf, "shape", ())):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{getattr(leaf, 'shape', ())}; config mismatch"
            )
        new_leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", None)))
    extra = {
        k[len("extra_"):]: d[k] for k in d.files if k.startswith("extra_")
    }
    return jax.tree_util.tree_unflatten(treedef, new_leaves), extra

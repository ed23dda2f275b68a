"""Results-dict protocol and persistence.

Schema parity with the reference (``psvi_classes.py:1009-1027``;
``baselines.py:196-203`` etc.): keys ``accs, nlls, csizes, times, elbos,
went, ness, vent, vs, us, zs, grid_preds, alpha, avg_epoch_time,
gpu_memory (device memory), chosen_indices``. Persistence: nested dict →
json (scalars) + npz (arrays) in timestamped folders, mirroring
``psvi_experiments.py:669-710`` / ``experiments_utils.py:851-861``.
"""

from __future__ import annotations

import datetime
import json
import os
import pickle
from typing import Any, Dict

import numpy as np


def recursive_dict():
    import collections

    # module-level factory so the resulting dicts are picklable by
    # save_results (a local closure as default_factory is not)
    return collections.defaultdict(recursive_dict)


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "tolist"):  # jax arrays
        return np.asarray(obj).tolist()
    return obj


def get_save_foldername(results_folder, data_list, method_list, selection_method="random"):
    """Timestamped results directory (ref experiments_utils.py:851-861)."""
    new_methods = [
        f"{m}_{selection_method}" if m == "mfvi_selection" else m
        for m in method_list
    ]
    stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    return os.path.join(
        results_folder, f"{'_'.join(new_methods)}_{'_'.join(data_list)}_{stamp}"
    )


def save_results(results: Dict[str, Any], folder: str, config: Dict[str, Any] = None,
                 fnm: str = "results"):
    """Persist a results dict as ``{fnm}.json`` + ``{fnm}.pk`` (+config.json).

    ``fnm`` mirrors the reference's ``--fnm`` results-filename flag
    (``psvi_experiments.py:55``, consumed in ``write_to_files`` :669-710;
    the reference writes only the pickle there — its json save is
    commented out as flaky; ours works, pseudodata included).
    """
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, f"{fnm}.json"), "w") as f:
        json.dump(_to_jsonable(results), f)
    with open(os.path.join(folder, f"{fnm}.pk"), "wb") as f:
        pickle.dump(results, f)
    if config is not None:
        with open(os.path.join(folder, "config.json"), "w") as f:
            json.dump(_to_jsonable(config), f, default=str)


def load_results(folder: str, fnm: str = "results"):
    with open(os.path.join(folder, f"{fnm}.pk"), "rb") as f:
        return pickle.load(f)


def retrieve_results(results_folder, subfolder_name, dataset, method, coreset_size, trial=0,
                     fnm: str = "results"):
    """Warm-start retrieval for ``custom_init_evaluate``
    (ref ``inference/utils.py:1800-1823``): loads the saved run and returns
    the stored coreset state for (dataset, method, coreset_size, trial).
    ``fnm`` must match the ``--fnm`` the run was saved with."""
    res = load_results(os.path.join(results_folder, subfolder_name), fnm=fnm)
    node = res[dataset][method][coreset_size][trial]
    out = {
        "chosen_indices": node.get("chosen_indices", []),
        "weights": np.asarray(node["vs"][-1]) if node.get("vs") else None,
        "alpha": np.asarray(node["alpha"][-1]) if node.get("alpha") else 0.0,
        "labels": np.asarray(node["zs"][-1]) if node.get("zs") else None,
        "us": np.asarray(node["us"][-1]) if node.get("us") else None,
    }
    return out

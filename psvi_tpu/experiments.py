"""Experiment drivers + CLI.

TPU-native analog of the reference's ``psvi_experiments.py`` (723 LoC):
the same ~45-flag argparse surface (ref :50-380), the ``inf_dict`` registry
of method names → callables (ref :402-458), and
``experiment_driver`` / ``regressor_experiment_driver`` sweeping
(dataset × method × coreset_size × trial) with seed = trial index
(ref :461-573,536) and results persisted to timestamped folders
(ref :669-710).

Where the reference forks one process per (job, GPU)
(``flow-psvi-parallel.py``), pass ``--trial_parallel`` here to advance all
trials of a PSVI-family method as one sharded-vmap SPMD program over the
devices' ``'trial'`` mesh axis.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict
from typing import Any, Dict, List


from psvi_tpu.data import read_dataset, read_regression_dataset
from psvi_tpu.inference import baselines as B
from psvi_tpu.inference.psvi import make_psvi_engine, run_psvi
from psvi_tpu.inference.sparsebbvi import run_sparsevi_with_bb_elbo
from psvi_tpu.utils.config import METHOD_SPECS
from psvi_tpu.utils.results import get_save_foldername, save_results


def rec_dd():
    return defaultdict(rec_dd)


def _psvi_method(name):
    def run(data=None, **kw):
        return run_psvi(data, method=name, **kw)

    return run


# method registry (ref psvi_experiments.py:402-458)
INF_DICT: Dict[str, Any] = {
    **{name: _psvi_method(name) for name in METHOD_SPECS},
    "sparsebbvi": lambda data=None, **kw: run_sparsevi_with_bb_elbo(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, **kw
    ),
    "opsvi": lambda data=None, **kw: B.run_opsvi(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D, **kw
    ),
    "random": lambda data=None, **kw: B.run_random(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D, **kw
    ),
    "sparsevi": lambda data=None, **kw: B.run_sparsevi(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D, **kw
    ),
    "giga": lambda data=None, **kw: B.run_giga(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D, **kw
    ),
    "mfvi": lambda data=None, **kw: B.run_mfvi(train=data, N=data.N, D=data.D, **kw),
    "mfvi_subset": lambda data=None, **kw: B.run_mfvi_subset(
        train=data, D=data.D, **kw
    ),
    "mfvi_regressor": lambda data=None, **kw: B.run_mfvi_regressor(
        train=data, **kw
    ),
    "mfvi_subset_regressor": lambda data=None, **kw: B.run_mfvi_subset_regressor(
        train=data, **kw
    ),
    "el2n": lambda data=None, **kw: B.run_el2n_coreset(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D, **kw
    ),
    "kmeans": lambda data=None, **kw: B.run_kmeans(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D, **kw
    ),
    "mfvi_selection": lambda data=None, **kw: B.run_selection_with_mfvi(
        train=data, **kw
    ),
}

REGRESSOR_METHODS = {
    "psvi_regressor", "psvi_learn_v_regressor", "psvi_alpha_v_regressor",
    "mfvi_regressor", "mfvi_subset_regressor",
}


def experiment_driver(datasets: List[str], methods: List[str],
                      method_args: Dict[str, Any]):
    """Sweep (dataset × method × coreset_size × trial); seed = trial index
    (ref psvi_experiments.py:461-573)."""
    results = rec_dd()
    for dnm in datasets:
        is_regression = any(m in REGRESSOR_METHODS for m in methods)
        if is_regression:
            data = read_regression_dataset(
                dnm, seed=method_args.get("seed", 0),
                num_test=method_args.get("num_test", 100),
                data_dir=method_args.get("data_folder", "data"),
            )
        else:
            data = read_dataset(
                dnm, test_ratio=method_args.get("test_ratio", 0.2),
                data_folder=method_args.get("data_folder", "data"),
            )
        for nm_alg in methods:
            inf_alg = INF_DICT[nm_alg]
            compute_weights_entropy = (
                not nm_alg.startswith(("opsvi", "mfvi_subset"))
            ) and method_args.get("compute_weights_entropy", True)
            tps = (
                method_args["coreset_sizes"]
                if nm_alg.startswith(
                    ("psvi", "opsvi", "mfvi_subset", "mfvi_selection")
                )
                else [-1]
            )
            for ps in tps:
                engine = None  # PSVI-family: one engine, reseeded per trial
                for t in range(method_args.get("num_trials", 1)):
                    kw = dict(method_args)
                    kw.pop("datasets", None), kw.pop("methods", None)
                    kw.pop("coreset_sizes", None)
                    kw["num_pseudo"] = ps
                    kw["seed"] = t
                    kw["nc"] = data.nc
                    kw["dnm"] = dnm
                    kw["compute_weights_entropy"] = compute_weights_entropy
                    kw["init_args"] = kw.pop("init_at", "subsample")
                    kw["taus"] = getattr(data, "taus", ())
                    if nm_alg in METHOD_SPECS:
                        # sequential trials share the compiled executables
                        # (seed = trial index, ref psvi_experiments.py:536)
                        if engine is None:
                            engine = make_psvi_engine(data=data, method=nm_alg, **kw)
                        else:
                            engine.reseed(t)
                        results[dnm][nm_alg][ps][t] = engine.run_psvi()
                    else:
                        results[dnm][nm_alg][ps][t] = inf_alg(data=data, **kw)
    return results


def regressor_experiment_driver(datasets, methods, method_args):
    return experiment_driver(datasets, methods, method_args)


def build_parser() -> argparse.ArgumentParser:
    """Flag surface parity with ref psvi_experiments.py:50-380."""
    p = argparse.ArgumentParser(description="TPU-native PSVI experiments")
    p.add_argument("--datasets", nargs="+", default=["halfmoon"])
    p.add_argument("--methods", nargs="+", default=["psvi_learn_v"])
    p.add_argument("--mc_samples", type=int, default=10)
    p.add_argument("--num_epochs", type=int, default=301)
    p.add_argument("--num_trials", type=int, default=3)
    p.add_argument("--data_minibatch", type=int, default=128)
    p.add_argument("--inner_it", type=int, default=100)
    p.add_argument("--outer_it", type=int, default=100)
    p.add_argument("--trainer", type=str, default="nested",
                   choices=["nested", "hyper", "joint", "alternating"])
    p.add_argument("--hypergrad_approx", type=str, default="cg_normaleq",
                   choices=["cg_normaleq", "fixed_point", "neumann"],
                   help="AID solver for --trainer hyper (ref hyper_step "
                        "dispatch, psvi_classes.py:610,658-675)")
    p.add_argument("--stream_data", action="store_true",
                   help="host-streamed minibatches (train set stays in host "
                        "RAM; for datasets beyond HBM — ref DataLoader "
                        "semantics, psvi_classes.py:810-821)")
    p.add_argument("--inner_optimizer", type=str, default="adam",
                   choices=["adam", "adamw", "sgd", "heavy_ball", "rmsprop",
                            "adagrad", "adadelta", "adamax", "asgd", "rprop"],
                   help="inner-loop differentiable optimizer (ref zoo "
                        "robust_higher/optim.py:264-756)")
    p.add_argument("--hyper_K", type=int, default=30,
                   help="AID solver iterations (ref K=30, "
                        "psvi_classes.py:664)")
    p.add_argument("--linsys_lr", type=float, default=1e-4,
                   help="fixed-point AID contraction step size "
                        "(ref linsys_lr, psvi_classes.py:662)")
    p.add_argument("--diagonal", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--giga_growth", type=str, default="log_every",
                   choices=["log_every", "every_step"],
                   help="GIGA coreset growth cadence: 'log_every' "
                        "reproduces the reference's grow-only-on-logged-"
                        "iterations indentation defect (baselines.py:326); "
                        "'every_step' is the paper-correct mode "
                        "(Campbell & Broderick 2018)")
    p.add_argument("--architecture", type=str, default="logistic_regression")
    p.add_argument("--n_hidden", type=int, default=40)
    p.add_argument("--n_layers", type=int, default=1)
    p.add_argument("--init_sd", type=float, default=1e-6)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--register_elbos", action="store_true", default=False)
    p.add_argument("--init_at", type=str, default="subsample",
                   choices=["random", "subsample", "custom", "saved"])
    p.add_argument("--lr0net", type=float, default=1e-3)
    p.add_argument("--lr0u", type=float, default=1e-4)
    p.add_argument("--lr0v", type=float, default=1e-3)
    p.add_argument("--lr0z", type=float, default=1e-3)
    p.add_argument("--lr0alpha", type=float, default=1e-3)
    p.add_argument("--lr0joint", type=float, default=1e-3)
    p.add_argument("--init_dataset", type=str, default=None)
    p.add_argument("--coreset_sizes", nargs="+", type=int, default=[10])
    p.add_argument("--reset", action="store_true", default=False)
    p.add_argument("--reset_interval", type=int, default=10)
    p.add_argument("--prune", action="store_true", default=False)
    p.add_argument("--prune_interval", type=int, default=None)
    p.add_argument("--prune_sizes", nargs="+", type=int, default=[])
    p.add_argument("--increment", action="store_true", default=False)
    p.add_argument("--increment_interval", type=int, default=None)
    p.add_argument("--increment_sizes", nargs="+", type=int, default=[])
    p.add_argument("--retrain_on_coreset", action="store_true", default=False)
    p.add_argument("--test_ratio", type=float, default=0.2)
    p.add_argument("--log_pseudodata", action="store_true", default=False)
    p.add_argument("--data_folder", type=str, default="data")
    p.add_argument("--results_folder", type=str, default="results")
    p.add_argument("--learn_z", action="store_true", default=False)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--mfvi_selection_method", type=str, default="random")
    p.add_argument("--pretrain_epochs", type=int, default=5)
    p.add_argument("--load_from_saved", action="store_true", default=False)
    p.add_argument("--distance_fn", type=str, default="euclidean")
    p.add_argument("--last_layer_only", action="store_true", default=False)
    p.add_argument("--loaded_from_psvi", action="store_true", default=False)
    p.add_argument("--multiple_pts_per_cluster",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--choose_difficult",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--scoring_run", action="store_true", default=False)
    p.add_argument("--alpha_dirichlet", type=float, default=0.0)
    p.add_argument("--compute_weights_entropy",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--num_test", type=int, default=100)
    p.add_argument("--tau", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fnm", type=str, default="results",
                   help="filename (stem) for stored results")
    p.add_argument("--save_new_folder", action="store_true", default=False,
                   help="save results in a new timestamped folder")
    p.add_argument("--save_input_data", action="store_true", default=False,
                   help="save the input dataset arrays next to the results")
    p.add_argument("--notes", type=str, default="no notes",
                   help="notes on what this experiment is trying to "
                        "accomplish (persisted in config.json)")
    # TPU-native additions
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype through the matmul/conv stack; "
                        "bfloat16 = TPU mixed precision (f32 loss math)")
    p.add_argument("--trial_parallel", action="store_true", default=False,
                   help="advance all trials as one sharded SPMD program")
    p.add_argument("--mesh_trial_axis", type=int, default=0,
                   help="trial mesh axis size (0 = all devices)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler XLA trace of each PSVI run "
                        "here (tensorboard-compatible)")
    p.add_argument("--inner_unroll", type=int, default=None,
                   help="lax.scan unroll factor for the inner loop "
                        "(numerics-identical). Default 1 (rolled). Full unroll "
                        "(>= inner_it) is the measured steady-state "
                        "throughput ceiling (+26%% on the v5e flagship) "
                        "but pays ~40-100 s extra per-process compile/"
                        "trace — opt in for long sessions")
    p.add_argument("--fuse_convpool", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fold (conv, 2x2-maxpool) pairs into the "
                        "parity-split pooled conv (VIConvPool2d): the "
                        "pre-pool activations never materialize in the "
                        "bilevel unroll. Same math; --no-fuse_convpool "
                        "keeps the literal conv->pool formulation (A/B)")
    p.add_argument("--pool_backend", type=str, default="reshape",
                   choices=["reshape", "argmax"],
                   help="max-pool formulation for unfused pools: 'argmax' "
                        "stores int8 argmax residuals instead of the "
                        "reshape-pool's mask (disables fuse_convpool)")
    p.add_argument("--debug_nans", action="store_true", default=False,
                   help="enable jax_debug_nans — every jitted computation "
                        "re-runs op-by-op on a NaN and raises at the "
                        "producing op (the analog of the reference's "
                        "torch.autograd.set_detect_anomaly(True), "
                        "psvi_experiments.py:48)")
    p.add_argument("--fp64", action="store_true", default=False,
                   help="enable jax_enable_x64 (float64 default dtypes) "
                        "for numerics debugging; TPU hardware runs f64 "
                        "via software emulation — expect a large slowdown")
    p.add_argument("--backend", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="dense-layer compute backend: 'pallas' uses the "
                        "fused sample+matmul+NKL TPU kernel "
                        "(ops/pallas_vi.py) for mean-field dense layers")
    p.add_argument("--fused_inner", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="bilevel megakernel: run the nested trainer's inner "
                        "unroll + outer IW-ELBO + hypergradients as ONE "
                        "Pallas kernel on the logreg family "
                        "(ops/fused_nested.py). Default: auto (on-TPU when "
                        "the configuration is supported); --fused_inner "
                        "forces it (errors if unsupported), "
                        "--no-fused_inner disables")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="initialize JAX multi-controller mode before any "
                        "device query (multi-host meshes; coordinator from "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID, auto-detected on TPU pods) — see "
                        "parallel/distributed.py and "
                        "scripts/multihost_dryrun.py")
    return p


def main(argv=None):
    from psvi_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = build_parser().parse_args(argv)
    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit platform request — the axon sitecustomize
        # force-registers jax_platforms="axon,cpu" at interpreter start,
        # which would otherwise silently override JAX_PLATFORMS=cpu
        # (useful for host-driven baselines like giga/sparsevi whose
        # per-iteration host syncs pay the device-tunnel RTT)
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    if args.distributed:
        # must run before any jax device query (parallel/distributed.py)
        from psvi_tpu.parallel.distributed import initialize_distributed

        initialize_distributed()
    if args.debug_nans or args.fp64:
        import jax

        if args.debug_nans:
            # NaN guardrail (ref torch.autograd.set_detect_anomaly(True) at
            # every driver import, psvi_experiments.py:48 / flow_psvi.py:50)
            jax.config.update("jax_debug_nans", True)
        if args.fp64:
            jax.config.update("jax_enable_x64", True)
    method_args = vars(args)
    datasets = method_args.pop("datasets")
    methods = method_args.pop("methods")

    # --init_dataset names an alternate dataset whose points seed the
    # subsample init (engine kwarg init_dataset=(x, y); ref
    # psvi_classes.py:115,234 exposes it constructor-only)
    if isinstance(method_args.get("init_dataset"), str):
        pool = read_dataset(
            method_args["init_dataset"],
            test_ratio=method_args["test_ratio"],
            data_folder=method_args["data_folder"],
        )
        method_args["init_dataset"] = (pool.x, pool.y)

    if method_args.pop("trial_parallel", False):
        import jax

        from psvi_tpu.parallel import make_mesh, run_trials

        n_dev = method_args.pop("mesh_trial_axis", 0) or len(jax.devices())
        mesh = make_mesh(trial=n_dev)
        results = rec_dd()
        for dnm in datasets:
            data = read_dataset(dnm, test_ratio=method_args["test_ratio"],
                                data_folder=method_args["data_folder"])
            for nm in methods:
                kw = dict(method_args)
                for drop in ("num_trials", "coreset_sizes", "seed",
                             "mesh_trial_axis"):
                    kw.pop(drop, None)
                kw["init_args"] = kw.pop("init_at", "subsample")
                for ps in method_args["coreset_sizes"]:
                    res = run_trials(
                        data, method_args["num_trials"], method=nm,
                        mesh=mesh, num_pseudo=ps, **kw,
                    )
                    for t, r in enumerate(res):
                        results[dnm][nm][ps][t] = r
    else:
        results = experiment_driver(datasets, methods, method_args)

    # save layout parity with ref write_to_files (psvi_experiments.py:669-710):
    # --save_new_folder → timestamped subfolder; else flat into results_folder
    if method_args.get("save_new_folder", False):
        folder = get_save_foldername(
            method_args.get("results_folder", "results"), datasets, methods,
            method_args.get("mfvi_selection_method", "random"),
        )
    else:
        folder = method_args.get("results_folder", "results")
    save_results(results, folder, config={**method_args,
                                          "datasets": datasets,
                                          "methods": methods},
                 fnm=method_args.get("fnm", "results"))
    if method_args.get("save_input_data", False):
        import numpy as np

        # mirror the driver's reader choice (regression vs classification)
        is_regression = any(m in REGRESSOR_METHODS for m in methods)
        for dnm in datasets:
            if is_regression:
                data = read_regression_dataset(
                    dnm, seed=method_args.get("seed", 0),
                    num_test=method_args.get("num_test", 100),
                    data_dir=method_args.get("data_folder", "data"),
                )
            else:
                data = read_dataset(dnm, test_ratio=method_args["test_ratio"],
                                    data_folder=method_args["data_folder"])
            np.savez(os.path.join(folder, f"input_data_{dnm}.npz"),
                     x=np.asarray(data.x), y=np.asarray(data.y),
                     xt=np.asarray(data.xt), yt=np.asarray(data.yt))
    print(f"results saved to {folder}")
    return results


if __name__ == "__main__":
    main()

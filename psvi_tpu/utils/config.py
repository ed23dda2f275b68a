"""Typed experiment configuration.

Replaces the reference's ~45-flag argparse surface
(``psvi_experiments.py:50-380``) with a dataclass; field names match the
reference flags one-for-one so configs translate directly. The CLI in
``psvi_tpu/experiments.py`` exposes the same flag names.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class ExperimentConfig:
    # datasets / methods sweep (ref psvi_experiments.py:51-79)
    datasets: Tuple[str, ...] = ("halfmoon",)
    methods: Tuple[str, ...] = ("psvi_learn_v",)
    coreset_sizes: Tuple[int, ...] = (10,)
    num_trials: int = 1

    # scale (ref :80-102)
    mc_samples: int = 10
    num_epochs: int = 301
    data_minibatch: int = 128
    inner_it: int = 100
    outer_it: int = 100
    trainer: str = "nested"  # nested | hyper | joint | alternating
    # AID solver for trainer='hyper' (ref psvi_classes.py:610,658-675)
    hypergrad_approx: str = "cg_normaleq"  # cg_normaleq | fixed_point | neumann
    # inner-loop differentiable optimizer (ref robust_higher/optim.py zoo)
    inner_optimizer: str = "adam"
    # host-streamed minibatches for beyond-HBM datasets
    stream_data: bool = False
    diagonal: bool = True  # diagonal vs full covariance for laplace baselines
    # GIGA growth cadence: 'log_every' = reference-faithful (grows only on
    # logged iterations, a shipped indentation defect, ref baselines.py:326);
    # 'every_step' = paper-correct (Campbell & Broderick 2018)
    giga_growth: str = "log_every"

    # architecture (ref :103-140)
    architecture: str = "logistic_regression"
    n_hidden: int = 40
    n_layers: int = 1
    init_sd: float = 1e-6

    # logging (ref :141-166)
    log_every: int = 10
    register_elbos: bool = False
    log_pseudodata: bool = False

    # learning rates (ref :167-229)
    lr0net: float = 1e-3
    lr0u: float = 1e-4
    lr0v: float = 1e-3
    lr0z: float = 1e-3
    lr0alpha: float = 1e-3
    lr0joint: float = 1e-3
    gamma: float = 1.0  # StepLR decay

    # init / lifecycle (ref :230-330)
    init_at: str = "subsample"  # random | subsample | custom | saved
    reset: bool = False
    reset_interval: int = 10
    prune: bool = False
    prune_interval: Optional[int] = None
    prune_sizes: Tuple[int, ...] = ()
    increment: bool = False
    increment_interval: Optional[int] = None
    increment_sizes: Tuple[int, ...] = ()
    retrain_on_coreset: bool = False
    learn_z: bool = False

    # data handling (ref :331-380)
    test_ratio: float = 0.2
    data_folder: str = "data"
    results_folder: str = "results"

    # selection subsystem
    mfvi_selection_method: str = "random"
    pretrain_epochs: int = 5
    load_from_saved: bool = False
    distance_fn: str = "euclidean"
    last_layer_only: bool = False
    loaded_from_psvi: bool = True
    multiple_pts_per_cluster: bool = True
    choose_difficult: bool = True
    scoring_run: bool = False
    alpha_dirichlet: float = 0.0

    # regression
    tau: float = 0.1

    # extras (TPU-native additions)
    seed: int = 0
    compute_weights_entropy: bool = True
    fp64: bool = False  # jax_enable_x64 (numerics debugging; slow on TPU)
    debug_nans: bool = False  # jax_debug_nans (set_detect_anomaly analog)
    backend: str = "xla"  # dense-layer compute backend: xla | pallas
    mesh_trial_axis: int = 1  # number of mesh devices for the trial axis
    mesh_data_axis: int = 1  # number of mesh devices for the data-batch axis
    compute_dtype: str = "float32"  # 'bfloat16' = TPU mixed precision
    # fused bilevel kernels (None = auto on TPU; True force; False off)
    fused_inner: Optional[bool] = None
    # fold (conv, 2x2-maxpool) pairs into the parity-split pooled conv
    # (models/layers.VIConvPool2d); False = literal conv→pool formulation
    fuse_convpool: bool = True
    pool_backend: str = "reshape"  # 'argmax' = int8-argmax pool residuals
    # lax.scan unroll of the inner loop (identical math); None = 1.
    # Full unroll (>= inner_it) = steady-state ceiling, slow startup
    inner_unroll: Optional[int] = None

    def method_kwargs(self, **overrides):
        d = dataclasses.asdict(self)
        d.update(overrides)
        return d


@dataclasses.dataclass(frozen=True)
class MethodSpec:
    """Static structure of a PSVI-family method (the subclass lattice of
    ``psvi/inference/psvi_classes.py:1344-1934`` collapsed into flags)."""

    learn_v: bool = False
    parameterised: bool = False  # v on simplex via softmax (PSVILearnV :1350-1360)
    learn_alpha: bool = False  # global evidence rescaler (PSVIAV :1482-1489)
    learn_u: bool = True  # False for the FixedU variants (:1622-1883)
    learn_z: bool = False  # soft-label optimization
    no_rescaling: bool = False  # PSVI_No_Rescaling (:1363-1373)
    ablated: bool = False  # PSVI_Ablated objective (:1388-1408)
    single_sample_train: bool = False  # PSVI_No_IW (:1411-1472)
    evaluate_only: bool = False  # PSVIEvaluate (:1885-1934)
    # apply exp(alpha) in f(v) with alpha FIXED (not optimized):
    # PSVIEvaluate's f = exp(alpha)·softmax(v) with alpha.requires_grad_(False)
    # (:1896-1901) — alpha is 0 unless loaded non-ablated from a saved run
    alpha_fixed: bool = False
    increment_compatible: bool = True
    regressor: bool = False


# name → spec, mirroring inf_dict (ref psvi_experiments.py:402-458)
METHOD_SPECS = {
    "psvi": MethodSpec(),
    "psvi_learn_v": MethodSpec(learn_v=True, parameterised=True),
    "psvi_no_rescaling": MethodSpec(no_rescaling=True),
    "psvi_free_v": MethodSpec(learn_v=True, parameterised=False),
    "psvi_ablated": MethodSpec(learn_v=True, parameterised=True, ablated=True),
    "psvi_no_iw": MethodSpec(
        learn_v=True, parameterised=True, ablated=True, single_sample_train=True
    ),
    "psvi_alpha_v": MethodSpec(learn_v=True, parameterised=True, learn_alpha=True),
    "psvi_fixed_u": MethodSpec(learn_v=True, parameterised=True, learn_u=False),
    "psvi_alpha_fixed_u": MethodSpec(
        learn_v=True, parameterised=True, learn_alpha=True, learn_u=False
    ),
    "psvi_evaluate": MethodSpec(
        learn_v=False,
        learn_u=False,
        learn_z=True,
        learn_alpha=False,
        # f = exp(alpha)·softmax(v), alpha fixed (ref :1896-1901)
        parameterised=True,
        alpha_fixed=True,
        evaluate_only=True,
    ),
    "psvi_regressor": MethodSpec(regressor=True, learn_z=True),
    "psvi_learn_v_regressor": MethodSpec(
        learn_v=True, parameterised=True, regressor=True, learn_z=True
    ),
    "psvi_alpha_v_regressor": MethodSpec(
        learn_v=True, parameterised=True, learn_alpha=True, regressor=True,
        learn_z=True,
    ),
}

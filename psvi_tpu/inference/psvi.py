"""PSVI inference engine — the flagship path.

TPU-native re-design of the reference ``PSVI`` class hierarchy
(``psvi/inference/psvi_classes.py:83-1934``). Instead of 13 subclasses with
stateful torch modules, ``higher`` monkeypatching and per-method optimizer
mutation, the engine is:

- ONE jitted outer-step function per trainer, built over a pure
  ``PSVIState`` pytree;
- the subclass lattice collapsed into a static ``MethodSpec``
  (``psvi_tpu/utils/config.py:METHOD_SPECS``);
- the inner variational loop = ``jax.lax.scan`` over a pure differentiable
  Adam (``ops/optim.py``), with the outer gradient flowing through the
  unroll via ``jax.grad`` — replacing ``robust_higher`` entirely
  (ref ``nested_step`` :541-600);
- implicit-differentiation trainer via ``ops/hypergrad.cg_normaleq``
  (ref ``hyper_step`` :602-687);
- minibatching = on-device index sampling per outer step, replicating the
  reference's one-fresh-batch-per-step dataloader semantics (:894-898);
- evaluation = a jitted scan over padded test batches (ref ``evaluate``
  :1031-1108) including the importance-weighted predictive correction and
  IW/ESS diagnostics.

Lifecycle features (ref ``run_psvi`` :761-1028): weight reset (:1110-1128),
coreset pruning (:1177-1192), incremental learning (:1194-1217, :946-965),
retraining on the extracted coreset (:967-1003).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.data.datasets import DataBundle
from psvi_tpu.models.networks import set_up_model
from psvi_tpu.ops import elbo as E
from psvi_tpu.ops import hypergrad as H
from psvi_tpu.ops import optim as O
from psvi_tpu.utils.cache import enable_persistent_compile_cache
from psvi_tpu.utils.config import MethodSpec, METHOD_SPECS
from psvi_tpu.utils.resource import LogResource
from psvi_tpu.utils.prng import trial_key


class PSVIState(NamedTuple):
    params: Any  # variational network parameters
    u: jnp.ndarray  # pseudo-inputs (M, ...)
    z: jnp.ndarray  # pseudo-targets (M,) or (M, nc) soft labels
    v: jnp.ndarray  # raw log-likelihood weights (M,)
    alpha: jnp.ndarray  # global evidence rescaler, shape (1,)
    opt_u: Any
    opt_v: Any
    opt_z: Any
    opt_alpha: Any
    opt_net: Any  # persistent net optimizer (alternating / retrain)
    opt_joint: Any  # joint trainer state
    net_step: jnp.ndarray  # scheduler counter (int32)


def _count_pad(n, b):
    return (b - n % b) % b


class PSVI:
    """Black-box coreset VI engine (classification).

    Equivalent surface to ``PSVI.run_psvi`` and its subclasses; the method
    name (e.g. ``psvi_learn_v``) selects a ``MethodSpec``.
    """

    likelihood = "categorical"

    def __init__(
        self,
        data: DataBundle,
        method: str = "psvi_learn_v",
        num_pseudo: int = 10,
        seed: int = 0,
        mc_samples: int = 10,
        architecture: str = "logistic_regression",
        n_hidden: int = 40,
        n_layers: int = 1,
        init_sd: float = 1e-3,
        data_minibatch: int = 128,
        inner_it: int = 10,
        trainer: str = "nested",
        lr0net: float = 1e-3,
        lr0u: float = 1e-4,
        lr0v: float = 1e-3,
        lr0z: float = 1e-3,
        lr0alpha: float = 1e-3,
        lr0joint: float = 1e-3,
        gamma: float = 1.0,
        num_epochs: int = 100,
        log_every: int = 10,
        register_elbos: bool = False,
        init_args: str = "subsample",
        learn_z: Optional[bool] = None,
        reset: bool = False,
        reset_interval: int = 10,
        prune: bool = False,
        prune_interval: Optional[int] = None,
        prune_sizes: tuple = (),
        increment: bool = False,
        increment_interval: Optional[int] = None,
        increment_sizes: tuple = (),
        retrain_on_coreset: bool = False,
        log_pseudodata: bool = False,
        compute_weights_entropy: bool = True,
        tau: float = 0.1,
        hyper_K: int = 30,
        linsys_lr: float = 1e-4,
        # AID solver for trainer='hyper' (ref hyper_step dispatches on
        # hypergrad_approx ∈ {fixed_point, CG_normaleq},
        # psvi_classes.py:610,658-675); 'neumann' is the extra solver from
        # the vendored hypertorch stack (hypergradients.py:247-278)
        hypergrad_approx: str = "cg_normaleq",
        # inner-loop optimizer by reference name (the reference's
        # DifferentiableOptimizer zoo, robust_higher/optim.py:264-756 —
        # its engines only ever instantiate Adam, but the zoo is part of
        # the surface); see ops/optim.REGISTRY
        inner_optimizer: str = "adam",
        truncated: bool = False,
        truncated_K: int = 5,
        remat_inner: bool = False,
        # lax.scan unroll for the inner loop; numerically identical for
        # any value (tested). None (default) = 1, the amortization-aware
        # choice: with the round-5 hoisted eps stacks, unroll=2's old ~6%
        # win vanished (measured v5e flagship: unroll=1 26.8 ms/step vs
        # unroll=2 26.9 — a tie), and the rolled body halves tracing time
        # and compile-cache artifact size, which land in trial 0's
        # wall-clock. FULL unroll (inner_unroll >= T, e.g. 20 on the
        # flagship) is the measured steady-state ceiling — 21.4 ms/step
        # (983 vs 780 evals/s; the while loop and its stacking disappear
        # and XLA schedules across all 20 iterations; partial unrolls are
        # WORSE than either end: 4 -> 33 ms, 10 -> 37 ms) — but costs
        # ~100 s extra cold compile and ~40 s extra warm per-process
        # tracing/cache-load, breaking even only past ~7,000 outer
        # steps; production runs are ~101. Opt in for long-running /
        # serving sessions (bench.py does).
        inner_unroll: Optional[int] = None,
        compute_dtype: str = "float32",
        pool_backend: str = "reshape",  # 'argmax' = int8-argmax residuals
        # fold (conv, 2x2-maxpool) pairs into the parity-split pooled-conv
        # (models/layers.VIConvPool2d): the pre-pool activations never
        # materialize and the pool's reshape/broadcast chain disappears
        # from the bilevel unroll (see the layer docstring and
        # BENCHMARKS.md). Same math; disable for the literal conv→pool
        # formulation.
        fuse_convpool: bool = True,
        # dense-layer compute backend: 'pallas' = fused sample+matmul TPU
        # kernel (ops/pallas_vi.py) on mean-field VILinear layers.
        # First-order trainers/paths only (joint/alternating, MFVI, eval) —
        # nested needs double-backward through the layer and hyper's AID
        # solvers need jvp through it, neither of which custom_vjp provides.
        backend: str = "xla",
        # fused bilevel megakernel for the nested trainer on the logreg
        # family (single mean-field VILinear net): the ENTIRE nested step
        # — T inner Adam iterations + outer IW-ELBO + its gradients
        # through the unroll — runs as ONE Pallas kernel
        # (ops/fused_nested.py). 'auto' (default) = use it on TPU when the
        # configuration is supported; True = require (raises if not);
        # False = always the plain XLA path.
        fused_inner="auto",
        # fused-path eps stream: 'batched' (default) draws each layer's
        # (T·R, in) inner-noise block in ONE RNG call — statistically
        # identical to the plain path but a different stream; 'stream'
        # reproduces the plain path's per-iteration key folding bit-for-bit
        # (measured: the per-iteration stream costs ~100 us/step of the
        # 384 us fused step on v5e-1)
        fused_eps: str = "batched",
        packed: Optional[bool] = None,
        spec: Optional[MethodSpec] = None,
        mesh=None,
        shard_batch: bool = False,
        # shard the S (MC-sample) axis over the mesh 'mc' axis: every eps
        # leaf and hence every (S, ...) activation carries an 'mc' sharding
        # constraint; the IW softmax / Σ over S lower to XLA collectives
        # (SURVEY §2.6; ref S axis in neural_net.py:155-170)
        shard_mc: bool = False,
        # host-streamed minibatches: the train set stays in host RAM and
        # each chained dispatch ships only its (n_slots, B, ...) batch
        # stack — the reference's DataLoader semantics
        # (psvi_classes.py:810-821) for datasets beyond HBM. Bit-identical
        # batch selection to the device-resident path (same PRNG keys).
        stream_data: bool = False,
        mfvi_selection_method: str = "random",
        pretrain_epochs: int = 5,
        data_folder: Optional[str] = None,
        results_folder: Optional[str] = None,
        load_from_saved: bool = False,
        dnm: str = "data",
        multiple_pts_per_cluster: bool = True,
        alpha_dirichlet: float = 0.0,
        choose_difficult: bool = True,
        distance_fn: str = "euclidean",
        last_layer_only: bool = False,
        loaded_from_psvi: bool = False,
        scoring_run: bool = False,
        profile_dir: Optional[str] = None,
        # optional (x, y) arrays used as the subsample-init pool instead of
        # the training set — e.g. a disturbed copy of the data
        # (ref psvi_classes.py:115,234)
        init_dataset=None,
        **kwargs,
    ):
        enable_persistent_compile_cache()
        self.data = data
        self.method = method
        self.spec = spec if spec is not None else METHOD_SPECS[method]
        if learn_z is not None and learn_z:
            self.spec = dataclasses.replace(self.spec, learn_z=True)
        self.seed = seed
        self.N, self.D, self.nc = data.N, data.D, data.nc
        self.num_pseudo = (
            num_pseudo if not increment else (increment_sizes[0] if increment_sizes else num_pseudo)
        )
        self.mc_samples = 1 if self.spec.single_sample_train else mc_samples
        self.mc_samples_eval = 5 if self.spec.single_sample_train else mc_samples
        self.architecture = architecture
        self.n_hidden, self.n_layers, self.init_sd = n_hidden, n_layers, init_sd
        self.data_minibatch = min(data_minibatch, self.N)
        self.inner_it = inner_it
        self.trainer = trainer
        self.lrs = dict(
            net=lr0net, u=lr0u, v=lr0v, z=lr0z, alpha=lr0alpha, joint=lr0joint
        )
        self.gamma = gamma
        self.num_epochs = num_epochs
        self.log_every = log_every
        self.register_elbos = register_elbos
        self.init_args = init_args
        self.reset = reset
        self.reset_interval = reset_interval
        self.prune, self.prune_interval, self.prune_sizes = (
            prune, prune_interval, tuple(prune_sizes or ()),
        )
        self.increment, self.increment_interval = increment, increment_interval
        self.increment_sizes = tuple(increment_sizes or ())
        self.retrain_on_coreset = retrain_on_coreset
        self.log_pseudodata = log_pseudodata
        self.compute_weights_entropy = compute_weights_entropy
        self.tau = tau
        self.hyper_K, self.linsys_lr = hyper_K, linsys_lr
        if hypergrad_approx not in ("cg_normaleq", "fixed_point", "neumann"):
            raise ValueError(
                f"unknown hypergrad_approx {hypergrad_approx!r} "
                "(expected cg_normaleq | fixed_point | neumann)"
            )
        self.hypergrad_approx = hypergrad_approx
        if inner_optimizer.lower() not in O.REGISTRY:
            raise ValueError(
                f"unknown inner_optimizer {inner_optimizer!r}; "
                f"available: {sorted(O.REGISTRY)}"
            )
        self.inner_optimizer = inner_optimizer.lower()
        self.truncated, self.truncated_K = truncated, truncated_K
        self.remat_inner = remat_inner
        self.inner_unroll = (
            None if inner_unroll is None else max(int(inner_unroll), 1)
        )
        self.compute_dtype = compute_dtype
        self.pool_backend = pool_backend
        self.fuse_convpool = fuse_convpool
        if backend == "pallas" and trainer in ("nested", "hyper"):
            raise ValueError(
                "backend='pallas' serves first-order paths only "
                "(joint/alternating trainers, MFVI, eval); the nested "
                "trainer differentiates twice through the layer and the "
                "hyper trainer's AID solvers apply forward-mode (jvp) to "
                "it — the fused kernel's custom_vjp provides neither"
            )
        self.backend = backend
        self.fused_inner = fused_inner
        if fused_eps not in ("batched", "stream"):
            raise ValueError(f"unknown fused_eps {fused_eps!r}")
        self.fused_eps = fused_eps
        self.packed = packed
        self.mfvi_selection_method = mfvi_selection_method
        self.pretrain_epochs = pretrain_epochs
        self.data_folder = data_folder
        self.results_folder = results_folder
        self.load_from_saved = load_from_saved
        self.dnm = dnm
        self.multiple_pts_per_cluster = multiple_pts_per_cluster
        self.alpha_dirichlet = alpha_dirichlet
        self.choose_difficult = choose_difficult
        self.distance_fn = distance_fn
        self.last_layer_only = last_layer_only
        self.loaded_from_psvi = loaded_from_psvi
        self.scoring_run = scoring_run
        self.profile_dir = profile_dir
        self.init_dataset = init_dataset
        self.elbos = []
        self.results: dict = {}
        self.chosen_indices: list = []
        self._custom_v = None

        self.key = trial_key(seed, 0)

        # device-resident data (or host-resident train set when streaming)
        if stream_data and increment:
            raise ValueError(
                "stream_data is incompatible with incremental learning "
                "(the growing task re-materializes the train set; "
                "incremental datasets are small by construction)"
            )
        self.stream_data = stream_data
        self._train_asarray = np.asarray if stream_data else jnp.asarray
        self.x_train = self._train_asarray(data.x)
        self.y_train = self._train_asarray(data.y)
        self.x_test = jnp.asarray(data.xt)
        self.y_test = jnp.asarray(data.yt)

        # incremental learning: start with classes {0, 1}
        # (ref run_psvi :823-832)
        if self.increment:
            self._full_xy = (np.asarray(data.x), np.asarray(data.y))
            self._full_xy_test = (np.asarray(data.xt), np.asarray(data.yt))
            self.nc = 2
            tr_mask = np.isin(np.asarray(data.y), [0, 1])
            te_mask = np.isin(np.asarray(data.yt), [0, 1])
            self.x_train = self._train_asarray(np.asarray(data.x)[tr_mask])
            self.y_train = self._train_asarray(np.asarray(data.y)[tr_mask])
            self.x_test = jnp.asarray(np.asarray(data.xt)[te_mask])
            self.y_test = jnp.asarray(np.asarray(data.yt)[te_mask])
            self.train_data_so_far = int(tr_mask.sum())

        self.n_train_now = int(self.x_train.shape[0])
        self.data_minibatch = min(self.data_minibatch, self.n_train_now)

        # optional data-parallel minibatch sharding over a mesh 'data' axis
        self.mesh = mesh
        self.batch_shardings = None
        if mesh is not None and shard_batch:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = self.x_train.ndim
            self.batch_shardings = (
                NamedSharding(mesh, P("data", *([None] * (nd - 1)))),
                NamedSharding(mesh, P("data")),
            )
            # round the minibatch down to a multiple of the data-axis size
            dsize = mesh.shape["data"]
            self.data_minibatch = max(dsize, (self.data_minibatch // dsize) * dsize)

        # optional MC-chain sharding over a mesh 'mc' axis: constrain the
        # leading S axis of every eps leaf; activations inherit the layout
        # through the einsums and the reductions over S become collectives
        self.shard_mc = bool(shard_mc)
        if self.shard_mc:
            if mesh is None or "mc" not in mesh.shape:
                raise ValueError(
                    "shard_mc=True needs a mesh with an 'mc' axis "
                    "(parallel.make_mesh(mc=...))"
                )
            msize = mesh.shape["mc"]
            if self.mc_samples % msize or self.mc_samples_eval % msize:
                raise ValueError(
                    f"mc_samples ({self.mc_samples}) and mc_samples_eval "
                    f"({self.mc_samples_eval}) must be divisible by the "
                    f"mesh 'mc' axis size ({msize})"
                )

        self._build_model()
        self._init_state()
        self._compile()
        # snapshot for trial reseeding (lifecycle runs mutate these)
        self._orig_num_pseudo = self.num_pseudo
        self._orig_nc = self.nc

    def reseed(self, seed: int):
        """Re-initialize for a new trial of the SAME static config, reusing
        the compiled step/eval executables (identical shapes → jit cache
        hits). Sequential trials in one process skip the ~40 s bilevel
        recompile the reference pays nothing for (torch is eager) but a
        per-trial fresh engine would pay here."""
        self.seed = seed
        self.key = trial_key(seed, 0)
        self.elbos = []
        self.results = {}
        self.chosen_indices = []
        self._custom_v = None
        for attr in ("forgetting_events", "last_acc", "never_learnt"):
            if hasattr(self, attr):
                delattr(self, attr)
        needs_recompile = False
        if self.num_pseudo != self._orig_num_pseudo or self.nc != self._orig_nc:
            # prune/increment mutated coreset size / class count / data views
            self.num_pseudo = self._orig_num_pseudo
            self.nc = self._orig_nc
            if self.increment:
                self._reset_increment_data()
            self._build_model()
            needs_recompile = True
        self._init_state()
        if needs_recompile:
            self._compile()

    def _reset_increment_data(self):
        """Restore the incremental-learning initial task (classes {0, 1})."""
        fx, fy = self._full_xy
        ftx, fty = self._full_xy_test
        tr_mask = np.isin(fy, [0, 1])
        te_mask = np.isin(fty, [0, 1])
        self.x_train = self._train_asarray(fx[tr_mask])
        self.y_train = self._train_asarray(fy[tr_mask])
        self.x_test = jnp.asarray(ftx[te_mask])
        self.y_test = jnp.asarray(fty[te_mask])
        self.train_data_so_far = int(tr_mask.sum())
        self.n_train_now = int(self.x_train.shape[0])
        self.data_minibatch = min(self.data_minibatch, self.n_train_now)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def _build_model(self):
        n_channels = self.data.channels or 1
        self.net = set_up_model(
            self.architecture, self.D, self.n_hidden, self.nc, self.init_sd,
            n_layers=self.n_layers, n_channels=n_channels,
        )
        if self.compute_dtype != "float32":
            from psvi_tpu.models.layers import with_compute_dtype

            self.net = with_compute_dtype(self.net, self.compute_dtype)
        if self.pool_backend != "reshape":
            from psvi_tpu.models.layers import with_pool_backend

            self.net = with_pool_backend(self.net, self.pool_backend)
        elif self.fuse_convpool and not self.packed:
            # parity-split pooled conv (no-op for nets without
            # (conv, k==s maxpool) pairs); an explicit pool_backend or
            # packed=True keeps the literal formulation
            from psvi_tpu.models.layers import fuse_conv_pool

            self.net = fuse_conv_pool(self.net)
        if self.backend != "xla":
            from psvi_tpu.models.layers import with_dense_backend

            self.net = with_dense_backend(self.net, self.backend)
        if self.packed:
            # Packed flat-parameter representation (models/packed.py):
            # collapses the inner loop's per-tensor op chains into single
            # fused chains. Opt-in: measured ~6% SLOWER than per-layer on
            # the v5e flagship step (320 vs 567 ops/iter, but flat slices
            # pay re-tiling copies into the matmul layouts) — kept for
            # experimentation at other scales.
            from psvi_tpu.models.packed import pack_net

            pnet = pack_net(self.net)
            if pnet is None:
                raise ValueError(
                    f"packed=True unsupported for architecture "
                    f"{self.architecture!r} (non-mean-field or stateful layers)"
                )
            self.net = pnet
        self._state_builder = None  # closes over self.net — invalidate

    def _core_weights(self, v, alpha):
        """N·f(v): the coreset likelihood weighting (ref f maps,
        ``psvi_classes.py:111,1358-1360,1486-1488``)."""
        if self.spec.parameterised:
            fv = jax.nn.softmax(v)
        else:
            fv = v
        if self.spec.learn_alpha or self.spec.alpha_fixed:
            fv = jnp.exp(alpha[0]) * fv
        return self.N * fv, fv

    def _init_pseudodata(self, key):
        """Pseudodata init (ref :229-308): 'subsample' = class-balanced random
        subset; 'random' = noisy empirical mean + balanced labels."""
        M, nc = self.num_pseudo, self.nc
        if self.init_dataset is not None:
            # alternate init pool (ref :234): subsample from it, not train
            x_np = np.asarray(self.init_dataset[0])
            y_np = np.asarray(self.init_dataset[1])
        else:
            x_np = np.asarray(self.x_train)
            y_np = np.asarray(self.y_train)
        rng = np.random.default_rng(self.seed)
        ppc = [M // nc] * nc
        ppc[-1] = M - sum(ppc[:-1])
        if self.init_args == "custom":
            # selection-subsystem init (ref custom_init :310-375): pick by
            # the configured score method, then RANDOM-normal raw v weights
            from psvi_tpu.inference.selection import CoresetSelect

            sel = CoresetSelect(
                x_np, y_np, np.asarray(self.x_test), np.asarray(self.y_test),
                num_pseudo=M, nc=nc, architecture=self.architecture,
                D=self.D, n_hidden=self.n_hidden or 100,
                mc_samples=self.mc_samples, init_sd=self.init_sd,
                data_minibatch=self.data_minibatch,
                pretrain_epochs=self.pretrain_epochs,
                lr0net=self.lrs["net"], seed=self.seed,
                score_method=self.mfvi_selection_method,
                data_folder=self.data_folder,
                load_from_saved=self.load_from_saved, dnm=self.dnm,
                multiple_pts_per_cluster=self.multiple_pts_per_cluster,
                alpha_dirichlet=self.alpha_dirichlet,
                choose_difficult=self.choose_difficult,
                distance_fn=self.distance_fn,
                last_layer_only=self.last_layer_only,
                loaded_from_psvi=self.loaded_from_psvi,
                n_channels=self.data.channels or 1,
            )
            idx, xs, zs_np, _ = sel.select_data()
            self.chosen_indices = idx
            u = jnp.asarray(xs, jnp.float32)
            z = jnp.asarray(zs_np, jnp.float32)
            if self.spec.learn_z and self.likelihood == "categorical":
                z = jax.nn.one_hot(z.astype(jnp.int32), nc, dtype=jnp.float32)
            # random-normal raw weights (ref :373-374)
            self._custom_v = jnp.asarray(
                rng.standard_normal(M).astype(np.float32)
            )
            return u, z
        if self.init_args in ("subsample", "saved"):
            # 'saved' falls back to subsample when no stored run is given;
            # use PSVI.load_saved_coreset to warm-start from results.
            us, zs, idcs = [], [], []
            for c in range(nc):
                cls_idx = np.where(y_np == c)[0]
                take = rng.choice(cls_idx, size=ppc[c], replace=len(cls_idx) < ppc[c])
                us.append(x_np[take])
                zs.append(np.full(ppc[c], c, dtype=np.float32))
                idcs.extend(take.tolist())
            u = jnp.asarray(np.concatenate(us))
            z = jnp.asarray(np.concatenate(zs))
            self.chosen_indices = idcs
        elif self.init_args == "random":
            mean = x_np.mean(axis=0, keepdims=True)
            u = jnp.asarray(
                mean + 1.0 * rng.standard_normal((M,) + x_np.shape[1:]).astype(np.float32)
            )
            z = jnp.asarray(
                np.concatenate([np.full(p, c, dtype=np.float32) for c, p in enumerate(ppc)])
            )
        else:
            raise ValueError(f"unknown init_args {self.init_args!r}")

        if self.spec.learn_z and self.likelihood == "categorical":
            z = jax.nn.one_hot(z.astype(jnp.int32), nc, dtype=jnp.float32)
        return u, z

    def _init_v(self):
        M = self.num_pseudo
        if self._custom_v is not None:
            # custom selection init: random-normal raw v (ref :373-374)
            return self._custom_v
        if self.spec.parameterised:
            # PSVILearnV: v = 0 on the softmax parameterization (:1353-1357)
            return jnp.zeros((M,), jnp.float32)
        v = jnp.full((M,), 1.0 / M, jnp.float32)
        if self.spec.no_rescaling:
            v = v / self.N  # PSVI_No_Rescaling (:1371-1373)
        return v

    def _init_state(self):
        self.key, k_model, k_pseudo = jax.random.split(self.key, 3)
        u, z = self._init_pseudodata(k_pseudo)  # host-side (numpy RNG)
        v = self._init_v()

        self.opt_u = O.adam(self.lrs["u"])
        self.opt_v = O.adam(self.lrs["v"])
        self.opt_z = O.adam(self.lrs["z"])
        self.opt_alpha = O.adam(self.lrs["alpha"])
        self.opt_net = O.adam(self.lrs["net"])
        self.opt_joint = O.adam(self.lrs["joint"])
        # retrain phase uses a FRESH Adam at lr0joint (ref :971)
        self.opt_retrain = O.adam(self.lrs["joint"])
        self.inner_opt = O.make(self.inner_optimizer, self.lrs["net"])

        # StepLR schedule for the net lr (ref :803-807,864-866)
        epoch_quarter = (self.N // self.data_minibatch) // 4
        self.lr_net_sched = O.step_lr(
            self.lrs["net"], epoch_quarter if epoch_quarter > 0 else 10000,
            self.gamma,
        )

        if getattr(self, "_state_builder", None) is None:

            def build(k_model, u, z, v):
                # ONE jitted program for the whole state: eager per-op
                # dispatch costs ~0.3 s/op over the axon tunnel (measured:
                # 18 s for a logreg state); a single compile + dispatch
                # makes construction and per-trial reseeding near-free.
                params = self.net.init(k_model)
                alpha = jnp.zeros((1,), jnp.float32)
                joint_leaves = {"params": params, "u": u}
                if self.spec.learn_v:
                    joint_leaves["v"] = v
                return PSVIState(
                    params=params, u=u, z=z, v=v, alpha=alpha,
                    opt_u=self.opt_u.init(u),
                    opt_v=self.opt_v.init(v),
                    opt_z=self.opt_z.init(z),
                    opt_alpha=self.opt_alpha.init(alpha),
                    opt_net=self.opt_net.init(params),
                    opt_joint=self.opt_joint.init(joint_leaves),
                    net_step=jnp.zeros((), jnp.int32),
                )

            self._state_builder = jax.jit(build)

        self.state = self._state_builder(k_model, u, z, v)

    # ------------------------------------------------------------------
    # objectives over state
    # ------------------------------------------------------------------

    @property
    def _learn_z_kldiv(self):
        return self.spec.learn_z and self.likelihood == "categorical"

    def _inner_loss(self, params, eps, u, z, v, alpha):
        cw, _ = self._core_weights(v, alpha)
        return E.inner_elbo(
            self.net, params, eps, u, z, cw,
            likelihood=self.likelihood, learn_z=self._learn_z_kldiv,
            nc=self.nc, tau=self.tau,
        )

    def _outer_loss(self, params, eps, u, z, v, alpha, xb, yb):
        if self.spec.ablated:
            return E.ablated_elbo(
                self.net, params, eps, xb, yb, self.N,
                likelihood=self.likelihood, nc=self.nc, tau=self.tau,
            )
        cw, _ = self._core_weights(v, alpha)
        return E.psvi_elbo(
            self.net, params, eps, u, z, cw, xb, yb, self.N,
            likelihood=self.likelihood, learn_z=self._learn_z_kldiv,
            nc=self.nc, tau=self.tau,
        )

    def _run_inner(self, params0, u, z, v, alpha, key, lr_now, n_steps=None,
                   opt=None, opt_state=None):
        """T differentiable inner Adam steps via lax.scan (ref nested_step
        :549-555; fresh optimizer state per outer step, matching
        ``higher.innerloop_ctx`` semantics)."""
        T = self.inner_it if n_steps is None else n_steps
        opt = opt or self.inner_opt
        opt_state = opt_state if opt_state is not None else opt.init(params0)
        keys = jax.random.split(key, max(T, 1))
        # Pre-draw ALL T iterations' reparameterization noise OUTSIDE the
        # scan (vmap over the same per-iteration keys — bit-identical
        # values to drawing inside the body) and feed it as scan xs: the
        # ~10 threefry chains per iteration leave the unrolled bilevel
        # body, replaced by the scan's native slicing. On the
        # per-op-latency-bound flagship step this is a pure op-count win.
        eps_stack = jax.vmap(
            lambda k: self._sample_eps(k, self.mc_samples)
        )(keys[:T])

        def body(carry, eps):
            params, ostate = carry
            loss, g = jax.value_and_grad(self._inner_loss)(
                params, eps, u, z, v, alpha
            )
            params, ostate = opt.step(params, g, ostate, lr_now)
            return (params, ostate), loss

        if self.remat_inner:
            body = jax.checkpoint(body)
        if self.inner_unroll is None:
            unroll = 1  # auto (see __init__)
        else:
            unroll = min(self.inner_unroll, max(T, 1))
        (paramsT, ostateT), inner_losses = jax.lax.scan(
            body, (params0, opt_state), eps_stack, unroll=unroll,
        )
        return paramsT, ostateT, inner_losses

    # ------------------------------------------------------------------
    # trainers
    # ------------------------------------------------------------------

    def _sample_eps(self, key, S):
        """Sample the reparameterization noise, optionally constrained so
        the leading S axis shards over the mesh 'mc' axis (shard_mc=True).
        All (S, ...) activations downstream inherit the layout through the
        einsums; the IW softmax and Σ over S lower to XLA collectives."""
        eps = self.net.sample_eps(key, S)
        if self.shard_mc:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def put(x):
                s = NamedSharding(
                    self.mesh, P("mc", *([None] * (x.ndim - 1)))
                )
                return jax.lax.with_sharding_constraint(x, s)

            eps = jax.tree_util.tree_map(put, eps)
        return eps

    def _sample_batch(self, key):
        idx = jax.random.choice(
            key, self.n_train_now, (self.data_minibatch,), replace=False
        )
        xb, yb = self.x_train[idx], self.y_train[idx]
        if self.batch_shardings is not None:
            # data-parallel minibatch: rows sharded over the 'data' mesh axis;
            # XLA turns the Σ over the batch in data_nll into a psum over ICI
            sx, sy = self.batch_shardings
            xb = jax.lax.with_sharding_constraint(xb, sx)
            yb = jax.lax.with_sharding_constraint(yb, sy)
        return xb, yb

    def _hyper_tree(self, state: PSVIState):
        h = {}
        if self.spec.learn_u and not self.spec.evaluate_only:
            h["u"] = state.u
        if self.spec.learn_v:
            h["v"] = state.v
        if self.spec.learn_z and not self.spec.evaluate_only:
            h["z"] = state.z
        if self.spec.learn_alpha:
            h["alpha"] = state.alpha
        return h

    def _apply_hyper_updates(self, state: PSVIState, grads):
        u, v, z, alpha = state.u, state.v, state.z, state.alpha
        opt_u, opt_v, opt_z, opt_alpha = (
            state.opt_u, state.opt_v, state.opt_z, state.opt_alpha,
        )
        if "u" in grads:
            u, opt_u = self.opt_u.step(u, grads["u"], opt_u)
        if "v" in grads:
            v, opt_v = self.opt_v.step(v, grads["v"], opt_v)
            if not self.spec.parameterised:
                v = jnp.maximum(v, 0.0)  # clamp (ref :585-591)
        if "z" in grads:
            z, opt_z = self.opt_z.step(z, grads["z"], opt_z)
        if "alpha" in grads:
            alpha, opt_alpha = self.opt_alpha.step(alpha, grads["alpha"], opt_alpha)
        return state._replace(
            u=u, v=v, z=z, alpha=alpha, opt_u=opt_u, opt_v=opt_v,
            opt_z=opt_z, opt_alpha=opt_alpha,
        )

    def _get_batch(self, k_batch, batch):
        """Minibatch source: device-resident index-gather by default, or a
        host-streamed batch passed in as an argument (``stream_data=True`` —
        the reference's host DataLoader semantics, psvi_classes.py:810-821,
        for datasets that do not fit in HBM; SURVEY §2.6 host data layer).
        Streamed batches still get the data-parallel sharding constraint."""
        if batch is None:
            return self._sample_batch(k_batch)
        xb, yb = batch
        if self.batch_shardings is not None:
            sx, sy = self.batch_shardings
            xb = jax.lax.with_sharding_constraint(xb, sx)
            yb = jax.lax.with_sharding_constraint(yb, sy)
        return xb, yb

    def _nested_step(self, state: PSVIState, key, batch=None):
        """Bilevel step: differentiate the outer IW-ELBO through the unrolled
        inner loop (ref ``nested_step`` :541-600)."""
        k_batch, k_inner, k_outer = jax.random.split(key, 3)
        xb, yb = self._get_batch(k_batch, batch)
        lr_now = self.lr_net_sched(state.net_step)
        hyper = self._hyper_tree(state)

        params0 = state.params
        if self.truncated:
            # non-differentiated warmup with a fresh Adam(1e-4) (ref :561-571)
            warm_opt = O.adam(1e-4)
            params0, _, _ = self._run_inner(
                params0, self.net.prep_input(state.u), state.z, state.v,
                state.alpha, jax.random.fold_in(k_inner, 1),
                lr_now=jnp.float32(1e-4),
                n_steps=self.inner_it - self.truncated_K, opt=warm_opt,
            )

        def outer(h):
            u = h.get("u", state.u)
            v = h.get("v", state.v)
            z = h.get("z", state.z)
            alpha = h.get("alpha", state.alpha)
            # patch-extract u ONCE, outside the T-deep inner scan: the
            # scan's per-iteration cotangent w.r.t. the prepped input is
            # then one accumulation; the extraction transpose runs once
            # here (layers.PrePatched; no-op for non-conv-headed nets)
            paramsT, _, inner_losses = self._run_inner(
                params0, self.net.prep_input(u), z, v, alpha, k_inner,
                lr_now,
                n_steps=self.truncated_K if self.truncated else None,
            )
            eps = self._sample_eps(k_outer, self.mc_samples)
            loss = self._outer_loss(paramsT, eps, u, z, v, alpha, xb, yb)
            return loss, (paramsT, inner_losses)

        if hyper:
            (loss, (paramsT, inner_losses)), grads = jax.value_and_grad(
                outer, has_aux=True
            )(hyper)
            state = self._apply_hyper_updates(state, grads)
        else:
            loss, (paramsT, inner_losses) = outer(hyper)

        state = state._replace(
            params=paramsT, net_step=state.net_step + 1
        )
        return state, {"outer_loss": loss, "inner_losses": inner_losses}

    # -- fused bilevel megakernel paths ---------------------------------
    # (ops/fused_nested.py: whole-step dense kernel; ops/fused_lenet.py:
    #  conv-family inner-unroll kernel pair with the outer ELBO in XLA)

    def _use_fused_inner(self):
        """Which fused bilevel kernel serves this config: 'dense'
        (ops/fused_nested), 'lenet' (ops/fused_lenet), or None."""
        from psvi_tpu.ops import fused_lenet as FLK
        from psvi_tpu.ops import fused_nested as FN

        if self.fused_inner is False:
            return None
        # CLI default (None) means 'auto'
        if self.fused_inner is None:
            self.fused_inner = "auto"
        which = "dense" if FN.supports(self) else (
            "lenet" if FLK.supports(self) else None
        )
        if self.fused_inner is True:
            if which is None:
                raise ValueError(
                    "fused_inner=True requires a fused-kernel-supported "
                    "nested configuration: the logreg family (single "
                    "mean-field VILinear net, categorical or Gaussian "
                    "likelihood, f32, no eps/batch sharding) or the LeNet "
                    "family (two pooled 5x5 convs + three dense layers, "
                    "categorical hard labels), with the plain nested "
                    "trainer and inner Adam"
                )
            return which
        # 'auto': only where it wins — the Mosaic kernels exist to beat
        # per-op dispatch latency on a real TPU. The conv-family kernel is
        # NEVER auto-selected: its Mosaic compile is measured-tractable
        # only for small mc_samples (S=3: ~4 min; S=10: ~68 min then a
        # VMEM OOM from 143 MB of register-allocator spill slots —
        # BENCHMARKS.md "conv-family fused kernel"), so it is explicit
        # opt-in via fused_inner=True.
        if which == "lenet":
            return None
        return which if jax.default_backend() == "tpu" else None

    def _fused_dense_idx(self):
        from psvi_tpu.models.layers import VILinear

        return [
            i for i, l in enumerate(self.net.layers) if type(l) is VILinear
        ]

    def _fused_cfg(self, B: int):
        from psvi_tpu.ops.fused_nested import FusedCfg

        dense = [self.net.layers[i] for i in self._fused_dense_idx()]
        widths = tuple([dense[0].in_dim] + [l.out_dim for l in dense])
        cfg = FusedCfg(
            T=self.inner_it, S=self.mc_samples, widths=widths,
            M=self.num_pseudo, B=B, N=float(self.N),
            parameterised=self.spec.parameterised,
            use_alpha=self.spec.learn_alpha or self.spec.alpha_fixed,
            prior_sd=float(dense[0].prior_sd),
            likelihood=self.likelihood, tau=float(self.tau),
            learn_z=bool(self.spec.learn_z and self.likelihood == "gaussian"),
        )
        # auto-remat: keep the kernel inside Mosaic's ~16 MB scoped VMEM
        if cfg.residual_bytes() > 8 * 1024 * 1024:
            cfg = dataclasses.replace(cfg, remat=True)
        return cfg

    def _nested_step_fused(self, state: PSVIState, key, batch=None):
        """The nested step with the bilevel core executed as ONE Pallas
        kernel. Key-folding and update order are identical to
        ``_nested_step`` (same eps streams → statistically identical
        trajectories; only float reassociation differs)."""
        from psvi_tpu.ops.fused_nested import fused_nested_outer

        k_batch, k_inner, k_outer = jax.random.split(key, 3)
        xb, yb = self._get_batch(k_batch, batch)
        lr_now = self.lr_net_sched(state.net_step)
        T, S, nc = self.inner_it, self.mc_samples, self.nc
        M, B = self.num_pseudo, xb.shape[0]
        didx = self._fused_dense_idx()
        L = len(didx)
        cfg = self._fused_cfg(B)
        widths = cfg.widths

        # same per-iteration eps stream as _run_inner (split + sample_eps).
        # Layouts for the rank-2 kernel: hidden layers SAMPLE-MAJOR
        # (rows s·out+o = plain reshape), last layer CLASS-MAJOR
        # (rows c·S+s = transpose first).
        def flat_w(e, lyr, lead=()):
            out, inn = widths[lyr + 1], widths[lyr]
            n = int(np.prod(lead, dtype=int)) if lead else 1
            if lyr == L - 1:
                perm = tuple(range(len(lead))) + (
                    len(lead) + 1, len(lead), len(lead) + 2,
                )
                e = jnp.transpose(e, perm)
            return e.reshape(n * S * out, inn)

        def flat_b(e, lyr, lead=()):
            out = widths[lyr + 1]
            n = int(np.prod(lead, dtype=int)) if lead else 1
            if lyr == L - 1:
                perm = tuple(range(len(lead))) + (
                    len(lead) + 1, len(lead),
                )
                e = jnp.transpose(e, perm)
            return e.reshape(n * S * out, 1)

        if self.fused_eps == "batched":
            # one draw per layer/leaf for the whole T-deep unroll
            eps_wi, eps_bi = [], []
            for lyr in range(L):
                kl_ = jax.random.fold_in(k_inner, lyr)
                kw_, kb_ = jax.random.split(kl_)
                R = S * widths[lyr + 1]
                eps_wi.append(
                    jax.random.normal(kw_, (T * R, widths[lyr]))
                )
                eps_bi.append(jax.random.normal(kb_, (T * R, 1)))
            eps_wi, eps_bi = tuple(eps_wi), tuple(eps_bi)
        else:  # 'stream': bit-compatible with the plain path
            keys = jax.random.split(k_inner, max(T, 1))
            eps_ts = jax.vmap(lambda k: self.net.sample_eps(k, S))(keys[:T])
            eps_wi = tuple(
                flat_w(eps_ts[i]["w"], lyr, lead=(T,))
                for lyr, i in enumerate(didx)
            )
            eps_bi = tuple(
                flat_b(eps_ts[i]["b"], lyr, lead=(T,))
                for lyr, i in enumerate(didx)
            )
        eo = self.net.sample_eps(k_outer, S)
        eps_wo = tuple(
            flat_w(eo[i]["w"], lyr) for lyr, i in enumerate(didx)
        )
        eps_bo = tuple(
            flat_b(eo[i]["b"], lyr) for lyr, i in enumerate(didx)
        )

        params0 = []
        for lyr, i in enumerate(didx):
            p = state.params[i]
            out = widths[lyr + 1]
            params0 += [
                p["mu_w"], p["rho_w"],
                p["mu_b"].reshape(out, 1), p["rho_b"].reshape(out, 1),
            ]
        if self.likelihood == "gaussian":
            # regressor family: raw targets as (1, P) rows (ref :2038)
            ypse = state.z.reshape(1, M)
            ybat = yb.reshape(1, B)
        else:
            ypse = jax.nn.one_hot(state.z.astype(jnp.int32), nc).T
            ybat = jax.nn.one_hot(yb.astype(jnp.int32), nc).T
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        loss, inner_losses, pT, g_u, g_v, g_alpha, g_z = fused_nested_outer(
            tuple(params0),
            state.u, state.v.reshape(1, M), state.alpha.reshape(1, 1),
            ypse, ybat, eps_wi, eps_bi, eps_wo, eps_bo, xb,
            jnp.asarray(lr_now, jnp.float32).reshape(1, 1),
            cfg, backend=backend,
        )

        grads = {}
        if self.spec.learn_u and not self.spec.evaluate_only:
            grads["u"] = g_u
        if self.spec.learn_v:
            grads["v"] = g_v.reshape(M)
        if self.spec.learn_z and self.likelihood == "gaussian":
            grads["z"] = g_z.reshape(M)
        if self.spec.learn_alpha:
            grads["alpha"] = g_alpha.reshape(1)
        state = self._apply_hyper_updates(state, grads)

        params = list(state.params)
        for lyr, i in enumerate(didx):
            out = widths[lyr + 1]
            params[i] = {
                "mu_w": pT[4 * lyr], "rho_w": pT[4 * lyr + 1],
                "mu_b": pT[4 * lyr + 2].reshape(out),
                "rho_b": pT[4 * lyr + 3].reshape(out),
            }
        state = state._replace(
            params=tuple(params), net_step=state.net_step + 1
        )
        return state, {"outer_loss": loss, "inner_losses": inner_losses}

    def _nested_step_fused_lenet(self, state: PSVIState, key, batch=None):
        """The nested step with the T-iteration differentiable inner loop
        executed as the fused conv-family Pallas kernel pair
        (ops/fused_lenet.py kernels A/B behind one custom_vjp); the outer
        IW-ELBO and hyper-updates stay in XLA, identical to
        ``_nested_step``. With ``fused_eps='stream'`` the inner noise is
        bit-identical to ``_run_inner``'s per-iteration stream (same
        draws, kernel layout); the default 'batched' draws in-kernel
        (Box-Muller) — a different but iid-identical stream."""
        from psvi_tpu.ops import fused_lenet as FLK

        k_batch, k_inner, k_outer = jax.random.split(key, 3)
        xb, yb = self._get_batch(k_batch, batch)
        lr_now = self.lr_net_sched(state.net_step)
        hyper = self._hyper_tree(state)

        cfg = FLK.cfg_from_engine(self)
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        fn = FLK.make_fused_unroll(cfg, backend=backend)
        didx = list(self.net.variational_layers)  # conv1,conv2,fc1,fc2,fc3
        lr = jnp.asarray(lr_now, jnp.float32).reshape(1, 1)
        ypse = jax.nn.one_hot(state.z.astype(jnp.int32), cfg.nc).T
        if cfg.eps_mode == "input":
            keys = jax.random.split(k_inner, max(cfg.T, 1))
            eps_ts = jax.vmap(
                lambda k: self.net.sample_eps(k, cfg.S)
            )(keys[: cfg.T])
            stacks = FLK.eps_stacks_from_tree(eps_ts, didx, cfg)
            seed = jnp.zeros((1, 2), jnp.float32)
        else:
            stacks = ()
            seed = FLK.seed_halves(k_inner)

        def outer(h):
            u = h.get("u", state.u)
            v = h.get("v", state.v)
            alpha = h.get("alpha", state.alpha)
            p_flat = FLK.pack_params(
                tuple(state.params[i] for i in didx), cfg
            )
            patches = FLK.lenet_patches(u, cfg)
            pT_flat, inner_losses = fn(
                p_flat, patches, v.reshape(1, cfg.M),
                alpha.reshape(1, 1), ypse, stacks, lr, seed,
            )
            layerT = FLK.unpack_params(pT_flat, cfg)
            params = list(state.params)
            for j, i in enumerate(didx):
                params[i] = layerT[j]
            paramsT = tuple(params)
            eps = self._sample_eps(k_outer, self.mc_samples)
            loss = self._outer_loss(
                paramsT, eps, u, state.z, v, alpha, xb, yb
            )
            return loss, (paramsT, inner_losses.reshape(-1))

        if hyper:
            (loss, (paramsT, inner_losses)), grads = jax.value_and_grad(
                outer, has_aux=True
            )(hyper)
            state = self._apply_hyper_updates(state, grads)
        else:
            loss, (paramsT, inner_losses) = outer(hyper)

        state = state._replace(
            params=paramsT, net_step=state.net_step + 1
        )
        return state, {"outer_loss": loss, "inner_losses": inner_losses}

    def _joint_step(self, state: PSVIState, key, batch=None):
        """Single-level step on (net params, u[, v]) (ref ``joint_step``
        :517-525; optimizer built at :876-882 — z and alpha excluded)."""
        k_batch, k_eps = jax.random.split(key)
        xb, yb = self._get_batch(k_batch, batch)
        eps = self._sample_eps(k_eps, self.mc_samples)

        leaves = {"params": state.params, "u": state.u}
        if self.spec.learn_v:
            leaves["v"] = state.v

        def loss_fn(lv):
            return self._outer_loss(
                lv["params"], eps, lv["u"], state.z, lv.get("v", state.v),
                state.alpha, xb, yb,
            )

        loss, grads = jax.value_and_grad(loss_fn)(leaves)
        leaves, opt_joint = self.opt_joint.step(leaves, grads, state.opt_joint)
        state = state._replace(
            params=leaves["params"], u=leaves["u"],
            v=leaves.get("v", state.v), opt_joint=opt_joint,
        )
        return state, {"outer_loss": loss, "inner_losses": jnp.zeros((1,))}

    def _alternating_step(self, state: PSVIState, key, batch=None):
        """Alternate a net step and a u step on the outer objective
        (ref ``alternating_step`` :527-539)."""
        k_batch, k1, k2 = jax.random.split(key, 3)
        xb, yb = self._get_batch(k_batch, batch)

        eps = self._sample_eps(k1, self.mc_samples)
        loss0, gp = jax.value_and_grad(
            lambda p: self._outer_loss(p, eps, state.u, state.z, state.v,
                                       state.alpha, xb, yb)
        )(state.params)
        params, opt_net = self.opt_net.step(state.params, gp, state.opt_net)

        eps2 = self._sample_eps(k2, self.mc_samples)
        loss1, gu = jax.value_and_grad(
            lambda u: self._outer_loss(params, eps2, u, state.z, state.v,
                                       state.alpha, xb, yb)
        )(state.u)
        u, opt_u = self.opt_u.step(state.u, gu, state.opt_u)
        state = state._replace(params=params, u=u, opt_net=opt_net, opt_u=opt_u)
        # ELBO stream tags (ref :533-537): the i=0 NET step is tagged 0
        # (→ outer_loss slot) and the i=1 U step tagged 1 (→ inner slot)
        return state, {"outer_loss": loss0, "inner_losses": loss1[None]}

    def _hyper_step(self, state: PSVIState, key, batch=None):
        """AID/IFT step: plain inner solve then CG-normal-equations
        hypergradient (ref ``hyper_step`` :602-687)."""
        k_batch, k_inner, k_ift, k_outer = jax.random.split(key, 4)
        xb, yb = self._get_batch(k_batch, batch)
        # the reference's hyper_step never steps scheduler_optim_net
        # (:602-687; scheduler.step only in nested_step :592-593), so the
        # inner solve runs at constant lr0net
        lr_now = jnp.float32(self.lrs["net"])
        hyper = self._hyper_tree(state)

        # inner solve, not differentiated (ref inner_loop :622-654);
        # prep_input hoists the first-layer patch extraction of the
        # loop-invariant u out of the T iterations (as the nested path)
        paramsT, _, inner_losses = self._run_inner(
            state.params, self.net.prep_input(state.u), state.z, state.v,
            state.alpha, k_inner, lr_now,
        )

        def unpack(h):
            return (
                h.get("u", state.u), h.get("z", state.z),
                h.get("v", state.v), h.get("alpha", state.alpha),
            )

        def fp_map(p, h, k):
            # one GD step on the inner loss (ref GradientDescent fp_map)
            u, z, v, alpha = unpack(h)
            eps = self._sample_eps(k, self.mc_samples)
            g = jax.grad(self._inner_loss)(p, eps, u, z, v, alpha)
            return jax.tree_util.tree_map(
                lambda w, gw: w - self.linsys_lr * gw, p, g
            )

        eps_outer = self._sample_eps(k_outer, self.mc_samples)

        def outer_loss_fn(p, h):
            u, z, v, alpha = unpack(h)
            return self._outer_loss(p, eps_outer, u, z, v, alpha, xb, yb)

        if hyper:
            solver = {
                "cg_normaleq": H.cg_normaleq,
                "fixed_point": H.fixed_point,
                "neumann": H.neumann,
            }[self.hypergrad_approx]
            hg = solver(
                fp_map, outer_loss_fn, paramsT, hyper, self.hyper_K, k_ift
            )
            state = self._apply_hyper_updates(state, hg.hyper_grads)
            loss = hg.outer_loss
        else:
            loss = outer_loss_fn(paramsT, {})

        state = state._replace(params=paramsT)
        return state, {"outer_loss": loss, "inner_losses": inner_losses}

    def _retrain_step(self, state: PSVIState, key):
        """Net-only step on the inner ELBO with the lr0joint retrain Adam
        (ref retrain loop :996-1003; fresh optimizer at lr0joint :971 —
        weight_reset before the loop re-initializes the moments)."""
        def loss_fn(p):
            eps = self._sample_eps(key, self.mc_samples)
            return self._inner_loss(p, eps, state.u, state.z, state.v, state.alpha)

        loss, g = jax.value_and_grad(loss_fn)(state.params)
        params, opt_net = self.opt_retrain.step(state.params, g, state.opt_net)
        return state._replace(params=params, opt_net=opt_net), loss

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def _evaluate_fn(self, state: PSVIState, key, correction: bool):
        """Jitted scan over padded test batches (ref ``evaluate``
        :1031-1108)."""
        S = self.mc_samples_eval
        B = min(self.data_minibatch, int(self.x_test.shape[0]))
        n_test = int(self.x_test.shape[0])
        pad = _count_pad(n_test, B)
        xt = jnp.concatenate([self.x_test, self.x_test[:pad]], axis=0) if pad else self.x_test
        yt = jnp.concatenate([self.y_test, self.y_test[:pad]], axis=0) if pad else self.y_test
        mask_full = jnp.concatenate(
            [jnp.ones((n_test,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        n_batches = (n_test + pad) // B
        xbs = xt.reshape((n_batches, B) + xt.shape[1:])
        ybs = yt.reshape(n_batches, B)
        masks = mask_full.reshape(n_batches, B)
        cw, fv = self._core_weights(state.v, state.alpha)

        def body(carry, inp):
            xb, yb, m, k = inp
            corrects, nll_sum, total = carry
            eps = self._sample_eps(k, S)
            all_x = jnp.concatenate([state.u, xb], axis=0)
            all_logits = self.net.apply(state.params, eps, all_x)
            M = state.u.shape[0]
            lw = E.importance_log_weights(
                self.net, state.params, eps, state.u, state.z, cw,
                likelihood=self.likelihood, learn_z=self._learn_z_kldiv,
                nc=self.nc, tau=self.tau, pseudo_out=all_logits[:, :M],
            )
            probs, weights = E.predictive_mixture(
                all_logits[:, M:], lw, correction=correction
            )
            pred = jnp.argmax(probs, axis=-1).astype(jnp.float32)
            corrects += jnp.sum((pred == yb) * m)
            p_true = jnp.take_along_axis(
                probs, yb.astype(jnp.int32)[:, None], axis=-1
            )[:, 0]
            nll_sum += -jnp.sum(jnp.log(jnp.clip(p_true, 1e-38)) * m)
            total += jnp.sum(m)
            return (corrects, nll_sum, total), weights

        keys = jax.random.split(key, n_batches)
        (corrects, nll_sum, total), weights_all = jax.lax.scan(
            body, (0.0, 0.0, 0.0), (xbs, ybs, masks, keys)
        )
        weights = weights_all[-1]  # diagnostics from last batch (ref :1085)
        iw_ent, ness, vent = E.iw_diagnostics(weights, fv, self.num_pseudo)
        return corrects / total, nll_sum / total, iw_ent, ness, vent

    # ------------------------------------------------------------------
    # compiled entry points
    # ------------------------------------------------------------------

    def _trainer_fn(self):
        """The un-jitted pure step for this trainer — reused by the
        trial-parallel runner (``parallel/trials.py``)."""
        steps = {
            "nested": self._nested_step,
            "joint": self._joint_step,
            "alternating": self._alternating_step,
            "hyper": self._hyper_step,
        }
        # Evaluate _use_fused_inner() unconditionally so fused_inner=True
        # ("require") raises for ANY unsupported config — supports()
        # already checks trainer=='nested'/evaluate_only, so a non-nested
        # trainer must not short-circuit past the force check (ADVICE r03).
        use_fused = self._use_fused_inner()
        if self.spec.evaluate_only:
            return self._nested_step  # PSVIEvaluate: net-only nested (:1909-1934)
        if self.trainer == "nested" and use_fused == "dense":
            return self._nested_step_fused
        if self.trainer == "nested" and use_fused == "lenet":
            return self._nested_step_fused_lenet
        return steps[self.trainer]

    def _compile(self):
        step = self._trainer_fn()
        self._step = jax.jit(step, donate_argnums=(0,))

        def multi_step(state, key, n_steps: int):
            """Chain n outer steps in ONE dispatch (lax.scan) — amortizes
            the per-dispatch latency that dominates small models."""
            keys = jax.random.split(key, n_steps)

            def body(s, k):
                s, aux = step(s, k)
                return s, aux["outer_loss"]

            state, losses = jax.lax.scan(body, state, keys)
            return state, losses

        self._multi_step = jax.jit(
            multi_step, static_argnums=(2,), donate_argnums=(0,)
        )

        def multi_step_dyn(state, key, n_active, n_slots: int):
            """Chain up to ``n_slots`` steps, executing only the first
            ``n_active`` (dynamic). A single compilation covers every
            chain length the run loop needs — the final partial chunk of
            a run no longer triggers a second ~40 s XLA compile."""
            keys = jax.random.split(key, n_slots)
            idx = jnp.arange(n_slots)

            def body(s, kin):
                k, i = kin

                def do(s):
                    s2, aux = step(s, k)
                    return s2, aux["outer_loss"]

                def skip(s):
                    return s, jnp.float32(jnp.nan)

                return jax.lax.cond(i < n_active, do, skip, s)

            state, losses = jax.lax.scan(body, state, (keys, idx))
            return state, losses

        self._multi_step_dyn = jax.jit(
            multi_step_dyn, static_argnums=(3,), donate_argnums=(0,)
        )

        if self.stream_data:
            # host-streamed variants: the batch stack arrives as an argument
            # instead of being gathered from device-resident arrays. The
            # batch PRNG keys are replicated host-side in _stream_batches so
            # batch selection is bit-identical to the resident path.
            self._step_stream = jax.jit(
                lambda state, key, xb, yb: step(state, key, (xb, yb)),
                donate_argnums=(0,),
            )

            def multi_step_dyn_stream(state, key, xbs, ybs, n_active,
                                      n_slots: int):
                keys = jax.random.split(key, n_slots)
                idx = jnp.arange(n_slots)

                def body(s, kin):
                    k, i, xb, yb = kin

                    def do(s):
                        s2, aux = step(s, k, (xb, yb))
                        return s2, aux["outer_loss"]

                    def skip(s):
                        return s, jnp.float32(jnp.nan)

                    return jax.lax.cond(i < n_active, do, skip, s)

                state, losses = jax.lax.scan(
                    body, state, (keys, idx, xbs, ybs)
                )
                return state, losses

            self._multi_step_dyn_stream = jax.jit(
                multi_step_dyn_stream, static_argnums=(5,),
                donate_argnums=(0,),
            )

            # each trainer splits its step key differently; k_batch is
            # always the FIRST key of that split (steps at _nested_step /
            # _joint_step / _alternating_step / _hyper_step)
            nsplit = {"nested": 3, "joint": 2, "alternating": 3,
                      "hyper": 4}[
                "nested" if self.spec.evaluate_only else self.trainer
            ]
            n_now, B = self.n_train_now, self.data_minibatch

            def one_idx(k):
                kb = jax.random.split(k, nsplit)[0]
                return jax.random.choice(kb, n_now, (B,), replace=False)

            self._batch_index1 = jax.jit(one_idx)
            self._batch_indices = jax.jit(
                lambda key, n_slots: jax.vmap(one_idx)(
                    jax.random.split(key, n_slots)
                ),
                static_argnums=(1,),
            )

        self._eval = jax.jit(partial(self._evaluate_fn, correction=True))
        self._eval_nocorr = jax.jit(partial(self._evaluate_fn, correction=False))
        self._retrain = jax.jit(self._retrain_step, donate_argnums=(0,))

    def save_checkpoint(self, path: str):
        """Checkpoint the full engine state (params, pseudodata, optimizer
        moments, scheduler counter, PRNG key) for bit-exact resume — a
        capability the reference lacks (SURVEY.md §5: no mid-training
        resume)."""
        from psvi_tpu.utils.checkpoint import save_state

        save_state(path, self.state, extra={"key": np.asarray(self.key)})

    def load_checkpoint(self, path: str):
        from psvi_tpu.utils.checkpoint import load_state

        self.state, extra = load_state(path, self.state)
        if "key" in extra:
            self.key = jnp.asarray(extra["key"])

    def load_saved_coreset(
        self,
        subfolder_name: str,
        dataset: str,
        method: str,
        coreset_size: int,
        trial: int = 0,
        ablated_weights: bool = True,
        ablated_alpha: bool = True,
        ablated_labels: bool = True,
        fnm: str = "results",
    ):
        """Warm-start the coreset from a previously saved run
        (ref ``custom_init_evaluate`` :377-442 + ``retrieve_results``,
        ``inference/utils.py:1800-1823``). Ablation flags replace the stored
        weights / alpha / labels with fresh ones, as the PSVIEvaluate class
        does (:403-442)."""
        from psvi_tpu.utils.results import retrieve_results

        d = retrieve_results(
            self.results_folder or "results", subfolder_name, dataset,
            method, coreset_size, trial, fnm=fnm,
        )
        rng = np.random.default_rng(self.seed)
        self.chosen_indices = [int(i) for i in d["chosen_indices"]]
        x_np = np.asarray(self.x_train)
        y_np = np.asarray(self.y_train)
        u = jnp.asarray(x_np[self.chosen_indices])
        if ablated_labels or d["labels"] is None:
            z = jnp.asarray(y_np[self.chosen_indices])
        else:
            z = jnp.asarray(d["labels"])
        if self.spec.learn_z and self.likelihood == "categorical" and z.ndim == 1:
            z = jax.nn.one_hot(z.astype(jnp.int32), self.nc, dtype=jnp.float32)
        if ablated_weights or d["weights"] is None:
            v = jnp.asarray(rng.standard_normal(self.num_pseudo).astype(np.float32))
        else:
            v = jnp.asarray(d["weights"], jnp.float32)
        alpha = (
            jnp.zeros((1,), jnp.float32)
            if ablated_alpha
            else jnp.asarray(np.atleast_1d(d["alpha"]), jnp.float32)
        )
        self.state = self.state._replace(
            u=u, z=z, v=v, alpha=alpha,
            opt_u=self.opt_u.init(u), opt_v=self.opt_v.init(v),
            opt_z=self.opt_z.init(z), opt_alpha=self.opt_alpha.init(alpha),
        )

    def weight_reset(self):
        """Reinitialize variational network parameters (ref :1110-1128)."""
        self.key, k = jax.random.split(self.key)
        params = self.net.init(k)
        self.state = self.state._replace(
            params=params,
            opt_net=self.opt_net.init(params),
        )

    # ------------------------------------------------------------------
    # lifecycle: prune / increment
    # ------------------------------------------------------------------

    def prune_coreset(self, to_size: int):
        """Multinomial down-sampling of the coreset by f(v) (ref :1177-1192).
        Shapes change → jitted fns rebuilt."""
        self.key, k = jax.random.split(self.key)
        _, fv = self._core_weights(self.state.v, self.state.alpha)
        keep = jax.random.choice(
            k, self.num_pseudo, (to_size,), replace=False, p=fv / jnp.sum(fv)
        )
        self.num_pseudo = to_size
        v = jnp.zeros((to_size,), jnp.float32)
        u = self.state.u[keep]
        z = self.state.z[keep]
        joint_leaves = {"params": self.state.params, "u": u}
        if self.spec.learn_v:
            joint_leaves["v"] = v
        self.state = self.state._replace(
            u=u, z=z, v=v,
            opt_u=self.opt_u.init(u), opt_v=self.opt_v.init(v),
            opt_z=self.opt_z.init(z),
            opt_joint=self.opt_joint.init(joint_leaves),
            opt_net=self.opt_net.init(self.state.params),
        )
        self._compile()

    def increment_coreset(self, to_size: int, new_class: int, increment_idx: int):
        """Grow the coreset for a new class (ref :1194-1217)."""
        self.key, k1 = jax.random.split(self.key)
        M_old = int(self.state.v.shape[0])
        n_extra = to_size - M_old
        v = jnp.concatenate(
            [self.state.v,
             (jnp.sum(self.state.v) / to_size) * jnp.ones((n_extra,))]
        )
        # sample new-class points from the incoming task's data
        # (ref :1211-1215: incremental_train_datasets[increment_idx])
        if self.increment and hasattr(self, "_full_xy"):
            x_np, y_np = self._full_xy
        else:
            x_np, y_np = np.asarray(self.x_train), np.asarray(self.y_train)
        rng = np.random.default_rng(self.seed + increment_idx)
        if self.init_args == "random":
            mean = x_np.mean(axis=0, keepdims=True)
            new_u = jnp.asarray(
                mean + rng.standard_normal((n_extra,) + x_np.shape[1:]).astype(np.float32)
            )
            new_z = jnp.full((n_extra,), float(new_class))
        else:
            cls_idx = np.where(y_np == new_class)[0]
            take = rng.choice(cls_idx, size=n_extra, replace=len(cls_idx) < n_extra)
            new_u = jnp.asarray(x_np[take])
            new_z = jnp.asarray(y_np[take])
        u = jnp.concatenate([self.state.u, new_u], axis=0)
        z = jnp.concatenate([self.state.z, new_z], axis=0)
        self.num_pseudo = to_size
        joint_leaves = {"params": self.state.params, "u": u}
        if self.spec.learn_v:
            joint_leaves["v"] = v
        self.state = self.state._replace(
            u=u, z=z, v=v,
            opt_u=self.opt_u.init(u), opt_v=self.opt_v.init(v),
            opt_z=self.opt_z.init(z),
            opt_alpha=self.opt_alpha.init(self.state.alpha),
            opt_joint=self.opt_joint.init(joint_leaves),
            opt_net=self.opt_net.init(self.state.params),
        )
        self._compile()

    def sample_replay_indices(self, key):
        """Replay indices drawn from the CURRENT coreset's f(v) — must be
        called BEFORE increment_coreset: the reference samples the
        multinomial over the pre-increment weights (ref :952) and only then
        grows the coreset, so the replay summarizes previous tasks without
        the untrained new-class points."""
        _, fv = self._core_weights(self.state.v, self.state.alpha)
        return jax.random.choice(
            key, self.state.u.shape[0], (self.train_data_so_far,),
            replace=True, p=fv / jnp.sum(fv),
        )

    def _advance_increment_task(self, increment_idx: int, samples):
        """Swap in the grown train/test sets augmented with coreset replay
        samples (ref :946-965). ``samples`` index the pre-increment coreset
        (old points keep their leading positions through the increment, so
        gathering from the enlarged u/z matches the reference :959-961)."""
        rep_u = np.asarray(self.state.u[samples])
        rep_z = np.asarray(self.state.z[samples])
        fx, fy = self._full_xy
        new_cls = increment_idx + 1
        tr_mask = np.asarray(fy) == new_cls
        x_new = np.concatenate([fx[tr_mask], rep_u])
        y_new = np.concatenate([fy[tr_mask], rep_z])
        self.x_train, self.y_train = (
            self._train_asarray(x_new), self._train_asarray(y_new),
        )
        ftx, fty = self._full_xy_test
        te_mask = np.isin(fty, list(range(new_cls + 1)))
        self.x_test, self.y_test = (
            jnp.asarray(ftx[te_mask]), jnp.asarray(fty[te_mask]),
        )
        self.n_train_now = int(self.x_train.shape[0])
        self.train_data_so_far = self.n_train_now
        self.data_minibatch = min(self.data_minibatch, self.n_train_now)
        self._compile()

    # ------------------------------------------------------------------
    # run loop
    # ------------------------------------------------------------------

    def run_psvi(self, **kwargs) -> dict:
        if self.profile_dir:
            # XLA trace of the whole run — the TPU-native upgrade of the
            # reference's LogResource wall-time/CUDA-memory logging
            # (SURVEY.md §5 tracing/profiling): open in tensorboard or
            # parse the .trace.json.gz directly.
            with jax.profiler.trace(self.profile_dir):
                return self._run_psvi_impl(**kwargs)
        return self._run_psvi_impl(**kwargs)

    def _run_psvi_impl(self, **kwargs) -> dict:
        (nlls, accs, csizes, iws_ent, nesses, vs_ent, us, zs, vs, grid_preds,
         times) = ([], [], [], [], [], [], [], [], [], [], [0.0])
        if self.spec.learn_alpha:
            self.results.setdefault("alpha", [])

        log_resource = LogResource()
        t_start = time.time()
        prune_idx, increment_idx = 0, 0

        # chain outer steps between logging boundaries into one dispatch
        # when no per-step host-side work is required
        can_chain = not (
            self.scoring_run or self.reset or self.prune or self.increment
            or self.register_elbos  # per-step inner/outer ELBO streams
        )

        it = 0
        while it < self.num_epochs:
            self.key, k_step, k_eval = jax.random.split(self.key, 3)
            self._forgetting_calculator(jax.random.fold_in(k_eval, 0xF0))

            if it % self.log_every == 0:
                acc, nll, iw_ent, ness, vent = self._eval(self.state, k_eval)
                acc = float(acc)
                nlls.append(float(nll))
                accs.append(acc)
                csizes.append(self.num_pseudo)
                times.append(times[-1] + time.time() - t_start)
                # raw v logged during training (ref :917); f(v) in retrain (:989)
                vs.append(np.asarray(self.state.v))
                if self.compute_weights_entropy:
                    iws_ent.append(float(iw_ent))
                    vs_ent.append(float(vent))
                nesses.append(float(ness))
                if self.spec.learn_alpha:
                    self.results["alpha"].append(np.asarray(self.state.alpha))
                if self.log_pseudodata:
                    us.append(np.asarray(self.state.u))
                    zs.append(np.asarray(self.state.z))
                    if self.D == 2:
                        grid_preds.append(self.pred_on_grid())

            if self.reset and it % self.reset_interval == 0:
                self.weight_reset()

            if can_chain:
                n = min(
                    self.log_every - (it % self.log_every) or self.log_every,
                    self.num_epochs - it,
                )
                n_slots = min(self.log_every, self.num_epochs)
                if self.stream_data:
                    # gather the whole chunk's batches from host RAM and
                    # ship one (n_slots, B, ...) stack per dispatch
                    idxs = np.asarray(self._batch_indices(k_step, n_slots))
                    self.state, losses = self._multi_step_dyn_stream(
                        self.state, k_step,
                        jnp.asarray(self.x_train[idxs]),
                        jnp.asarray(self.y_train[idxs]),
                        jnp.int32(n), n_slots,
                    )
                else:
                    self.state, losses = self._multi_step_dyn(
                        self.state, k_step, jnp.int32(n), n_slots
                    )
                for _ in range(n):
                    log_resource.update()
                it += n
                continue

            if self.stream_data:
                idx1 = np.asarray(self._batch_index1(k_step))
                self.state, aux = self._step_stream(
                    self.state, k_step,
                    jnp.asarray(self.x_train[idx1]),
                    jnp.asarray(self.y_train[idx1]),
                )
            else:
                self.state, aux = self._step(self.state, k_step)
            if self.register_elbos:
                # stream tags (ref :521-559): 0=outer, 1=inner, 2=joint
                tag = 2 if self.trainer == "joint" else 0
                inner = np.asarray(aux["inner_losses"])
                for j in range(0, inner.shape[0], max(self.log_every, 1)):
                    self.elbos.append((1, -float(inner[j])))
                self.elbos.append((tag, -float(aux["outer_loss"])))
            log_resource.update()

            if (
                self.prune and it > 0 and self.prune_interval
                and it % self.prune_interval == 0
                and prune_idx < len(self.prune_sizes)
            ):
                self.prune_coreset(self.prune_sizes[prune_idx])
                prune_idx += 1
                self.weight_reset()

            if (
                self.increment and it > 0 and self.increment_interval
                and it % self.increment_interval == 0
                and increment_idx < len(self.increment_sizes) - 1
            ):
                increment_idx += 1
                self.nc += 1
                self._build_model()
                self.weight_reset()
                self.key, k_rep = jax.random.split(self.key)
                replay = self.sample_replay_indices(k_rep)
                self.increment_coreset(
                    self.increment_sizes[increment_idx],
                    new_class=increment_idx + 1, increment_idx=increment_idx,
                )
                self._advance_increment_task(increment_idx, replay)

            it += 1

        if self.retrain_on_coreset:
            # re-fit variational params on the extracted coreset (:967-1003)
            self.weight_reset()
            for it in range(self.num_epochs):
                self.key, k_step, k_eval = jax.random.split(self.key, 3)
                if it % self.log_every == 0:
                    acc, nll, iw_ent, ness, vent = self._eval_nocorr(
                        self.state, k_eval
                    )
                    nlls.append(float(nll))
                    accs.append(float(acc))
                    csizes.append(self.num_pseudo)
                    times.append(times[-1] + time.time() - t_start)
                    _, fv = self._core_weights(self.state.v, self.state.alpha)
                    vs.append(np.asarray(fv))
                self.state, loss = self._retrain(self.state, k_step)

        resources = log_resource.get_resources()
        self.key, k_score = jax.random.split(self.key)
        self._do_scoring(k_score)
        self.results.update(
            accs=accs, nlls=nlls, csizes=csizes, times=times[1:],
            elbos=self.elbos, went=iws_ent, ness=nesses, vent=vs_ent, vs=vs,
            avg_epoch_time=resources["time"], gpu_memory=resources["memory"],
            chosen_indices=self.chosen_indices,
        )
        if self.log_pseudodata:
            self.results.update(us=us, zs=zs, grid_preds=grid_preds)
        return self.results

    # ------------------------------------------------------------------
    # data-difficulty scoring subsystem (ref :1219-1339)
    # ------------------------------------------------------------------

    def _train_set_mean_probs(self, key, batch=1024):
        """MC-mean softmax probabilities over the (ordered) train set."""
        S = self.mc_samples_eval
        x = self.x_train
        n = int(x.shape[0])
        out = []
        for i in range(0, n, batch):
            eps = self.net.sample_eps(jax.random.fold_in(key, i), S)
            logits = self.net.apply(self.state.params, eps, x[i:i + batch])
            out.append(np.asarray(jax.nn.softmax(logits.mean(axis=0), axis=-1)))
        return np.concatenate(out, axis=0)

    def _forgetting_calculator(self, key):
        """Per-iteration forgetting-event tracking over the train set
        (ref ``_forgetting_calculator`` :1277-1306). Only active for
        scoring runs."""
        if not self.scoring_run:
            return
        if not hasattr(self, "forgetting_events"):
            n = self.n_train_now
            self.forgetting_events = np.zeros(n, np.float32)
            self.last_acc = np.zeros(n, np.float32)
            self.never_learnt = np.ones(n, np.float32)
        probs = self._train_set_mean_probs(key)
        curr_acc = (
            probs.argmax(-1) == np.asarray(self.y_train).astype(int)
        ).astype(np.float32)
        self.forgetting_events[self.last_acc > curr_acc] += 1
        self.last_acc = curr_acc
        self.never_learnt = np.minimum(self.never_learnt, 1.0 - curr_acc)

    def _do_scoring(self, key):
        """Final EL2N/entropy/least-confidence/forgetting scores → CSV
        (ref ``_do_scoring`` :1219-1274)."""
        if not self.scoring_run:
            return
        import pandas as pd

        probs = self._train_set_mean_probs(key)
        y = np.asarray(self.y_train).astype(int)
        onehot = np.eye(self.nc, dtype=np.float32)[y]
        p_eps = probs + 1e-20
        entropy = -(probs * np.log(p_eps)).sum(1)
        least_conf = 1.0 - probs.max(1)
        el2n = np.linalg.norm(probs - onehot, axis=1)
        self.forgetting_events = np.maximum(
            self.num_epochs * self.never_learnt, self.forgetting_events
        )
        df = pd.DataFrame({
            "el2n": el2n,
            "forgetting": self.forgetting_events,
            "entropy": entropy,
            "least_confidence": least_conf,
        })
        os.makedirs(self.data_folder or ".", exist_ok=True)
        df.to_csv(
            os.path.join(self.data_folder or ".",
                         f"score_psvi_{self.dnm}_{self.seed}.csv"),
            index=False, header=True,
        )
        self._save_embeddings()

    def _save_embeddings(self, batch=1024):
        """Penultimate-layer embeddings summed over the S axis → CSV
        (ref ``_get_embeddings`` :1308-1339)."""
        S = self.mc_samples_eval
        x = self.x_train
        n = int(x.shape[0])
        rows = []
        for i in range(0, n, batch):
            eps = self.net.sample_eps(
                jax.random.fold_in(self.key, 0xE2B + i), S
            )
            xb = x[i:i + batch]
            h = jnp.broadcast_to(xb[None], (S,) + xb.shape)
            if hasattr(self.net, "unpack"):  # packed flat representation
                per_params = self.net.unpack(self.state.params)
                per_eps = self.net.unpack_eps(eps)
            else:
                per_params, per_eps = self.state.params, eps
            for layer, p, e in zip(
                self.net.layers[:-1], per_params[:-1], per_eps[:-1]
            ):
                h = layer.apply(p, e, h)
            rows.append(np.asarray(h.sum(axis=0)))
        emb = np.concatenate(rows, axis=0)
        np.savetxt(
            os.path.join(self.data_folder or ".",
                         f"embedding_{self.dnm}_{self.seed}.csv"),
            emb, delimiter=",",
        )

    def pred_on_grid(self, n_test_per_dim: int = 250, correction: bool = True):
        """Predictive probabilities over a 2-D grid (ref :1130-1175)."""
        x0 = jnp.linspace(-3, 4, n_test_per_dim)
        x1 = jnp.linspace(-2, 3, n_test_per_dim)
        g0, g1 = jnp.meshgrid(x0, x1, indexing="ij")
        grid = jnp.stack([g0.reshape(-1), g1.reshape(-1)], axis=-1)
        self.key, k = jax.random.split(self.key)
        eps = self.net.sample_eps(k, self.mc_samples_eval)
        state = self.state
        cw, _ = self._core_weights(state.v, state.alpha)
        all_x = jnp.concatenate([state.u, grid], axis=0)
        logits = self.net.apply(state.params, eps, all_x)
        M = state.u.shape[0]
        lw = E.importance_log_weights(
            self.net, state.params, eps, state.u, state.z, cw,
            likelihood=self.likelihood, learn_z=self._learn_z_kldiv,
            nc=self.nc, tau=self.tau, pseudo_out=logits[:, :M],
        )
        probs, _ = E.predictive_mixture(logits[:, M:], lw, correction=correction)
        return np.asarray(probs).T


class PSVIRegressor(PSVI):
    """Regression PSVI (ref ``PSVI_regressor`` and subclasses,
    ``psvi_classes.py:1940-2335``): Gaussian likelihood with precision tau,
    subsample init from (x, y) pairs, RMSE / predictive-LL evaluation with
    target de-normalization."""

    likelihood = "gaussian"

    def _init_pseudodata(self, key):
        # random subsample of (x, y) pairs (ref :2019-2031), optionally
        # from an alternate init pool (ref :115,234 — the init_dataset
        # kwarg lives on the regressor family too)
        rng = np.random.default_rng(self.seed)
        if self.init_dataset is not None:
            x_pool = jnp.asarray(np.asarray(self.init_dataset[0]))
            y_pool = jnp.asarray(np.asarray(self.init_dataset[1]))
        else:
            x_pool, y_pool = self.x_train, self.y_train
        idx = rng.choice(
            x_pool.shape[0], size=self.num_pseudo, replace=False
        )
        u = x_pool[jnp.asarray(idx)]
        z = y_pool[jnp.asarray(idx)].reshape(-1)
        return u, z

    def _evaluate_fn(self, state: PSVIState, key, correction: bool = True):
        """RMSE + predictive LL with de-normalized targets (ref :2221-2264)."""
        S = self.mc_samples_eval
        y_mean, y_std = self.data.y_mean, self.data.y_std
        cw, fv = self._core_weights(state.v, state.alpha)
        eps = self.net.sample_eps(key, S)
        all_x = jnp.concatenate([state.u, self.x_test], axis=0)
        out = self.net.apply(state.params, eps, all_x).squeeze(-1)
        M = state.u.shape[0]
        lw = E.importance_log_weights(
            self.net, state.params, eps, state.u, state.z, cw,
            likelihood="gaussian", nc=self.nc, tau=self.tau,
            pseudo_out=out[:, :M],
        )
        weights = jax.nn.softmax(lw, axis=0)
        test_out = out[:, M:] * y_std + y_mean  # revert_norm (ref :2226-2227)
        y_pred = jnp.einsum("sn,s->n", test_out, weights)
        yt = self.y_test.reshape(-1)
        rmse = jnp.sqrt(jnp.mean(jnp.square(y_pred - yt)))
        scale = 1.0 / jnp.sqrt(jnp.float32(self.tau))
        ll = jnp.mean(
            -0.5 * jnp.square((yt - y_pred) / scale)
            - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
        )
        iw_ent, ness, vent = E.iw_diagnostics(weights, fv, self.num_pseudo)
        return rmse, ll, iw_ent, ness, vent

    # run_psvi is inherited: the base profile_dir wrapper dispatches to this
    # override dynamically.
    def _run_psvi_impl(self, **kwargs) -> dict:
        (lls, rmses, csizes, vs, times) = ([], [], [], [], [0.0])
        if self.spec.learn_alpha:
            # per-eval alpha trajectory (ref PSVIAV_regressor evaluate
            # :2297-2304 appends self.alpha to results['alpha'])
            self.results.setdefault("alpha", [])
        t_start = time.time()
        for it in range(self.num_epochs):
            self.key, k_step, k_eval = jax.random.split(self.key, 3)
            if it % self.log_every == 0:
                rmse, ll, *_ = self._eval(self.state, k_eval)
                rmses.append(float(rmse))
                lls.append(float(ll))
                csizes.append(self.num_pseudo)
                times.append(times[-1] + time.time() - t_start)
                _, fv = self._core_weights(self.state.v, self.state.alpha)
                vs.append(np.asarray(fv))
                if self.spec.learn_alpha:
                    self.results["alpha"].append(np.asarray(self.state.alpha))
            self.state, aux = self._step(self.state, k_step)
        self.results.update(
            rmses=rmses, lls=lls, csizes=csizes, times=times[1:], vs=vs,
            went=[], ness=[], vent=[],
        )
        return self.results


def make_psvi_engine(data: DataBundle, method: str = "psvi_learn_v", **kwargs):
    """Build the right engine class for `method` (PSVI or PSVIRegressor)."""
    spec = METHOD_SPECS[method]
    cls = PSVIRegressor if spec.regressor else PSVI
    return cls(data, method=method, **kwargs)


def run_psvi(data: DataBundle, method: str = "psvi_learn_v", **kwargs) -> dict:
    """Functional entry: build the right engine for `method` and run it
    (the analog of ``inf_dict`` dispatch, ref psvi_experiments.py:402-458)."""
    return make_psvi_engine(data, method=method, **kwargs).run_psvi()

"""Fused bilevel inner unroll for the LeNet (conv) family — Pallas.

The flagship nested step (LeNet, M=100, S=10, inner_it=20 — the
reference's production MNIST config, ``second_vi_run.ipynb`` cells 4-16;
``psvi/inference/psvi_classes.py:541-600``) is per-op-latency bound
under XLA: ~60 small HLO ops per inner iteration (tiny convs, pool
chains, per-tensor Adam updates) run at <5% MXU duty, and three rounds
of XLA-level reformulation moved the 29 ms step by single-digit
percents (BENCHMARKS.md "step anatomy", round-4 profile).

This module runs the ENTIRE T-iteration differentiable inner loop as
Pallas kernels, with the outer IW-ELBO left to XLA:

- ``kernel A`` (forward): ``T`` × [sample θ → conv1+pool1 → conv2+pool2
  → fc stack → inner ELBO → grad → torch-exact Adam update], entirely
  in VMEM, emitting only ``paramsT`` and the loss trajectory.
- ``kernel B`` (backward): re-runs the unroll storing the tiny per-
  iteration ``(params, m, n)`` state in VMEM scratch, then sweeps
  REVERSE, replaying ``jax.vjp`` of each iteration — the second-order
  terms (gradients THROUGH the inner gradients) are traced
  automatically from the same pure body, never hand-derived.
- the two are glued with ONE ``jax.custom_vjp``: the engine's outer
  ``jax.grad`` w.r.t. (u, v, alpha) crosses the kernel boundary through
  kernel B. No higher-order AD ever touches a ``pallas_call`` — the
  whole unroll, including its second-order interior, is encapsulated.

Mosaic-driven layout (rank-2 everywhere, as ``ops/fused_nested.py``):

- activations are rows=channels×samples, lanes=(image, position):
  pooled1 is ``(S·K1, M·P1²)`` with lane ``m·P1² + r·P1 + c``;
- conv1 consumes PRE-EXTRACTED pool-parity patch stacks of u
  (4 × ``(k², M·P1²)``, built by :func:`lenet_patches` in XLA, once per
  outer step — u is loop-invariant, so the in-kernel cotangent is one
  accumulation and the col2im transpose runs once, outside);
- conv2 is 25 shifted block-diagonal matmuls: the lane layout preserves
  within-image spacing, so every conv offset is a LANE ROLL
  (``pltpu.roll``; valid output lanes never wrap across images);
- pool2 is a roll-max; the 5×5→fc1 flatten is FUSED into fc1 as 25
  (selection-matmul → block-diag matmul) contributions, with the fc1
  weight lanes permuted position-major so each contribution slices a
  contiguous lane block;
- the inner reparameterization noise is drawn IN-KERNEL (Box-Muller on
  ``pltpu.prng_random_bits``), reseeded per iteration from
  ``(seed, t)`` so kernels A and B reproduce identical draws — a
  different (iid-identical) stream from the plain path, like the dense
  kernel's ``fused_eps='batched'``; ``eps_mode='input'`` feeds explicit
  noise instead (tests / oracle comparisons).

Reference semantics: inner ELBO ``Σ_s Σ_m N·f(v)_m·NLL + KL`` with KL
over DENSE layers only (the reference's objectives skip conv-layer KL,
``psvi_classes.py:479-483,506-510``); torch-exact bias-corrected Adam
with fresh state per outer step (``robust_higher/optim.py:299-368``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.ops.optim import _sqrt_safe

try:  # pallas is TPU/Mosaic-only; fall back cleanly elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


@dataclasses.dataclass(frozen=True)
class LeNetCfg:
    """Static configuration of the fused conv-family inner unroll."""

    T: int  # inner iterations
    S: int  # MC samples
    M: int  # coreset size
    nc: int  # classes
    N: float  # dataset-size rescaler
    parameterised: bool  # f(v) = softmax(v)
    use_alpha: bool  # f(v) *= exp(alpha)
    prior_sd: float
    K1: int = 6  # conv1 out channels
    K2: int = 16  # conv2 out channels
    k: int = 5  # conv kernel (square)
    H: int = 28  # input spatial (square); conv1 'same'-padded
    fc: Tuple[int, ...] = (400, 120, 84, 10)  # dense widths incl. input
    eps_mode: str = "prng"  # 'prng' (in-kernel) | 'input' (explicit)
    b1: float = 0.9
    b2: float = 0.999
    adam_eps: float = 1e-8
    # Per-matmul-site precision override (see :func:`_site_precision`):
    # None = tuned default {'pseudo','flat_w','fc2','fc3'} exact; 'all' /
    # 'none' / comma-list of sites. Part of the (hashable) config so it
    # participates in the make_fused_unroll cache key — the env override
    # PSVI_TPU_FL_EXACT is read ONCE by :func:`cfg_from_engine`, never at
    # trace time (round-4 advisor finding).
    exact_sites: str = "default"

    @property
    def P1(self):  # post-pool1 spatial
        return self.H // 2

    @property
    def H2(self):  # conv2 output spatial
        return self.P1 - self.k + 1

    @property
    def P2(self):  # post-pool2 spatial
        return self.H2 // 2

    @property
    def lanes(self):  # activation lane count: (image, P1-grid position)
        return self.M * self.P1 * self.P1

    @property
    def q(self):
        return self.k * self.k

    def param_shapes(self):
        """Flat kernel-layout parameter shapes, in kernel order:
        (conv1 w/b, conv2 w/b, fc1 w/b, fc2 w/b, fc3 w/b) × (mu, rho).
        conv2 w lanes are offset-major ``dd·K1 + c``; fc1 w lanes are
        position-major ``p·K2 + k2``."""
        f = self.fc
        shapes = [
            (self.K1, self.q), (self.K1, 1),
            (self.K2, self.q * self.K1), (self.K2, 1),
            (f[1], f[0]), (f[1], 1),
            (f[2], f[1]), (f[2], 1),
            (f[3], f[2]), (f[3], 1),
        ]
        out = []
        for s in shapes:
            out += [s, s]  # mu, rho
        return out


# ---------------------------------------------------------------------
# engine-side input preparation (pure XLA, differentiable)
# ---------------------------------------------------------------------


def lenet_patches(u, cfg: LeNetCfg):
    """Pool-parity patch stacks of the conv1 input.

    u: (M, 1, H, H). Returns 4 arrays ``(k², M·P1²)`` — parity (a, b)
    holds the patches of conv1 output positions (2r+a, 2c+b), laid out
    lane ``m·P1² + r·P1 + c``. Runs in XLA once per outer step; its VJP
    (col2im) therefore also runs once, outside the unrolled loop."""
    k, H, P1 = cfg.k, cfg.H, cfg.P1
    pad = (k - 1) // 2
    M = u.shape[0]
    up = jnp.pad(u[:, 0], ((0, 0), (pad, pad), (pad, pad)))
    out = []
    for a in range(2):
        for b in range(2):
            cols = [
                up[:, a + dy : a + dy + 2 * P1 - 1 : 2,
                   b + dx : b + dx + 2 * P1 - 1 : 2]
                for dy in range(k)
                for dx in range(k)
            ]
            P = jnp.stack(cols, axis=0)  # (q, M, P1, P1)
            out.append(P.reshape(cfg.q, M * P1 * P1))
    return tuple(out)


def pack_params(params_by_layer, cfg: LeNetCfg):
    """Engine layer params → flat kernel-layout tuple (see
    ``LeNetCfg.param_shapes``). ``params_by_layer`` is the 5-tuple of
    layer dicts (conv1, conv2, fc1, fc2, fc3)."""
    c1, c2, f1, f2, f3 = params_by_layer
    K1, K2, k, q = cfg.K1, cfg.K2, cfg.k, cfg.q

    def conv2_lanes(w):  # (K2, K1, k, k) → (K2, q·K1), lane dd·K1+c
        return jnp.transpose(w.reshape(K2, K1, q), (0, 2, 1)).reshape(
            K2, q * K1
        )

    def fc1_lanes(w):  # (h, K2·P2²) ch-major → (h, P2²·K2) pos-major
        h = w.shape[0]
        p2 = cfg.P2 * cfg.P2
        return jnp.transpose(w.reshape(h, K2, p2), (0, 2, 1)).reshape(h, -1)

    out = []
    for mu, rho in ((c1["mu_w"], c1["rho_w"]),):
        out += [mu.reshape(K1, q), rho.reshape(K1, q)]
    out += [c1["mu_b"].reshape(K1, 1), c1["rho_b"].reshape(K1, 1)]
    out += [conv2_lanes(c2["mu_w"]), conv2_lanes(c2["rho_w"]),
            c2["mu_b"].reshape(K2, 1), c2["rho_b"].reshape(K2, 1)]
    out += [fc1_lanes(f1["mu_w"]), fc1_lanes(f1["rho_w"]),
            f1["mu_b"].reshape(-1, 1), f1["rho_b"].reshape(-1, 1)]
    out += [f2["mu_w"], f2["rho_w"],
            f2["mu_b"].reshape(-1, 1), f2["rho_b"].reshape(-1, 1)]
    out += [f3["mu_w"], f3["rho_w"],
            f3["mu_b"].reshape(-1, 1), f3["rho_b"].reshape(-1, 1)]
    return tuple(out)


def unpack_params(flat, cfg: LeNetCfg):
    """Inverse of :func:`pack_params` → 5-tuple of layer dicts."""
    K1, K2, k, q = cfg.K1, cfg.K2, cfg.k, cfg.q

    def conv2_unlanes(w):
        return jnp.transpose(
            w.reshape(K2, q, K1), (0, 2, 1)
        ).reshape(K2, K1, k, k)

    def fc1_unlanes(w):
        h = w.shape[0]
        p2 = cfg.P2 * cfg.P2
        return jnp.transpose(w.reshape(h, p2, K2), (0, 2, 1)).reshape(h, -1)

    c1 = {
        "mu_w": flat[0].reshape(K1, 1, k, k),
        "rho_w": flat[1].reshape(K1, 1, k, k),
        "mu_b": flat[2].reshape(K1),
        "rho_b": flat[3].reshape(K1),
    }
    c2 = {
        "mu_w": conv2_unlanes(flat[4]),
        "rho_w": conv2_unlanes(flat[5]),
        "mu_b": flat[6].reshape(K2),
        "rho_b": flat[7].reshape(K2),
    }
    f1 = {
        "mu_w": fc1_unlanes(flat[8]),
        "rho_w": fc1_unlanes(flat[9]),
        "mu_b": flat[10].reshape(-1),
        "rho_b": flat[11].reshape(-1),
    }
    f2 = {"mu_w": flat[12], "rho_w": flat[13],
          "mu_b": flat[14].reshape(-1), "rho_b": flat[15].reshape(-1)}
    f3 = {"mu_w": flat[16], "rho_w": flat[17],
          "mu_b": flat[18].reshape(-1), "rho_b": flat[19].reshape(-1)}
    return c1, c2, f1, f2, f3


# ---------------------------------------------------------------------
# kernel-internal building blocks (pure jnp; Mosaic- and XLA-lowerable)
# ---------------------------------------------------------------------


_EXACT = jax.lax.Precision.HIGHEST


def _site_precision(site: str, exact_sites: str = "default"):
    """Per-matmul-site precision for the compute dots.

    Mosaic supports only DEFAULT (one bf16 MXU pass) and HIGHEST.
    Structural 0/1 movement is always HIGHEST (see _mask_mm); compute
    sites are tuned here — the bilevel second-order through Adam
    amplifies bf16 rounding of the small-magnitude gradient entries,
    so the sites feeding them run exact. ``exact_sites`` comes from
    ``LeNetCfg.exact_sites`` ('default' / 'all' / 'none' / comma-list
    of exact-token site names) so it is part of the kernel cache key;
    the PSVI_TPU_FL_EXACT env override is resolved once at config
    construction (:func:`cfg_from_engine`), never at trace time."""
    if exact_sites == "default":
        return _EXACT if site in ("pseudo", "flat_w", "fc2", "fc3") else None
    if exact_sites == "all":
        return _EXACT
    if exact_sites == "none":
        return None
    return _EXACT if site in exact_sites.split(",") else None


def _mask_mm(mask_bool, x):
    # structural 0/1 matmul (replication / selection / extraction):
    # exact data movement — HIGHEST precision so values are moved, not
    # rounded to bf16 (the default single-pass MXU precision). These are
    # all tiny; the compute matmuls keep the fast default. At default
    # precision the Adam-sensitive second-order hypergradient collapsed
    # to cos≈0.1 vs the f32 oracle; with exact structural movement it
    # matches the plain engine path's behavior.
    return jax.lax.dot_general(
        mask_bool.astype(jnp.float32), x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXACT,
    )


def _lane_select(x, start: int, width: int):
    """x[:, start:start+width] as a 0/1 selection MATMUL.

    A lane slice on the twice-differentiated path is fatal: its
    transpose is a ``lax.pad`` whose own transpose Mosaic rejects
    (negative-edge pad). A matmul transposes to a matmul at every
    order."""
    n = x.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    return jax.lax.dot_general(
        x, (rows == start + cols).astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXACT,
    )


def _rep_sample_major(x, S):
    # (out, K) → (S·out, K): row s·out+o = x[o]
    if S == 1:
        return x
    out = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S * out, out), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S * out, out), 1)
    return _mask_mm(rows % out == cols, x)


def _rep_class_major(x, S):
    # (nc, K) → (nc·S, K): row c·S+s = x[c]
    if S == 1:
        return x
    nc = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nc * S, nc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nc * S, nc), 1)
    return _mask_mm(rows // S == cols, x)


def _blockdiag_sample(W, S, out, inn):
    """Sample-major sampled weight (S·out, inn) → block-diagonal
    operator (S·out, S·inn) (one matmul for the S per-sample matmuls)."""
    if S == 1:
        return W
    trows = jax.lax.broadcasted_iota(jnp.int32, (inn, S * inn), 0)
    tcols = jax.lax.broadcasted_iota(jnp.int32, (inn, S * inn), 1)
    Wt = jax.lax.dot_general(
        W, (tcols % inn == trows).astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXACT,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (S * out, S * inn), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S * out, S * inn), 1)
    return Wt * (cols // inn == rows // out).astype(jnp.float32)


def _blockdiag_class(W, S, nc, inn):
    """Class-major sampled weight (nc·S, inn) → (nc·S, S·inn) with
    block (c·S+s, s·inn:·) = W[c·S+s]."""
    if S == 1:
        return W
    trows = jax.lax.broadcasted_iota(jnp.int32, (inn, S * inn), 0)
    tcols = jax.lax.broadcasted_iota(jnp.int32, (inn, S * inn), 1)
    Wt = jax.lax.dot_general(
        W, (tcols % inn == trows).astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXACT,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (nc * S, S * inn), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nc * S, S * inn), 1)
    return Wt * (cols // inn == rows % S).astype(jnp.float32)


_roll_ad_registered = False


def _ensure_roll_ad():
    """Register JVP/transpose rules for Mosaic's ``roll_p``.

    The fused unroll differentiates lane rolls to SECOND order (kernel
    A's inner grads, then kernel B's replayed vjp through them). Every
    alternative shift formulation fails: ``pltpu.roll`` ships with no
    AD rule; ``custom_vjp`` forbids the jvp that reverse-over-reverse
    linearization needs; ``linear_call`` has no Mosaic lowering; and
    slice/pad/concat shifts all eventually transpose into a
    negative-edge ``lax.pad``, which Mosaic rejects ("vector types must
    have positive constant sizes" — the round-3 finding). A roll is a
    pure lane permutation, so the missing rules are trivial and close
    the chain at every order: jvp(roll) = roll(tangent), transpose =
    the inverse roll."""
    global _roll_ad_registered
    if _roll_ad_registered:
        return
    try:
        from jax.interpreters import ad
        from jax._src.pallas.mosaic.primitives import roll_p
        from jax._src.ad_checkpoint import remat_p  # noqa: F401
        from jax._src.pallas.mosaic import lowering as _ml  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "fused_lenet needs jax-internal hooks (Mosaic roll_p AD rules "
            "+ a remat_p Mosaic lowering) whose private import paths moved "
            f"in this JAX version ({jax.__version__}): {e}. Run with "
            "fused_inner=False (plain XLA nested step) until the hooks in "
            "psvi_tpu/ops/fused_lenet.py:_ensure_roll_ad are updated."
        ) from e

    ad.defjvp(
        roll_p,
        lambda g, x, shift, **kw: roll_p.bind(g, shift, **kw),
        None,
    )

    def _transpose(ct, x, shift, *, axis, stride, stride_axis):
        assert stride is None and stride_axis is None
        size = ct.shape[axis]
        inv = (size - shift) % size
        return [
            roll_p.bind(ct, inv, axis=axis, stride=None, stride_axis=None),
            None,
        ]

    ad.primitive_transposes[roll_p] = _transpose

    # jax.checkpoint's remat2 has no Mosaic lowering either; when a
    # checkpointed region survives into the kernel jaxpr undifferentiated
    # (kernel A's primal path), lower it by INLINING its jaxpr — the
    # same pattern the lowering uses for custom_jvp_call.
    from jax._src.ad_checkpoint import remat_p
    from jax._src.pallas.mosaic import lowering as _ml  # noqa: F811

    @_ml.register_lowering_rule(remat_p)
    def _remat_lowering(ctx, *args, jaxpr, **_):
        lowering_context = ctx.lowering_context.replace(
            block_shapes=ctx.block_shapes
        )
        return _ml.jaxpr_subcomp(lowering_context, jaxpr, *args)

    _roll_ad_registered = True


def _make_roll(backend: str):
    """Static lane-roll (np.roll semantics), differentiable to any
    order (see :func:`_ensure_roll_ad`)."""
    if backend == "pallas":
        _ensure_roll_ad()
        return lambda x, s: pltpu.roll(x, s % x.shape[1], 1)
    return lambda x, s: jnp.roll(x, s, axis=1)


_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _softplus(x):
    return jax.nn.softplus(x)


def _make_body(cfg: LeNetCfg, backend: str):
    """The pure one-iteration inner step ``(t, p, m, n, hyper, eps) →
    (p', m', n', loss_t)`` shared by kernels A and B and the XLA
    fallback. ``eps`` is the flat tuple of this iteration's noise
    (kernel-layout shapes), treated as a constant (stop-gradient)."""
    S, M, nc = cfg.S, cfg.M, cfg.nc
    K1, K2, q = cfg.K1, cfg.K2, cfg.q
    P1, P2, H2 = cfg.P1, cfg.P2, cfg.H2
    f = cfg.fc
    L = cfg.lanes
    roll = _make_roll(backend)
    prec = lambda site: _site_precision(site, cfg.exact_sites)  # noqa: E731

    def core_weights(v, alpha):
        if cfg.parameterised:
            mx = jnp.max(v, axis=1, keepdims=True)
            e = jnp.exp(v - mx)
            fv = e / jnp.sum(e, axis=1, keepdims=True)
        else:
            fv = v
        if cfg.use_alpha:
            fv = jnp.exp(alpha[0, 0]) * fv
        return cfg.N * fv  # (1, M)

    def sampled(p, eps):
        """θ = rep(μ) + rep(softplus(ρ))·ε per tensor; fc3 class-major,
        everything else sample-major."""
        th = []
        for i in range(0, 20, 2):
            mu, rho = p[i], p[i + 1]
            rep = _rep_class_major if i >= 16 else _rep_sample_major
            th.append(rep(mu, S) + rep(_softplus(rho), S) * eps[i // 2])
        return th  # 10 sampled tensors (w1,b1,w2,b2,wf1,bf1,wf2,bf2,wf3,bf3)

    # Per-block rematerialization: the one-iteration body is
    # differentiated TWICE and naive partial-eval keeps every rolled
    # activation copy and per-position product live simultaneously
    # (measured 270 MB of VMEM demand at toy size). Checkpointing each
    # contribution stores only the SHARED operands (pooled1/pooled2/w)
    # and recomputes the cheap roll/select per contribution in the
    # backward. prevent_cse=False: the default optimization barrier has
    # no Mosaic lowering.
    ckpt = functools.partial(jax.checkpoint, prevent_cse=False)

    def _conv1(w1, b1, patches):
        # conv1 + pool1 (parity max) + bias-after-max + relu
        A = None
        for P_ab in patches:
            ya = jax.lax.dot_general(
                w1, P_ab, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec("conv1"),
            )  # (S·K1, L)
            A = ya if A is None else jnp.maximum(A, ya)
        return jnp.maximum(A + b1, 0.0)

    def _conv2_contrib(dd, pooled1, w2):
        # one shifted block-diagonal matmul (lane layout preserves
        # within-image spacing; valid lanes never wrap across images).
        # The roll goes AFTER the dot — it commutes with a row-acting
        # matmul — so the dot's stored backward operand is the SHARED
        # pooled1, not a per-offset rolled copy (25 of which blew the
        # VMEM budget as vjp residuals).
        dy, dx = divmod(dd, cfg.k)
        Wdd = _lane_select(w2, dd * K1, K1)  # (S·K2, K1)
        bd = _blockdiag_sample(Wdd, S, K2, K1)  # (S·K2, S·K1)
        out = jax.lax.dot_general(
            bd, pooled1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec("conv2"),
        )
        return out if dd == 0 else roll(out, -(dy * P1 + dx))

    def _pool2(A2, b2):
        B2 = jnp.maximum(A2, roll(A2, -1))
        B2 = jnp.maximum(B2, roll(A2, -P1))
        B2 = jnp.maximum(B2, roll(A2, -(P1 + 1)))
        return jnp.maximum(B2 + b2, 0.0)  # (S·K2, L) valid @ even pos

    def _flat_select(pidx, pooled2, C0):
        # position pidx's lanes selected by the SHARED base mask C0
        # (l == m·P1²) after a roll by the source offset. Checkpointed:
        # the dot's backward needs the per-position rolled copy, which
        # is recomputed from pooled2 instead of stored (25 copies).
        C0 = jax.lax.stop_gradient(C0)  # constant — no cotangent math
        r3, c3 = divmod(pidx, P2)
        src = (2 * r3) * P1 + 2 * c3
        g_in = pooled2 if src == 0 else roll(pooled2, -src)
        return jax.lax.dot_general(
            g_in, C0, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec("flat_sel"),
        )  # (S·K2, M)

    def _flat_contrib(pidx, pooled2, wf1, C0):
        Gp = ckpt(_flat_select, static_argnums=(0,))(pidx, pooled2, C0)
        Wp = _lane_select(wf1, pidx * K2, K2)  # (S·h1, K2)
        bdw = _blockdiag_sample(Wp, S, f[1], K2)  # (S·h1, S·K2)
        return jax.lax.dot_general(
            bdw, Gp, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec("flat_w"),
        )

    def forward_nll(th, patches, ypse, C0):
        w1, b1, w2, b2, wf1, bf1, wf2, bf2, wf3, bf3 = th
        pooled1 = ckpt(_conv1)(w1, b1, patches)
        A2 = None
        for dd in range(cfg.k * cfg.k):
            contrib = _conv2_contrib(dd, pooled1, w2)
            A2 = contrib if A2 is None else A2 + contrib
        pooled2 = ckpt(_pool2)(A2, b2)
        H1 = None
        for pidx in range(P2 * P2):
            contrib = _flat_contrib(pidx, pooled2, wf1, C0)
            H1 = contrib if H1 is None else H1 + contrib
        H1 = jnp.maximum(H1 + bf1, 0.0)  # (S·h1, M)
        # fc2 (sample-major blockdiag) + relu
        H2a = jax.lax.dot_general(
            _blockdiag_sample(wf2, S, f[2], f[1]), H1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec("fc2"),
        )
        H2a = jnp.maximum(H2a + bf2, 0.0)  # (S·h2, M)
        # fc3 (class-major blockdiag) → logits (nc·S, M)
        Z = jax.lax.dot_general(
            _blockdiag_class(wf3, S, nc, f[2]), H2a,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec("fc3"),
        ) + bf3
        # categorical NLL via per-class selection matmuls (class-major)
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, nc * S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, nc * S), 1)
        Zc = [_mask_mm(cols == c * S + rows, Z) for c in range(nc)]
        mx = Zc[0]
        for c in range(1, nc):
            mx = jnp.maximum(mx, Zc[c])
        sumexp = jnp.exp(Zc[0] - mx)
        for c in range(1, nc):
            sumexp = sumexp + jnp.exp(Zc[c] - mx)
        lse = mx + jnp.log(sumexp)
        picked = Zc[0] * jax.lax.slice_in_dim(ypse, 0, 1, axis=0)
        for c in range(1, nc):
            picked = picked + Zc[c] * jax.lax.slice_in_dim(
                ypse, c, c + 1, axis=0
            )
        return lse - picked  # (S, M)

    def kl_dense(p):
        # analytic KL over DENSE layers only (ref psvi_classes.py:506-510
        # — conv-layer KL terms are excluded by the reference)
        sp = cfg.prior_sd

        def kl_leaf(mu, rho):
            sd = _softplus(rho)
            return jnp.sum(
                jnp.log(sp / sd)
                + (jnp.square(sd) + jnp.square(mu)) / (2.0 * sp * sp)
                - 0.5
            )

        out = jnp.float32(0.0)
        for i in range(8, 20, 2):
            out = out + kl_leaf(p[i], p[i + 1])
        return out

    def inner_loss(p, eps, patches, ypse, v, alpha, C0):
        th = sampled(p, eps)
        nllm = forward_nll(th, patches, ypse, C0)  # (S, M)
        cw = core_weights(v, alpha)  # (1, M)
        pseudo = jax.lax.dot_general(
            nllm, cw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec("pseudo"),
        )  # (S, 1)
        return jnp.sum(pseudo) + kl_dense(p)

    def one_iter(t, p, m, n, eps, patches, ypse, v, alpha, lr, C0):
        eps = tuple(jax.lax.stop_gradient(e) for e in eps)
        loss_t, g = jax.value_and_grad(inner_loss)(
            p, eps, patches, ypse, v, alpha, C0
        )
        tf = (t + 1).astype(jnp.float32) if hasattr(t, "dtype") else float(
            t + 1
        )
        # b**t as exp(t·log b): Mosaic has no scalar powf lowering
        bc1 = 1.0 - jnp.exp(tf * math.log(cfg.b1))
        bc2s = jnp.sqrt(1.0 - jnp.exp(tf * math.log(cfg.b2)))
        m = tuple(cfg.b1 * mm + (1.0 - cfg.b1) * gg for mm, gg in zip(m, g))
        n = tuple(
            cfg.b2 * nn + (1.0 - cfg.b2) * jnp.square(gg)
            for nn, gg in zip(n, g)
        )
        p = tuple(
            pp - lr * (mm / bc1) / (_sqrt_safe(nn) / bc2s + cfg.adam_eps)
            for pp, mm, nn in zip(p, m, n)
        )
        return p, m, n, loss_t

    # exposed for the layer-by-layer kernel test harness
    one_iter.inner_loss = inner_loss
    one_iter.forward_nll = forward_nll
    one_iter.sampled = sampled
    one_iter.kl_dense = kl_dense
    return one_iter


def _base_mask(cfg: LeNetCfg):
    """The shared flatten selection mask C0[l, m] = (l == m·P1²) —
    built ONCE per kernel invocation and reused by all 25 positions
    (building a mask per position kept 25 (L, M) tensors live in the
    twice-differentiated body)."""
    L, M = cfg.lanes, cfg.M
    lrow = jax.lax.broadcasted_iota(jnp.int32, (L, M), 0)
    mcol = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
    return (lrow == mcol * (cfg.P1 * cfg.P1)).astype(jnp.float32)


def _eps_shapes(cfg: LeNetCfg):
    """Per-iteration sampled-noise shapes, kernel layout (10 tensors:
    one per sampled parameter tensor; fc3 class-major)."""
    f = cfg.fc
    return [
        (cfg.S * cfg.K1, cfg.q), (cfg.S * cfg.K1, 1),
        (cfg.S * cfg.K2, cfg.q * cfg.K1), (cfg.S * cfg.K2, 1),
        (cfg.S * f[1], f[0]), (cfg.S * f[1], 1),
        (cfg.S * f[2], f[1]), (cfg.S * f[2], 1),
        (cfg.nc * cfg.S, f[2]), (cfg.nc * cfg.S, 1),
    ]


def _make_eps_fns(cfg: LeNetCfg, backend: str):
    """Returns ``draw(t, seed_hi, seed_lo, eps_stacks) -> eps tuple``.

    'prng': in-kernel Box-Muller on pltpu.prng_random_bits, reseeded
    (hi, lo, t) so forward and backward kernels reproduce identical
    draws. 'input' (or any non-pallas backend): slice iteration t from
    the (T·rows, cols) stacks."""
    shapes = _eps_shapes(cfg)

    if cfg.eps_mode == "prng" and backend == "pallas":

        def draw(t, hi, lo, stacks):
            # libtpu caps prng_set_seed_32 at TWO values: fold the 16-bit
            # key halves into one i32 (wrapping is fine — determinism per
            # (key, t) is all that's needed) and keep t as the second
            pltpu.prng_seed(hi * 65536 + lo, t)

            def unif(shape):
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits(shape), jnp.uint32
                )
                m = (bits >> 9).astype(jnp.int32)
                return m.astype(jnp.float32) / jnp.float32(1 << 23)

            out = []
            for sh in shapes:
                u1, u2 = unif(sh), unif(sh)
                out.append(
                    jnp.sqrt(-2.0 * jnp.log(jnp.clip(u1, 1e-12)))
                    * jnp.cos((2.0 * np.pi) * u2)
                )
            return tuple(out)

        return draw

    if backend == "pallas":
        # stacks arrive as REFS: a dynamic slice of a VALUE has no
        # Mosaic lowering, but dynamic ref reads do
        def draw(t, hi, lo, stacks):
            return tuple(
                st[pl.ds(t * sh[0], sh[0]), :]
                for sh, st in zip(shapes, stacks)
            )

        return draw

    def draw(t, hi, lo, stacks):
        out = []
        for sh, st in zip(shapes, stacks):
            out.append(
                jax.lax.dynamic_slice_in_dim(st, t * sh[0], sh[0], axis=0)
            )
        return tuple(out)

    return draw




# ---------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------


def _n_inputs(cfg: LeNetCfg):
    n = 20 + 4 + 3  # params, patches, v/alpha/ypse
    if cfg.eps_mode == "input":
        n += 10
    n += 2  # lr, seed (SMEM)
    return n


def _split_input_refs(cfg: LeNetCfg, ins):
    """Materialize params/patches/hyper inputs; keep eps stacks as REFS
    (the per-iteration slice must be a dynamic ref read — a dynamic
    slice of a value has no Mosaic lowering). Seed arrives as two f32
    halves (16 bits each) so the custom_vjp cotangent stays a plain
    float zero."""
    p = tuple(ins[i][:] for i in range(20))
    patches = tuple(ins[20 + i][:] for i in range(4))
    v, alpha, ypse = ins[24][:], ins[25][:], ins[26][:]
    i = 27
    stacks = ()
    if cfg.eps_mode == "input":
        stacks = tuple(ins[i : i + 10])
        i += 10
    lr = ins[i][0, 0]
    hi = ins[i + 1][0, 0].astype(jnp.int32)
    lo = ins[i + 1][0, 1].astype(jnp.int32)
    return p, patches, v, alpha, ypse, stacks, lr, hi, lo


def _kernel_A(*refs, cfg: LeNetCfg):
    n_in = _n_inputs(cfg)
    ins, outs = refs[:n_in], refs[n_in:]
    p, patches, v, alpha, ypse, stacks, lr, hi, lo = _split_input_refs(
        cfg, ins
    )
    body = _make_body(cfg, "pallas")
    draw = _make_eps_fns(cfg, "pallas")
    C0 = _base_mask(cfg)

    m0 = tuple(jnp.zeros_like(x) for x in p)
    n0 = tuple(jnp.zeros_like(x) for x in p)

    def loop(t, carry):
        pc, mc, nc_ = carry
        eps = draw(t, hi, lo, stacks)
        pc, mc, nc_, loss_t = body(
            t, pc, mc, nc_, eps, patches, ypse, v, alpha, lr, C0
        )
        outs[1][0, t] = loss_t
        return pc, mc, nc_

    pT, _, _ = jax.lax.fori_loop(0, cfg.T, loop, (p, m0, n0))
    outs[0][0, 0] = jnp.float32(0.0)  # unused scalar slot
    for i in range(20):
        outs[2 + i][:] = pT[i]


# debug switch: python-unroll kernel B's loops instead of fori
_UNROLL_B = False


def _kernel_B(*refs, cfg: LeNetCfg):
    """Backward: forward re-run storing (p, m, n) per iteration in VMEM
    scratch, then a reverse sweep replaying jax.vjp of the one-iteration
    body (second-order terms traced automatically)."""
    n_in = _n_inputs(cfg)
    # inputs: the same forward inputs + cotangents (dparamsT ×20,
    # dlosses (1, T)); outputs: dparams0 ×20, dpatches ×4, dv, dalpha;
    # then scratch: 60 stacked state buffers.
    ins = refs[: n_in + 21]
    outs = refs[n_in + 21 : n_in + 21 + 26]
    scratch = refs[n_in + 21 + 26 :]
    p, patches, v, alpha, ypse, stacks, lr, hi, lo = _split_input_refs(
        cfg, ins
    )
    dT = tuple(r[:] for r in ins[n_in : n_in + 20])
    dlosses = ins[n_in + 20]
    body = _make_body(cfg, "pallas")
    draw = _make_eps_fns(cfg, "pallas")
    C0 = _base_mask(cfg)
    shapes = [x.shape for x in p]

    m0 = tuple(jnp.zeros_like(x) for x in p)
    n0 = tuple(jnp.zeros_like(x) for x in p)

    def store(t, pc, mc, nc_):
        for i in range(20):
            r = shapes[i][0]
            scratch[i][pl.ds(t * r, r), :] = pc[i]
            scratch[20 + i][pl.ds(t * r, r), :] = mc[i]
            scratch[40 + i][pl.ds(t * r, r), :] = nc_[i]

    def load(t):
        pc, mc, nc_ = [], [], []
        for i in range(20):
            r = shapes[i][0]
            pc.append(scratch[i][pl.ds(t * r, r), :])
            mc.append(scratch[20 + i][pl.ds(t * r, r), :])
            nc_.append(scratch[40 + i][pl.ds(t * r, r), :])
        return tuple(pc), tuple(mc), tuple(nc_)

    def fwd_loop(t, carry):
        pc, mc, nc_ = carry
        store(t, pc, mc, nc_)
        eps = draw(t, hi, lo, stacks)
        pc, mc, nc_, _ = body(
            t, pc, mc, nc_, eps, patches, ypse, v, alpha, lr, C0
        )
        return pc, mc, nc_

    if _UNROLL_B:
        carry = (p, m0, n0)
        for t in range(cfg.T):
            carry = fwd_loop(t, carry)  # python t: fully static indexing
    else:
        jax.lax.fori_loop(0, cfg.T, fwd_loop, (p, m0, n0))

    zero_p = tuple(jnp.zeros_like(x) for x in p)
    dpat0 = tuple(jnp.zeros_like(x) for x in patches)
    dv0 = jnp.zeros_like(v)
    dal0 = jnp.zeros_like(alpha)

    def rev_loop(i, carry):
        dp, dm, dn, dpat, dv, dal = carry
        t = cfg.T - 1 - i
        pc, mc, nc_ = load(t)
        eps = draw(t, hi, lo, stacks)

        def step(pc_, mc_, nc__, patches_, v_, alpha_):
            return body(
                t, pc_, mc_, nc__, eps, patches_, ypse, v_, alpha_, lr, C0
            )

        _, vjp_fn = jax.vjp(step, pc, mc, nc_, patches, v, alpha)
        dl = dlosses[0, t]
        gdp, gdm, gdn, gdpat, gdv, gdal = vjp_fn((dp, dm, dn, dl))
        dpat = tuple(a + b for a, b in zip(dpat, gdpat))
        return gdp, gdm, gdn, dpat, dv + gdv, dal + gdal

    if _UNROLL_B:
        carry2 = (dT, zero_p, zero_p, dpat0, dv0, dal0)
        for i in range(cfg.T):
            carry2 = rev_loop(i, carry2)  # python i: static indexing
        dp, dm, dn, dpat, dv, dal = carry2
    else:
        dp, dm, dn, dpat, dv, dal = jax.lax.fori_loop(
            0, cfg.T, rev_loop, (dT, zero_p, zero_p, dpat0, dv0, dal0)
        )
    for i in range(20):
        outs[i][:] = dp[i]
    for i in range(4):
        outs[20 + i][:] = dpat[i]
    outs[24][:] = dv
    outs[25][:] = dal


# ---------------------------------------------------------------------
# XLA fallback (oracle / CPU) and the custom_vjp wrapper
# ---------------------------------------------------------------------


def _xla_unroll(cfg, p, patches, v, alpha, ypse, stacks, lr, seed):
    body = _make_body(cfg, "xla")
    draw = _make_eps_fns(cfg, "xla")
    C0 = _base_mask(cfg)
    m = tuple(jnp.zeros_like(x) for x in p)
    n = tuple(jnp.zeros_like(x) for x in p)
    losses = []
    for t in range(cfg.T):
        eps = draw(t, None, None, stacks)
        p, m, n, loss_t = body(
            t, p, m, n, eps, patches, ypse, v, alpha, lr, C0
        )
        losses.append(loss_t)
    return p, jnp.stack(losses).reshape(1, cfg.T)


@functools.lru_cache(maxsize=None)
def make_fused_unroll(cfg: LeNetCfg, backend: str = "pallas"):
    """Build the custom_vjp'd fused unroll for a static config.

    Signature of the returned fn:
    ``fn(params0 (20-tuple), patches (4-tuple), v (1,M), alpha (1,1),
    ypse (nc,M), eps_stacks (10-tuple or ()), lr (1,1), seed (2,) i32)
    → (paramsT 20-tuple, inner_losses (1,T))``.

    Differentiable w.r.t. params0, patches, v, alpha (the engine's
    outer grad path); the noise is a constant by construction."""
    interpret = backend == "interpret"
    if interpret:
        backend = "pallas"
    if backend == "xla" or not _PALLAS_OK:
        if cfg.eps_mode == "prng":
            raise ValueError(
                "eps_mode='prng' needs the pallas backend (the Mosaic "
                "PRNG has no XLA twin); use eps_mode='input' off-TPU"
            )

        @jax.jit
        def fn(p, patches, v, alpha, ypse, stacks, lr, seed):
            return _xla_unroll(
                cfg, p, patches, v, alpha, ypse, stacks, lr, seed
            )

        return fn

    pshapes = cfg.param_shapes()
    eshapes = _eps_shapes(cfg)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731

    def in_specs():
        n = _n_inputs(cfg)
        return [vmem() for _ in range(n - 2)] + [smem(), smem()]

    def flat_inputs(p, patches, v, alpha, ypse, stacks, lr, seed):
        out = list(p) + list(patches) + [v, alpha, ypse]
        if cfg.eps_mode == "input":
            out += list(stacks)
        out += [lr, seed]
        return out

    def call_A(p, patches, v, alpha, ypse, stacks, lr, seed):
        out_shape = (
            [jax.ShapeDtypeStruct((1, 1), jnp.float32),
             jax.ShapeDtypeStruct((1, cfg.T), jnp.float32)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes]
        )
        out = pl.pallas_call(
            functools.partial(_kernel_A, cfg=cfg),
            out_shape=tuple(out_shape),
            in_specs=in_specs(),
            out_specs=tuple([smem(), smem()] + [vmem()] * 20),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*flat_inputs(p, patches, v, alpha, ypse, stacks, lr, seed))
        return tuple(out[2:]), out[1]

    def call_B(p, patches, v, alpha, ypse, stacks, lr, seed, dT, dlosses):
        L = cfg.lanes
        out_shape = (
            [jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes]
            + [jax.ShapeDtypeStruct((cfg.q, L), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((1, cfg.M), jnp.float32),
               jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        )
        scratch = [
            pltpu.VMEM((cfg.T * s[0], s[1]), jnp.float32)
            for s in pshapes
        ] * 3
        out = pl.pallas_call(
            functools.partial(_kernel_B, cfg=cfg),
            out_shape=tuple(out_shape),
            in_specs=in_specs() + [vmem()] * 20 + [smem()],
            out_specs=tuple([vmem()] * 26),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            *flat_inputs(p, patches, v, alpha, ypse, stacks, lr, seed),
            *dT,
            dlosses,
        )
        dp = tuple(out[:20])
        dpat = tuple(out[20:24])
        return dp, dpat, out[24], out[25]

    @jax.custom_vjp
    def fn(p, patches, v, alpha, ypse, stacks, lr, seed):
        return call_A(p, patches, v, alpha, ypse, stacks, lr, seed)

    def fwd(p, patches, v, alpha, ypse, stacks, lr, seed):
        out = call_A(p, patches, v, alpha, ypse, stacks, lr, seed)
        return out, (p, patches, v, alpha, ypse, stacks, lr, seed)

    def bwd(res, cotangents):
        p, patches, v, alpha, ypse, stacks, lr, seed = res
        dT, dlosses = cotangents
        dp, dpat, dv, dal = call_B(
            p, patches, v, alpha, ypse, stacks, lr, seed, tuple(dT), dlosses
        )
        dstacks = tuple(jnp.zeros_like(s) for s in stacks)
        return (
            dp, dpat, dv, dal, jnp.zeros_like(ypse), dstacks,
            jnp.zeros_like(lr), jnp.zeros_like(seed),
        )

    fn.defvjp(fwd, bwd)
    return jax.jit(fn)


# ---------------------------------------------------------------------
# engine integration (dispatch mirror of ops/fused_nested.py)
# ---------------------------------------------------------------------

# Size guards: kernel B's VMEM scratch is 3 stacked (T·rows, cols) state
# buffers per parameter tensor; the twice-differentiated body also keeps
# a few lane-wide activations live. Bound both well inside the ~128 MB
# v5e VMEM (the flagship T=20, S=10, M=100 sits at ~31 MB scratch).
_MAX_SCRATCH_BYTES = 72 * 1024 * 1024
_MAX_LANES = 40960  # M·P1² (M ≤ 208 at H=28)


def _scratch_bytes(cfg: LeNetCfg) -> int:
    return sum(
        3 * 4 * cfg.T * r * c for (r, c) in cfg.param_shapes()
    )


def _lenet_geometry(engine):
    """(conv1, conv2, dense-list) when the net is a LeNet-family trunk the
    kernel can represent, else None: two 5×5 convs (1-channel 'same' head,
    unpadded second) each 2×2-max-pooled (fused VIConvPool2d or literal
    MaxPool2d), Flatten, three biased VILinear layers, ReLU/Identity glue.
    Reference net: ``make_lenet`` (psvi/models/neural_net.py:334-359)."""
    from psvi_tpu.models.layers import (
        Flatten, Identity, MaxPool2d, ReLU, Sequential, VIConv2d,
        VIConvPool2d, VILinear,
    )

    net = engine.net
    if not isinstance(net, Sequential):
        return None
    L = list(net.layers)
    allowed = (VIConv2d, MaxPool2d, Identity, ReLU, Flatten, VILinear)
    if not all(isinstance(l, allowed) for l in L):
        return None
    convs = [l for l in L if isinstance(l, VIConv2d)]
    dense = [l for l in L if type(l) is VILinear]
    if len(convs) != 2 or len(dense) != 3:
        return None
    for c in convs:
        i = L.index(c)
        if isinstance(c, VIConvPool2d):
            if c.pool_k != 2:
                return None
        else:
            nxt = L[i + 1] if i + 1 < len(L) else None
            if not (
                isinstance(nxt, MaxPool2d)
                and nxt.kernel_size == 2 and nxt.stride == 2
                and nxt.padding == 0
            ):
                return None
    c1, c2 = convs
    if not (
        c1.in_channels == 1 and c1.kernel_size == 5
        and c1.padding == 2 and c1.stride == 1
    ):
        return None
    if not (
        c2.in_channels == c1.out_channels and c2.kernel_size == 5
        and c2.padding == 0 and c2.stride == 1
    ):
        return None
    # kernel KL semantics: dense-only (ref psvi_classes.py:506-510) with
    # ONE prior_sd; biases required everywhere (the sampled-θ layout
    # assumes them)
    if any(c.count_kl or not c.use_bias for c in convs):
        return None
    if not all(
        l.count_kl and l.use_bias and l.prior_sd == dense[0].prior_sd
        for l in dense
    ):
        return None
    # geometry: H from the engine's input dim; dense widths must chain
    # from the conv trunk (fc input = K2·P2²)
    H2 = int(round(math.sqrt(engine.D / c1.in_channels)))
    if H2 * H2 * c1.in_channels != engine.D or H2 % 4 != 0:
        return None
    P1 = H2 // 2
    conv2_out = P1 - c2.kernel_size + 1
    if conv2_out <= 0 or conv2_out % 2:
        return None
    P2 = conv2_out // 2
    widths = (
        c2.out_channels * P2 * P2, dense[0].out_dim, dense[1].out_dim,
        dense[2].out_dim,
    )
    if dense[0].in_dim != widths[0] or dense[1].in_dim != widths[1] \
            or dense[2].in_dim != widths[2]:
        return None
    return c1, c2, dense, H2, widths


def supports(engine) -> bool:
    """True when the engine's nested step can run with the fused LeNet
    inner unroll: LeNet-family conv trunk (see :func:`_lenet_geometry`),
    categorical hard labels (learn_z soft labels would need a d/ypse
    cotangent the kernel does not emit — round-4 advisor finding), plain
    nested trainer, inner Adam, sizes inside the VMEM budget."""
    geo = _lenet_geometry(engine)
    if geo is None:
        return False
    if getattr(engine, "_in_trial_vmap", False):
        return False  # vmapped pallas_call — same gate as fused_nested
    cfg = cfg_from_engine(engine)
    # Mosaic compile envelope (measured, round 5): register-spill
    # pressure grows ~S^2 through the block-diagonal sample operators
    # and with the activation lane count M·P1². Measured: S=3/M=16
    # (3136 lanes) compiles in ~4 min and matches the oracle on TPU;
    # S=10/M=16 runs the register allocator ~68 min then OOMs VMEM on
    # 143 MB of spill slots alone; S=4/M=100 (19600 lanes) was still
    # compiling past 30 min (BENCHMARKS.md "conv-family fused kernel").
    # Gate compiled-TPU use to the measured-tractable region S<=4 AND
    # lanes<=4096; the XLA fallback (CPU oracle/tests) has no limit.
    if jax.default_backend() == "tpu" and (
        cfg.S > 4 or cfg.lanes > 4096
    ):
        return False
    if _scratch_bytes(cfg) > _MAX_SCRATCH_BYTES:
        return False
    if cfg.lanes > _MAX_LANES:
        return False
    return (
        engine.trainer == "nested"
        and not engine.truncated
        and engine.inner_optimizer == "adam"
        and engine.likelihood == "categorical"
        and not engine.spec.learn_z
        and not engine.spec.ablated
        and not engine.spec.evaluate_only
        and engine.mc_samples >= 2
        and engine.inner_it >= 1
        and not engine.shard_mc
        and engine.batch_shardings is None
        and engine.num_pseudo > 0
    )


def cfg_from_engine(engine) -> LeNetCfg:
    """Build the static kernel config from a supported engine. Resolves
    the PSVI_TPU_FL_EXACT per-site-precision override HERE, once, so it
    is part of the lru-cache key (never re-read at trace time)."""
    import os

    geo = _lenet_geometry(engine)
    assert geo is not None, "call supports() first"
    c1, c2, dense, H, widths = geo
    env = os.environ.get("PSVI_TPU_FL_EXACT")
    return LeNetCfg(
        T=engine.inner_it, S=engine.mc_samples, M=engine.num_pseudo,
        nc=engine.nc, N=float(engine.N),
        parameterised=bool(engine.spec.parameterised),
        use_alpha=bool(engine.spec.learn_alpha or engine.spec.alpha_fixed),
        prior_sd=float(dense[0].prior_sd),
        K1=c1.out_channels, K2=c2.out_channels, k=c1.kernel_size, H=H,
        fc=widths,
        eps_mode="prng" if engine.fused_eps == "batched" else "input",
        exact_sites=env if env is not None else "default",
    )


def eps_stacks_from_tree(eps_ts, didx, cfg: LeNetCfg):
    """Engine per-iteration noise (leading T axis; ``jax.vmap`` of
    ``net.sample_eps`` over the inner keys) → the 10 stacked
    ``(T·rows, cols)`` kernel-layout tensors for ``eps_mode='input'``.
    Pure reshapes/transposes of the SAME draws, so the fused unroll is
    bit-compatible in distribution with the plain ``_run_inner`` stream
    (identical values, kernel layout)."""
    S, K1, K2, q, f, nc = cfg.S, cfg.K1, cfg.K2, cfg.q, cfg.fc, cfg.nc
    c1, c2, f1, f2, f3 = (eps_ts[i] for i in didx)
    T = c1["b"].shape[0]
    p2 = cfg.P2 * cfg.P2
    return (
        c1["w"].reshape(T * S * K1, q),
        c1["b"].reshape(T * S * K1, 1),
        jnp.transpose(
            c2["w"].reshape(T, S, K2, K1, q), (0, 1, 2, 4, 3)
        ).reshape(T * S * K2, q * K1),
        c2["b"].reshape(T * S * K2, 1),
        jnp.transpose(
            f1["w"].reshape(T, S, f[1], K2, p2), (0, 1, 2, 4, 3)
        ).reshape(T * S * f[1], f[0]),
        f1["b"].reshape(T * S * f[1], 1),
        f2["w"].reshape(T * S * f[2], f[1]),
        f2["b"].reshape(T * S * f[2], 1),
        jnp.transpose(f3["w"], (0, 2, 1, 3)).reshape(T * nc * S, f[2]),
        jnp.transpose(f3["b"], (0, 2, 1)).reshape(T * nc * S, 1),
    )


def seed_halves(key):
    """PRNG seed input for ``eps_mode='prng'``: two 16-bit halves of the
    inner key as a (1, 2) f32 — float-typed so the custom_vjp cotangent
    stays a plain zero float (no int-cotangent special case)."""
    bits = jax.random.randint(key, (1, 2), 0, 1 << 16)
    return bits.astype(jnp.float32)

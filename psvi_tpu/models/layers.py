"""Functional variational layers (TPU-native model zoo core).

Re-designs the reference's stateful PyTorch variational modules
(``psvi/models/neural_net.py:60-491`` — ``VIMixin``, ``VILinear``,
``VIConv2d``, ``MultivariateNormalVIMixin``) as *pure functions over
pytrees*:

- a layer object is a frozen dataclass (static, hashable → jit-friendly);
- ``init(key)`` returns the parameter pytree ``{'mu_w','rho_w','mu_b','rho_b'}``
  (sd stored pre-softplus, as in the reference's ``_weight_sd``);
- ``sample_eps(key, S)`` draws the standard-normal noise pytree with leading
  MC-sample axis ``S``;
- ``apply(params, eps, x)`` runs the reparameterized forward for all S samples
  at once — θ = μ + softplus(ρ)·ε — the JAX analog of the reference's
  in-layer S-batching (``neural_net.py:155-179``);
- ``nkl(params, eps)`` computes the per-sample log p(θ)−log q(θ) from the
  SAME ε used by the forward, replacing the reference's cached-sample trick
  (``neural_net.py:110-115``: ``_cached_weight``) with explicit threading;
- ``kl(params)`` is the analytic KL(q‖p) used by the inner ELBO
  (``neural_net.py:101-108``).

Reference-behavior note: the reference's objectives only sum KL/NKL over
``VILinear``/``VILinearMultivariateNormal`` modules — ``VIConv2d`` layers are
sampled but their KL terms are *excluded* (``psvi/inference/psvi_classes.py:
479-483,506-510``). We reproduce this via the ``count_kl`` flag (True for
dense layers, False for conv), overridable at construction.

Shapes: activations always carry a leading MC-sample axis: x is
``(S, N, ...)``; a bare ``(N, ...)`` input is broadcast to S by ``Sequential``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Any  # pytree of jnp arrays
Eps = Any  # pytree of jnp arrays with leading S axis

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def inverse_softplus(x):
    """Stable inverse of softplus: y s.t. softplus(y) = x."""
    x = jnp.asarray(x)
    # log(expm1(x)) = x + log1p(-exp(-x)); stable for both small and large x.
    return x + jnp.log(-jnp.expm1(-x))


def _normal_logpdf(x, mu, sd):
    return -0.5 * jnp.square((x - mu) / sd) - jnp.log(sd) - _HALF_LOG_2PI


def _gaussian_kl(mu_q, sd_q, sd_p):
    """KL( N(mu_q, sd_q) || N(0, sd_p) ), elementwise."""
    return (
        jnp.log(sd_p / sd_q)
        + (jnp.square(sd_q) + jnp.square(mu_q)) / (2.0 * jnp.square(sd_p))
        - 0.5
    )


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


@dataclasses.dataclass(frozen=True)
class Layer:
    """Base: stateless pass-through layer."""

    def init(self, key) -> Params:
        return {}

    def sample_eps(self, key, mc_samples: int) -> Eps:
        return {}

    def apply(self, params: Params, eps: Eps, x):
        raise NotImplementedError

    def kl(self, params: Params):
        return jnp.float32(0.0)

    def nkl(self, params: Params, eps: Eps):
        return jnp.float32(0.0)

    @property
    def is_variational(self) -> bool:
        return False


@dataclasses.dataclass(frozen=True)
class VILinear(Layer):
    """Mean-field Gaussian variational dense layer.

    Functional analog of the reference's ``VILinear`` (``psvi/models/
    neural_net.py:176-179``): per-forward reparameterized weight/bias samples
    batched over S, ``y = x @ W_sᵀ + b_s``.
    """

    in_dim: int
    out_dim: int
    init_sd: float = 0.01
    prior_sd: float = 1.0
    use_bias: bool = True
    count_kl: bool = True  # dense layers' KL counts (ref psvi_classes.py:479-483)
    backend: str = "xla"  # 'pallas' = fused sample+matmul kernel (first-order paths)
    # Activation dtype through the matmul/conv stack ('float32'|'bfloat16').
    # bf16 casts the einsum/conv operands and keeps activations bf16 between
    # layers (backward matmuls run bf16 too); the MXU accumulates bf16
    # products in f32 natively. Parameters, KL/NKL log-densities and all
    # loss math stay f32 — Sequential.apply restores f32 at the output.
    # bf16 shares f32's exponent range, so no loss scaling is needed.
    compute_dtype: str = "float32"

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        # torch nn.Linear.reset_parameters: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in)
        bound = 1.0 / math.sqrt(self.in_dim)
        rho = jnp.asarray(
            inverse_softplus(jnp.float32(self.init_sd)), dtype=jnp.float32
        )
        p = {
            "mu_w": _uniform(kw, (self.out_dim, self.in_dim), bound),
            "rho_w": jnp.full((self.out_dim, self.in_dim), rho),
        }
        if self.use_bias:
            p["mu_b"] = _uniform(kb, (self.out_dim,), bound)
            p["rho_b"] = jnp.full((self.out_dim,), rho)
        return p

    def sample_eps(self, key, mc_samples: int) -> Eps:
        kw, kb = jax.random.split(key)
        e = {"w": jax.random.normal(kw, (mc_samples, self.out_dim, self.in_dim))}
        if self.use_bias:
            e["b"] = jax.random.normal(kb, (mc_samples, self.out_dim))
        return e

    def _theta(self, params, eps):
        w = params["mu_w"] + jax.nn.softplus(params["rho_w"]) * eps["w"]
        b = None
        if self.use_bias:
            b = params["mu_b"] + jax.nn.softplus(params["rho_b"]) * eps["b"]
        return w, b

    def apply(self, params, eps, x):
        # x: (S, N, in) or (N, in) unbatched ; w: (S, out, in) ; b: (S, out)
        # The Pallas kernel is f32-only (no bf16 tiling path); with mixed
        # precision it would receive f32 params / bf16 activations, so the
        # combination falls back to the XLA formulation.
        if (
            x.ndim == 3 and self.backend == "pallas" and self.use_bias
            and self.compute_dtype == "float32"
        ):
            from psvi_tpu.ops.pallas_vi import sampled_linear

            return sampled_linear(
                x, params["mu_w"], params["rho_w"],
                params["mu_b"], params["rho_b"], eps["w"], eps["b"],
            )
        w, b = self._theta(params, eps)
        return self.apply_theta(w, b, x)

    def apply_theta(self, w, b, x):
        """Forward with explicit parameter samples w (S,out,in), b (S,out) —
        used directly by the packed flat-parameter representation."""
        # Unbatched inputs (first variational layer) are NOT broadcast to S —
        # the einsum introduces the S axis, avoiding an (S, N, in) copy.
        eq = "ni,soi->sno" if x.ndim == 2 else "sni,soi->sno"
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            # bf16 activations in AND out: the backward matmuls then also run
            # with bf16 operands (a pure-f32-accumulation boundary here would
            # push f32 cotangents into the transposed einsums). On the MXU a
            # bf16 matmul accumulates in f32 natively; Sequential.apply casts
            # the network output back to f32 before any loss math.
            x, w = x.astype(cd), w.astype(cd)
            b = b.astype(cd) if b is not None else None
        y = jnp.einsum(eq, x, w)
        if b is not None:
            y = y + b[:, None, :]
        return y

    def kl(self, params):
        sd_w = jax.nn.softplus(params["rho_w"])
        total = jnp.sum(_gaussian_kl(params["mu_w"], sd_w, self.prior_sd))
        if self.use_bias:
            sd_b = jax.nn.softplus(params["rho_b"])
            total += jnp.sum(_gaussian_kl(params["mu_b"], sd_b, self.prior_sd))
        return total

    def nkl(self, params, eps):
        # per-sample log p(θ_s) − log q(θ_s), shape (S,)  (ref neural_net.py:110-115)
        w, b = self._theta(params, eps)
        sd_w = jax.nn.softplus(params["rho_w"])
        lp = jnp.sum(_normal_logpdf(w, 0.0, self.prior_sd), axis=(-2, -1))
        lq = jnp.sum(_normal_logpdf(w, params["mu_w"], sd_w), axis=(-2, -1))
        out = lp - lq
        if self.use_bias:
            sd_b = jax.nn.softplus(params["rho_b"])
            lpb = jnp.sum(_normal_logpdf(b, 0.0, self.prior_sd), axis=-1)
            lqb = jnp.sum(_normal_logpdf(b, params["mu_b"], sd_b), axis=-1)
            out = out + (lpb - lqb)
        return out

    @property
    def is_variational(self) -> bool:
        return True


@dataclasses.dataclass(frozen=True)
class VIConv2d(Layer):
    """Mean-field Gaussian variational 2-D convolution.

    TPU-native analog of the reference's ``VIConv2d`` (``psvi/models/
    neural_net.py:194-246``). The reference parallelizes MC samples with a
    ``groups=mc_samples`` grouped conv on reshaped inputs; here we simply
    ``vmap`` ``lax.conv_general_dilated`` over the S axis and let XLA batch
    the convolutions onto the MXU.

    ``count_kl`` defaults to False: the reference's ELBOs skip conv-layer KL
    terms (``psvi/inference/psvi_classes.py:479-483,506-510`` only match
    ``VILinear``/``VILinearMultivariateNormal``).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    init_sd: float = 0.01
    prior_sd: float = 1.0
    use_bias: bool = True
    count_kl: bool = False
    compute_dtype: str = "float32"  # see VILinear.compute_dtype

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        bound = 1.0 / math.sqrt(fan_in)
        rho = jnp.asarray(
            inverse_softplus(jnp.float32(self.init_sd)), dtype=jnp.float32
        )
        shape = (self.out_channels, self.in_channels, k, k)
        p = {
            "mu_w": _uniform(kw, shape, bound),
            "rho_w": jnp.full(shape, rho),
        }
        if self.use_bias:
            p["mu_b"] = _uniform(kb, (self.out_channels,), bound)
            p["rho_b"] = jnp.full((self.out_channels,), rho)
        return p

    def sample_eps(self, key, mc_samples: int) -> Eps:
        kw, kb = jax.random.split(key)
        k = self.kernel_size
        e = {
            "w": jax.random.normal(
                kw, (mc_samples, self.out_channels, self.in_channels, k, k)
            )
        }
        if self.use_bias:
            e["b"] = jax.random.normal(kb, (mc_samples, self.out_channels))
        return e

    def _theta(self, params, eps):
        w = params["mu_w"] + jax.nn.softplus(params["rho_w"]) * eps["w"]
        b = None
        if self.use_bias:
            b = params["mu_b"] + jax.nn.softplus(params["rho_b"]) * eps["b"]
        return w, b

    def apply(self, params, eps, x):
        # x: (S, N, C, H, W), or (N, C, H, W) unbatched (first VI layer).
        w, b = self._theta(params, eps)
        return self.apply_theta(w, b, x)

    def apply_theta(self, w, b, x):
        """Forward with explicit samples w (S,K,C,k,k), b (S,K)."""
        if x.ndim == 4 and self.in_channels * self.kernel_size**2 <= 256:
            return self._apply_patches(w, b, x)
        if x.ndim == 4:
            x = jnp.broadcast_to(x[None], (w.shape[0],) + x.shape)
        pad = [(self.padding, self.padding)] * 2
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            x, w = x.astype(cd), w.astype(cd)
            b = b.astype(cd) if b is not None else None

        def conv_one(xs, ws):
            return jax.lax.conv_general_dilated(
                xs,
                ws,
                window_strides=(self.stride, self.stride),
                padding=pad,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        y = jax.vmap(conv_one)(x, w)
        if b is not None:
            y = y + b[:, None, :, None, None]
        return y

    def _apply_patches(self, w, b, x):
        """im2col formulation for UNBATCHED input (N, C, H, W).

        Used when x carries no MC-sample axis (the network's first
        variational layer) and the patch matrix is small (C·k² ≤ 256).
        Two TPU wins over the vmapped conv:

        - forward and filter-gradient are plain einsums → MXU matmuls,
          replacing XLA's VPU sliding-window ``multiply_reduce`` fusion for
          the (K, C, k, k) filter gradient (measured 0.42 ms x 2 per inner
          iteration on v5e for LeNet conv1 — the dominant op of the bilevel
          unroll; the matmul form is ~4x faster);
        - inside the inner ``lax.scan`` the input (the coreset u) is
          loop-invariant, so XLA hoists the patch extraction out of the
          unrolled loop entirely. Measured: full LeNet nested step
          66.8 → 38.3 ms on-device (v5e, M=100, S=10, inner_it=20).
        """
        k, st, p = self.kernel_size, self.stride, self.padding
        N, C, H, W = x.shape
        S, K = w.shape[0], w.shape[1]
        OH = (H + 2 * p - k) // st + 1
        OW = (W + 2 * p - k) // st + 1
        xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p))) if p else x
        cols = [
            xp[:, :, i : i + st * OH : st, j : j + st * OW : st]
            for i in range(k)
            for j in range(k)
        ]
        P = jnp.stack(cols, axis=1)  # (N, k*k, C, OH, OW)
        wf = w.reshape(S, K, C, k * k)
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            P, wf = P.astype(cd), wf.astype(cd)
            b = b.astype(cd) if b is not None else None
        y = jnp.einsum("nqchw,socq->snohw", P, wf)
        if b is not None:
            y = y + b[:, None, :, None, None]
        return y

    def kl(self, params):
        sd_w = jax.nn.softplus(params["rho_w"])
        total = jnp.sum(_gaussian_kl(params["mu_w"], sd_w, self.prior_sd))
        if self.use_bias:
            sd_b = jax.nn.softplus(params["rho_b"])
            total += jnp.sum(_gaussian_kl(params["mu_b"], sd_b, self.prior_sd))
        return total

    def nkl(self, params, eps):
        w, b = self._theta(params, eps)
        sd_w = jax.nn.softplus(params["rho_w"])
        lp = jnp.sum(_normal_logpdf(w, 0.0, self.prior_sd), axis=(-4, -3, -2, -1))
        lq = jnp.sum(
            _normal_logpdf(w, params["mu_w"], sd_w), axis=(-4, -3, -2, -1)
        )
        out = lp - lq
        if self.use_bias:
            sd_b = jax.nn.softplus(params["rho_b"])
            out = out + jnp.sum(
                _normal_logpdf(b, 0.0, self.prior_sd)
                - _normal_logpdf(b, params["mu_b"], sd_b),
                axis=-1,
            )
        return out

    @property
    def is_variational(self) -> bool:
        return True


@dataclasses.dataclass(frozen=True)
class VILinearFullCov(Layer):
    """Full-covariance Gaussian variational dense layer.

    Functional analog of the reference's ``VILinearMultivariateNormal``
    (``psvi/models/neural_net.py:408-491``): all layer parameters (weights and
    bias, flattened) share a single multivariate normal with learnable
    ``scale_tril`` = softplus(diag) + free strictly-lower triangle.

    The reference builds the strictly-lower indices from an (n−1)×(n−1)
    ``tril_indices`` (``neural_net.py:427,458-459``), leaving the last row of
    the Cholesky factor without free off-diagonal entries. We implement the
    mathematically intended *full* strictly-lower triangle (n(n−1)/2 free
    entries) — same covariance family, strictly more expressive; documented
    deviation per SURVEY.md §7 "hard parts".
    """

    in_dim: int
    out_dim: int
    init_sd: float = 0.01
    prior_sd: float = 1.0
    use_bias: bool = True
    count_kl: bool = True
    compute_dtype: str = "float32"  # see VILinear.compute_dtype

    @property
    def num_params(self) -> int:
        n = self.out_dim * self.in_dim
        if self.use_bias:
            n += self.out_dim
        return n

    def init(self, key) -> Params:
        n = self.num_params
        rho = jnp.asarray(
            inverse_softplus(jnp.float32(self.init_sd)), dtype=jnp.float32
        )
        # Reference zero-initializes the packed mean (neural_net.py:425).
        return {
            "mean": jnp.zeros((n,), jnp.float32),
            "rho": jnp.full((n,), rho),
            "corr": jnp.zeros((n * (n - 1) // 2,), jnp.float32),
        }

    def sample_eps(self, key, mc_samples: int) -> Eps:
        return {"e": jax.random.normal(key, (mc_samples, self.num_params))}

    def _scale_tril(self, params):
        n = self.num_params
        L = jnp.zeros((n, n), jnp.float32)
        L = L.at[jnp.diag_indices(n)].set(jax.nn.softplus(params["rho"]))
        i, j = jnp.tril_indices(n, k=-1)
        return L.at[i, j].set(params["corr"])

    def _theta_flat(self, params, eps):
        L = self._scale_tril(params)
        # (S, n) samples: θ = μ + L ε
        return params["mean"] + eps["e"] @ L.T, L

    def _unpack(self, theta_flat):
        nw = self.out_dim * self.in_dim
        w = theta_flat[..., :nw].reshape(
            *theta_flat.shape[:-1], self.out_dim, self.in_dim
        )
        b = theta_flat[..., nw:] if self.use_bias else None
        return w, b

    def apply(self, params, eps, x):
        theta, _ = self._theta_flat(params, eps)
        w, b = self._unpack(theta)
        eq = "ni,soi->sno" if x.ndim == 2 else "sni,soi->sno"
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            x, w = x.astype(cd), w.astype(cd)
            b = b.astype(cd) if b is not None else None
        y = jnp.einsum(eq, x, w)
        if b is not None:
            y = y + b[:, None, :]
        return y

    def kl(self, params):
        # KL( N(μ, LLᵀ) || N(0, σ_p² I) ), analytic (ref neural_net.py:435-436).
        n = self.num_params
        L = self._scale_tril(params)
        diag = jnp.diagonal(L)
        logdet_q = 2.0 * jnp.sum(jnp.log(diag))
        tr = jnp.sum(jnp.square(L)) / self.prior_sd**2
        quad = jnp.sum(jnp.square(params["mean"])) / self.prior_sd**2
        logdet_p = 2.0 * n * jnp.log(jnp.float32(self.prior_sd))
        return 0.5 * (logdet_p - logdet_q - n + tr + quad)

    def nkl(self, params, eps):
        theta, L = self._theta_flat(params, eps)
        n = self.num_params
        # log q(θ): θ−μ = Lε ⇒ quadratic form is ‖ε‖².
        diag = jnp.diagonal(L)
        lq = (
            -0.5 * jnp.sum(jnp.square(eps["e"]), axis=-1)
            - jnp.sum(jnp.log(diag))
            - n * _HALF_LOG_2PI
        )
        lp = jnp.sum(_normal_logpdf(theta, 0.0, self.prior_sd), axis=-1)
        return lp - lq

    @property
    def is_variational(self) -> bool:
        return True


@dataclasses.dataclass(frozen=True)
class ReLU(Layer):
    def apply(self, params, eps, x):
        return jax.nn.relu(x)


@dataclasses.dataclass(frozen=True)
class Identity(Layer):
    """Pass-through placeholder. Used by :func:`fuse_conv_pool` in place of
    a MaxPool2d that was folded into the preceding conv, so the params/eps
    pytree structure (and hence checkpoints) match the unfused net."""

    def apply(self, params, eps, x):
        return x


@dataclasses.dataclass(frozen=True)
class VIConvPool2d(VIConv2d):
    """Conv + non-overlapping ``pool_k``×``pool_k`` max-pool, fused.

    The flagship bilevel profile (BENCHMARKS.md "step anatomy") shows the
    LeNet nested step dominated not by conv FLOPs but by the POOL's
    reshape/broadcast chain over the full-resolution pre-pool activations
    — bf16 (S, N, C, 28, 28) tensors rebuilt/re-read every inner
    iteration of the unroll, forward and double-backward (~5 ms of the
    29 ms step).

    Here the pooled output is computed DIRECTLY: the conv's output
    positions are split into the pool_k² pool-window parities, each
    parity computed as its own im2col einsum (patches taken at stride
    pool_k — same total FLOPs as the full conv), and the pool is an
    elementwise max over the parity tensors. Consequences:

    - the (S, N, C, OH, OW) pre-pool tensor NEVER materializes; every
      tensor the unroll stores/re-reads is pool_k²× smaller;
    - pool backward is a compare/select over parity tensors — no
      reshape/broadcast relayouts;
    - the conv filter gradient is an MXU matmul against the patch
      stacks, and for the coreset input u (loop-invariant in the inner
      scan) the patch stacks are HOISTED out of the unrolled loop, so
      the whole conv1 backward w.r.t. u reduces to cotangent
      accumulation inside the loop + one scatter outside it;
    - the bias is added after the max (max(a+β, b+β) = max(a, b)+β —
      exact, rounding is monotone; same argument as the pool↔relu swap).

    Numerics: per-output-position arithmetic is the im2col einsum of
    ``VIConv2d._apply_patches`` restricted to a parity subset —
    reduction order inside each output position is unchanged, so
    results match the patch path to reassociation noise (tested).

    Falls back to the unfused parent conv + crop-and-reshape pool (floor
    semantics, matching reduce_window / torch MaxPool2d) when the conv
    output doesn't tile by pool_k (never on LeNet shapes).
    """

    pool_k: int = 2

    def supports_parity(self, x_shape) -> bool:
        """True when ``x_shape`` (N, C, H, W) takes the parity path."""
        if len(x_shape) != 4:
            return False
        k, st, p, pk = self.kernel_size, self.stride, self.padding, self.pool_k
        H, W = x_shape[-2], x_shape[-1]
        OH = (H + 2 * p - k) // st + 1
        OW = (W + 2 * p - k) // st + 1
        return (
            OH % pk == 0
            and OW % pk == 0
            and self.in_channels * k * k <= 256
        )

    def extract_patches(self, x):
        """Stride-1 im2col patches reshaped for the parity einsums:
        (N, q, C, PH, pk, PW, pk), cast to compute_dtype.

        Exposed so the ENGINE can run it OUTSIDE the differentiated inner
        scan (wrapped as :class:`PrePatched`): the patches of the coreset
        u are loop-invariant, but their cotangent is not — extracted
        in-loop, every inner iteration of the bilevel backward pays a
        patch-sized zero-materialize + dynamic-update-slice per pool
        parity (measured 3.9 ms/step of dynamic_update_slice alone on
        the flagship LeNet step). Pre-extracted, the in-loop cotangent
        is one elementwise accumulation and the patch transpose runs
        once per outer step."""
        k, st, p, pk = self.kernel_size, self.stride, self.padding, self.pool_k
        N, C, H, W = x.shape
        OH = (H + 2 * p - k) // st + 1
        OW = (W + 2 * p - k) // st + 1
        xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p))) if p else x
        cols = [
            xp[:, :, i : i + st * OH : st, j : j + st * OW : st]
            for i in range(k)
            for j in range(k)
        ]
        P = jnp.stack(cols, axis=1)  # (N, q, C, OH, OW)
        Pr = P.reshape(N, k * k, C, OH // pk, pk, OW // pk, pk)
        cd = jnp.dtype(self.compute_dtype)
        return Pr.astype(cd) if cd != jnp.float32 else Pr

    def apply_theta(self, w, b, x):
        if isinstance(x, PrePatched):
            return self._parity_matmuls(w, b, x.pr)
        k, st, p, pk = self.kernel_size, self.stride, self.padding, self.pool_k
        H, W = x.shape[-2], x.shape[-1]
        OH = (H + 2 * p - k) // st + 1
        OW = (W + 2 * p - k) // st + 1
        if (
            x.ndim != 4
            or OH % pk
            or OW % pk
            or self.in_channels * k * k > 256
        ):
            # Batched (loop-variant) inputs keep the parent formulation +
            # reshape-pool: per-iteration im2col of a loop-variant tensor
            # is a measured dead end (docs/ROADMAP.md; re-measured for the
            # parity form in round 4: conv2-fused 79 ms vs 31 ms/step).
            y = super().apply_theta(w, b, x)
            *lead, HH, WW = y.shape
            # floor semantics: crop trailing rows/cols that don't tile by
            # pool_k, matching reduce_window / torch MaxPool2d defaults
            # (a 27x27 conv output pools to 13x13, not a reshape error)
            y = y[..., : (HH // pk) * pk, : (WW // pk) * pk]
            y = y.reshape(*lead, HH // pk, pk, WW // pk, pk)
            return jnp.max(y, axis=(-3, -1))
        return self._parity_conv(w, b, x)

    def _parity_conv(self, w, b, x):
        """Unbatched (N, C, H, W) input — the coreset u in the bilevel
        unroll. ONE stride-1 patch extraction (hoisted: loop-invariant),
        parity views via reshape + static index (their VJP is a cheap
        pad, NOT the interior-pad swarm a strided slice transposes to —
        measured 58 ms/step with strided-slice parities vs 30 ms with
        this form), one einsum per parity, elementwise max, bias last."""
        return self._parity_matmuls(w, b, self.extract_patches(x))

    def _parity_matmuls(self, w, b, Pr):
        """Parity einsums + max + bias on pre-extracted patches
        (N, q, C, PH, pk, PW, pk)."""
        S, K, C = w.shape[0], w.shape[1], self.in_channels
        k = self.kernel_size
        wf = w.reshape(S, K, C, k * k)
        cd = jnp.dtype(self.compute_dtype)
        if cd != jnp.float32:
            wf = wf.astype(cd)
            b = b.astype(cd) if b is not None else None
        pk = self.pool_k
        y = None
        for a_ in range(pk):
            for b_ in range(pk):
                ya = jnp.einsum(
                    "nqchw,skcq->snkhw", Pr[:, :, :, :, a_, :, b_], wf
                )
                y = ya if y is None else jnp.maximum(y, ya)
        if b is not None:
            y = y + b[:, None, :, None, None]
        return y


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PrePatched:
    """Pre-extracted first-layer conv patches, standing in for the raw
    (N, C, H, W) input of a :class:`VIConvPool2d`-headed net.

    Produced by :meth:`Sequential.prep_input` OUTSIDE the bilevel inner
    scan so the scan's cotangent w.r.t. the (loop-invariant) input is a
    single elementwise accumulation — see
    :meth:`VIConvPool2d.extract_patches`."""

    pr: Any  # (N, q, C, PH, pk, PW, pk)
    x_shape: tuple  # static original input shape (N, C, H, W)

    def tree_flatten(self):
        return (self.pr,), self.x_shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def ndim(self):
        return len(self.x_shape)

    @property
    def shape(self):
        return self.x_shape


def fuse_conv_pool(net: "Sequential") -> "Sequential":
    """Fold every top-level ``(VIConv2d, MaxPool2d(k == s, p == 0))`` pair
    into a :class:`VIConvPool2d` + :class:`Identity` pair (the pooled-conv
    parity formulation). Params/eps pytree structure is preserved — both
    MaxPool2d and Identity hold empty params — so checkpoints and states
    transfer between fused and unfused nets."""
    layers = list(net.layers)
    out = []
    i = 0
    while i < len(layers):
        l = layers[i]
        nxt = layers[i + 1] if i + 1 < len(layers) else None
        if (
            type(l) is VIConv2d
            and isinstance(nxt, MaxPool2d)
            and nxt.kernel_size == nxt.stride
            and nxt.padding == 0
            and nxt.backend == "reshape"
        ):
            fused = VIConvPool2d(
                **{f.name: getattr(l, f.name) for f in dataclasses.fields(l)},
                pool_k=nxt.kernel_size,
            )
            out += [fused, Identity()]
            i += 2
        else:
            out.append(l)
            i += 1
    return dataclasses.replace(net, layers=tuple(out))


@dataclasses.dataclass(frozen=True)
class Flatten(Layer):
    """Flatten trailing (C, H, W) → features (ref ``nn.Flatten(-3, -1)``)."""

    def apply(self, params, eps, x):
        return x.reshape(*x.shape[:-3], -1)


def _argmax_pool(x, k):
    """Non-overlapping k×k max-pool whose LINEARIZATION RESIDUAL is the
    int8 window-argmax instead of the pre-pool activations.

    In the bilevel unroll the default reshape+max pool makes XLA stack the
    full pre-pool conv activations across all inner iterations (bf16
    (inner_it, S, M, C, H, W) — ~190 MB on the flagship LeNet step) so the
    backward can rebuild the max mask by comparison. Here the custom-jvp
    tangent path consumes only the argmax index through a jax.checkpoint,
    so partial evaluation saves (idx int8, y) — 8× less residual traffic —
    and the backward rebuilds the one-hot mask from idx. Gradient routing
    on ties follows the recorded argmax, exactly like torch's MaxPool2d
    (the reference's semantics); the compare-mask formulation instead
    splits gradient across tied positions. Supports arbitrary-order AD
    (grad-of-grad tested equal to the reference formulation)."""

    @jax.custom_jvp
    def pool(x):
        *lead, H, W = x.shape
        y = x.reshape(*lead, H // k, k, W // k, k)
        return jnp.max(y, axis=(-3, -1))

    # int8 residuals hold window indices up to 127; larger kernels fall
    # back to int32 (still 2-4x smaller than the pre-pool activations)
    idx_dtype = jnp.int8 if k * k <= 127 else jnp.int32

    @pool.defjvp
    def _pool_jvp(primals, tangents):
        (xp,), (dx,) = primals, tangents
        *lead, H, W = xp.shape
        xw = jnp.moveaxis(
            xp.reshape(*lead, H // k, k, W // k, k), -3, -2
        ).reshape(*lead, H // k, W // k, k * k)
        idx = jnp.argmax(xw, axis=-1).astype(idx_dtype)
        y = jnp.max(xw, axis=-1)

        @jax.checkpoint
        def tangent_map(idx, dx):
            dw = jnp.moveaxis(
                dx.reshape(*lead, H // k, k, W // k, k), -3, -2
            ).reshape(*lead, H // k, W // k, k * k)
            mask = jnp.arange(k * k, dtype=idx_dtype) == idx[..., None]
            return jnp.sum(jnp.where(mask, dw, 0), axis=-1)

        return y, tangent_map(idx, dx)

    return pool(x)


@dataclasses.dataclass(frozen=True)
class MaxPool2d(Layer):
    """Max-pool over (H, W); S and N axes pass through
    (ref ``BatchMaxPool2d``, ``psvi/models/neural_net.py:249-255``).

    ``backend='argmax'`` switches the non-overlapping fast path to
    :func:`_argmax_pool` (int8-argmax residuals — see its docstring)."""

    kernel_size: int
    stride: int
    padding: int = 0
    backend: str = "reshape"

    def apply(self, params, eps, x):
        if self.backend not in ("reshape", "argmax"):
            raise ValueError(f"unknown pool backend {self.backend!r}")
        k, s, p = self.kernel_size, self.stride, self.padding
        if (
            k == s and p == 0
            and x.shape[-1] % k == 0 and x.shape[-2] % k == 0
        ):
            if self.backend == "argmax":
                return _argmax_pool(x, k)
            # Non-overlapping pooling as a reshape+max. reduce_window lowers
            # to select-and-scatter whose transpose (and double transpose in
            # the bilevel unroll) is pathologically slow on TPU — this
            # formulation halves the measured LeNet nested-step time
            # (148.9 → 72.6 ms on v5e).
            *lead, H, W = x.shape
            y = x.reshape(*lead, H // k, k, W // k, k)
            return jnp.max(y, axis=(-3, -1))
        ndim = x.ndim
        window = (1,) * (ndim - 2) + (k, k)
        strides = (1,) * (ndim - 2) + (s, s)
        pads = [(0, 0)] * (ndim - 2) + [(p, p), (p, p)]
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strides, pads
        )


@dataclasses.dataclass(frozen=True)
class AvgPool2d(Layer):
    kernel_size: int
    stride: Optional[int] = None

    def apply(self, params, eps, x):
        k = self.kernel_size
        s = self.stride if self.stride is not None else k
        ndim = x.ndim
        window = (1,) * (ndim - 2) + (k, k)
        strides = (1,) * (ndim - 2) + (s, s)
        pads = [(0, 0)] * ndim
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, window, strides, pads
        )
        return summed / float(k * k)


@dataclasses.dataclass(frozen=True)
class BatchNorm2d(Layer):
    """Batch normalization over (S·N, H, W) per channel.

    Matches the reference's effective behavior: ``BayesBatchNorm2d``
    (``neural_net.py:257-263``) flattens (S, N) and normalizes with
    *current-batch* statistics — the reference never calls ``model.eval()``
    during PSVI training or evaluation, so train-mode stats are always used.
    Running statistics are therefore not tracked.
    """

    num_features: int
    eps: float = 1e-5

    def init(self, key) -> Params:
        return {
            "gamma": jnp.ones((self.num_features,), jnp.float32),
            "beta": jnp.zeros((self.num_features,), jnp.float32),
        }

    def apply(self, params, eps, x):
        # x: (S, N, C, H, W) or (N, C, H, W) — stats over all but channel.
        c_axis = x.ndim - 3
        axes = tuple(i for i in range(x.ndim) if i != c_axis)
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xhat = (x - mean) * jax.lax.rsqrt(var + self.eps)
        shape = (1,) * c_axis + (-1, 1, 1)
        g = params["gamma"].reshape(shape)
        b = params["beta"].reshape(shape)
        return xhat * g + b


@dataclasses.dataclass(frozen=True)
class LocalResponseNorm(Layer):
    """Cross-channel local response normalization (AlexNet; ref
    ``nn.LocalResponseNorm(4, alpha=0.001/9, beta=0.75, k=1)``,
    ``psvi/models/neural_net.py:384-388``)."""

    size: int
    alpha: float = 1e-4
    beta: float = 0.75
    k: float = 1.0

    def apply(self, params, eps, x):
        # x: (S, N, C, H, W) or (N, C, H, W); sum x² over a channel window.
        n = self.size
        sq = jnp.square(x)
        lo, hi = (n - 1) // 2, n - 1 - (n - 1) // 2
        ndim = x.ndim
        c_axis = ndim - 3
        window = tuple(n if i == c_axis else 1 for i in range(ndim))
        strides = (1,) * ndim
        pads = [(lo, hi) if i == c_axis else (0, 0) for i in range(ndim)]
        ssum = jax.lax.reduce_window(sq, 0.0, jax.lax.add, window, strides, pads)
        denom = jnp.power(self.k + (self.alpha / n) * ssum, self.beta)
        return x / denom


@dataclasses.dataclass(frozen=True)
class Sequential:
    """A pure-functional network: an ordered tuple of layers.

    The functional analog of the reference's ``nn.Sequential`` of variational
    modules. All methods are jit-traceable with `self` closed over statically.
    """

    layers: Tuple[Layer, ...]

    def init(self, key) -> Params:
        keys = jax.random.split(key, max(len(self.layers), 1))
        return tuple(l.init(k) for l, k in zip(self.layers, keys))

    def sample_eps(self, key, mc_samples: int) -> Eps:
        keys = jax.random.split(key, max(len(self.layers), 1))
        return tuple(
            l.sample_eps(k, mc_samples) for l, k in zip(self.layers, keys)
        )

    def apply(self, params: Params, eps: Eps, x, mc_samples: Optional[int] = None):
        """Forward all S samples. x: (N, ...) or (S, N, ...).

        Unbatched inputs are passed through WITHOUT materializing the
        (S, N, ...) broadcast: the first variational layer introduces the S
        axis via its sampled weights (its einsum/patch formulations accept
        unbatched x). This keeps loop-invariant inputs (the coreset u in the
        bilevel unroll) hoistable by XLA and removes S× input copies.
        """
        if mc_samples is None:
            mc_samples = _infer_mc_samples(eps)
        in_ndim = x.ndim
        for layer, p, e in zip(self.layers, params, eps):
            x = layer.apply(p, e, x)
        if x.dtype != jnp.float32:
            # mixed-precision boundary: all objective math (NLL, logsumexp,
            # IW softmax, KL) runs in f32 on the restored output
            x = x.astype(jnp.float32)
        if x.ndim == in_ndim and not any(
            l.is_variational for l in self.layers
        ):
            # no variational layer added the S axis (degenerate nets)
            x = jnp.broadcast_to(x[None], (mc_samples,) + x.shape)
        return x

    def kl(self, params: Params):
        """Analytic KL summed over KL-counted variational layers
        (ref ``psvi_classes.py:506-510``)."""
        total = jnp.float32(0.0)
        for layer, p in zip(self.layers, params):
            if layer.is_variational and layer.count_kl:
                total = total + layer.kl(p)
        return total

    def nkl(self, params: Params, eps: Eps):
        """Per-sample log p(θ)−log q(θ) summed over KL-counted layers,
        shape (S,) (ref ``psvi_classes.py:479-483``)."""
        total = None
        for layer, p, e in zip(self.layers, params, eps):
            if layer.is_variational and layer.count_kl:
                term = layer.nkl(p, e)
                total = term if total is None else total + term
        if total is None:
            S = _infer_mc_samples(eps)
            total = jnp.zeros((S,), jnp.float32)
        return total

    @property
    def variational_layers(self) -> Tuple[int, ...]:
        return tuple(
            i for i, l in enumerate(self.layers) if l.is_variational
        )

    def prep_input(self, x):
        """Pre-extract first-layer conv patches for repeated forwards on
        the SAME input (the bilevel inner loop on the coreset u).

        Returns a :class:`PrePatched` when the net starts with a
        :class:`VIConvPool2d` on an eligible unbatched input, else ``x``
        unchanged. Callers pass the result anywhere they would pass
        ``x``; numerics are identical (the same extraction runs inside
        ``apply`` otherwise)."""
        if (
            self.layers
            and isinstance(self.layers[0], VIConvPool2d)
            and not isinstance(x, PrePatched)
            and x.ndim == 4
            and self.layers[0].supports_parity(x.shape)
        ):
            return PrePatched(self.layers[0].extract_patches(x), tuple(x.shape))
        return x


def with_compute_dtype(net, dtype: str):
    """Return a copy of ``net`` with every variational layer's matmul/conv
    ``compute_dtype`` replaced (``'bfloat16'`` for mixed precision).

    Only the matmul *inputs* are cast — accumulation, parameters, KL/NKL
    log-densities, pooling and the IW softmax all stay float32, so gradients
    through the bilevel unroll remain finite (bf16 shares f32's exponent
    range; no loss scaling needed).
    """
    return _rewrite_layers(
        net,
        lambda l: dataclasses.replace(l, compute_dtype=dtype)
        if hasattr(l, "compute_dtype") else l,
    )


def with_dense_backend(net, backend: str):
    """Return a copy of ``net`` with every mean-field VILinear's compute
    ``backend`` replaced (``'pallas'`` = the fused sample+matmul+NKL TPU
    kernel, ``ops/pallas_vi.py``). First-order paths only — the nested
    trainer's double-backward and the hyper trainer's forward-mode AID
    products keep the XLA formulation (custom_vjp supports one order of
    reverse-mode differentiation and no jvp)."""
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown dense backend {backend!r}")
    return _rewrite_layers(
        net,
        lambda l: dataclasses.replace(l, backend=backend)
        if isinstance(l, VILinear) else l,
    )


def with_pool_backend(net, backend: str):
    """Return a copy of ``net`` with every MaxPool2d's ``backend`` replaced
    (``'argmax'`` = int8-argmax residuals, see :func:`_argmax_pool`)."""
    if backend not in ("reshape", "argmax"):
        raise ValueError(f"unknown pool backend {backend!r}")
    return _rewrite_layers(
        net,
        lambda l: dataclasses.replace(l, backend=backend)
        if isinstance(l, MaxPool2d) else l,
    )


def _rewrite_layers(net, fn):
    """Map ``fn`` over every leaf layer of a Sequential, recursing through
    container layers (Residual body/shortcut)."""
    def rewrite(layer):
        if isinstance(layer, Residual):
            return dataclasses.replace(
                layer,
                body=_rewrite_layers(layer.body, fn),
                shortcut=_rewrite_layers(layer.shortcut, fn),
            )
        return fn(layer)

    return dataclasses.replace(
        net, layers=tuple(rewrite(l) for l in net.layers)
    )


def _infer_mc_samples(eps) -> int:
    leaves = jax.tree_util.tree_leaves(eps)
    if not leaves:
        raise ValueError("cannot infer mc_samples from empty eps pytree")
    return leaves[0].shape[0]


@dataclasses.dataclass(frozen=True)
class Residual(Layer):
    """Residual block wrapper: y = relu(body(x) + shortcut(x)).

    Used by the ResNet family (ref ``psvi/models/neural_net.py:532-584``).
    body/shortcut are Sequentials; params/eps are dicts with those keys.
    """

    body: "Sequential"
    shortcut: "Sequential"

    def init(self, key) -> Params:
        kb, ks = jax.random.split(key)
        return {"body": self.body.init(kb), "shortcut": self.shortcut.init(ks)}

    def sample_eps(self, key, mc_samples: int) -> Eps:
        kb, ks = jax.random.split(key)
        return {
            "body": self.body.sample_eps(kb, mc_samples),
            "shortcut": self.shortcut.sample_eps(ks, mc_samples),
        }

    def _sub_apply(self, net, params, eps, x):
        # x already has the S axis; apply layers directly without broadcasting.
        for layer, p, e in zip(net.layers, params, eps):
            x = layer.apply(p, e, x)
        return x

    def apply(self, params, eps, x):
        out = self._sub_apply(self.body, params["body"], eps["body"], x)
        sc = self._sub_apply(self.shortcut, params["shortcut"], eps["shortcut"], x)
        return jax.nn.relu(out + sc)

    def kl(self, params):
        return self.body.kl(params["body"]) + self.shortcut.kl(params["shortcut"])

    def nkl(self, params, eps):
        return self.body.nkl(params["body"], eps["body"]) + self.shortcut.nkl(
            params["shortcut"], eps["shortcut"]
        )

    @property
    def is_variational(self) -> bool:
        # Delegates counting to sub-layers' count_kl flags via kl()/nkl().
        return any(
            l.is_variational and l.count_kl
            for l in self.body.layers + self.shortcut.layers
        )

    @property
    def count_kl(self) -> bool:
        return self.is_variational

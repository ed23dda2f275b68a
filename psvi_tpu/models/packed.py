"""Packed flat-parameter representation of mean-field variational nets.

Motivation (measured on TPU v5e-1, flagship LeNet bilevel step): the inner
loop is **op-count-bound** — ~567 distinct HLO ops per inner iteration
averaging ~2.4 µs each (per-op launch overhead), not FLOP-bound. The
per-layer pytree representation pays that overhead once per tensor per
concept: 10 parameter leaves × (sampling + KL chain + NKL chain + 3 Adam
update fusions + 10 RNG draws + backward accumulations).

**Measured outcome (v5e-1, flagship step, bf16): a dead end at this model
size — kept opt-in (``PSVI(packed=True)``) for experimentation.** The packed
step runs 320 distinct ops/inner-iter vs 567 unpacked, but is ~6% slower
(35.1 vs 31.9 ms/step): flat (S, P) slices must be re-tiled into each
matmul operand's (8,128)-tiled layout every iteration (forward and
backward), while the per-layer representation stores each parameter in its
natural tiled layout and pays no relayout at all. Elementwise savings
(2-leaf Adam, one RNG draw, one KL/NKL chain) do not cover that cost.

``PackedMeanField`` stores ALL mean-field parameters as two flat vectors
``{'mu': (P,), 'rho': (P,)}`` and draws ONE ``(S, P)`` noise matrix, so

- reparameterized sampling ``θ = μ + softplus(ρ)·ε`` is ONE fusion,
- the analytic KL and the per-sample NKL are ONE masked chain each
  (the reference's dense-only KL counting — ``psvi/inference/
  psvi_classes.py:479-483,506-510`` — becomes a constant (P,) 0/1 mask),
- the inner differentiable Adam runs on a 2-leaf pytree,
- per-layer weights are cheap static slices + reshapes of θ.

Numerics: identical formulas elementwise; summation order inside KL/NKL
reductions differs (single sum over P vs per-layer partial sums), and the
single (S, P) noise draw is a different PRNG stream than per-layer draws —
so trajectories are statistically identical but not bitwise. ``init`` calls
the wrapped layers' own ``init`` with the same key-splitting as
``Sequential.init`` and then ravels, so *initial parameter values are
bitwise identical* to the unpacked net.

Supported stacks: every parameterized layer is a mean-field ``VILinear`` /
``VIConv2d`` (logreg, fn, LeNet, AlexNet). Full-covariance layers,
BatchNorm and Residual blocks fall back to the unpacked representation
(``pack_net`` returns None).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from psvi_tpu.models.layers import (
    Layer,
    Sequential,
    VIConv2d,
    VILinear,
    _normal_logpdf,
    _gaussian_kl,
    _infer_mc_samples,
)


@dataclasses.dataclass(frozen=True)
class _Segment:
    layer_idx: int
    key: str  # 'w' | 'b'
    offset: int
    size: int
    shape: Tuple[int, ...]
    prior_sd: float
    count_kl: bool


def _mean_field_segments(net: Sequential) -> Optional[Tuple[_Segment, ...]]:
    """Build the flat layout, or None if the stack is not packable."""
    segs = []
    offset = 0
    for i, layer in enumerate(net.layers):
        if isinstance(layer, (VILinear, VIConv2d)):
            if isinstance(layer, VILinear):
                shapes = [("w", (layer.out_dim, layer.in_dim))]
                if layer.use_bias:
                    shapes.append(("b", (layer.out_dim,)))
            else:
                k = layer.kernel_size
                shapes = [
                    ("w", (layer.out_channels, layer.in_channels, k, k))
                ]
                if layer.use_bias:
                    shapes.append(("b", (layer.out_channels,)))
            for key, shp in shapes:
                size = 1
                for d in shp:
                    size *= d
                segs.append(_Segment(
                    i, key, offset, size, shp, layer.prior_sd, layer.count_kl
                ))
                offset += size
        elif layer.is_variational:
            return None  # full-covariance etc. — not packable
        else:
            # stateless layers only; parameterized non-VI layers (BatchNorm)
            # are not packable
            probe = layer.init(jax.random.PRNGKey(0))
            if probe:
                return None
    return tuple(segs) if segs else None


@dataclasses.dataclass(frozen=True)
class PackedMeanField:
    """Drop-in replacement for ``Sequential`` over flat parameters.

    params pytree: ``{'mu': (P,), 'rho': (P,)}``; eps: ``(S, P)``.
    """

    base: Sequential
    segments: Tuple[_Segment, ...]

    @cached_property
    def num_params(self) -> int:
        last = self.segments[-1]
        return last.offset + last.size

    # NOTE: these cache NUMPY arrays, not jnp arrays — a jnp constant built
    # lazily inside a jit trace is a tracer and must not be cached across
    # traces. numpy closures embed as constants in every trace safely.
    @cached_property
    def _kl_mask(self):
        import numpy as np

        m = np.zeros((self.num_params,), np.float32)
        for s in self.segments:
            if s.count_kl:
                m[s.offset:s.offset + s.size] = 1.0
        return m

    @cached_property
    def _prior_sd(self):
        import numpy as np

        p = np.ones((self.num_params,), np.float32)
        for s in self.segments:
            p[s.offset:s.offset + s.size] = s.prior_sd
        return p

    @cached_property
    def layers(self):
        return self.base.layers

    def prep_input(self, x):
        """Delegate to :meth:`Sequential.prep_input`; ``apply`` handles the
        resulting :class:`PrePatched` through ``apply_theta`` unchanged."""
        return self.base.prep_input(x)

    def init(self, key):
        """Bitwise-identical initial values to ``Sequential.init``."""
        tree = self.base.init(key)
        mu_parts, rho_parts = [], []
        for s in self.segments:
            p = tree[s.layer_idx]
            mu_parts.append(p["mu_" + s.key].ravel())
            rho_parts.append(p["rho_" + s.key].ravel())
        return {
            "mu": jnp.concatenate(mu_parts),
            "rho": jnp.concatenate(rho_parts),
        }

    def sample_eps(self, key, mc_samples: int):
        return jax.random.normal(key, (mc_samples, self.num_params))

    def _theta(self, params, eps):
        return params["mu"] + jax.nn.softplus(params["rho"]) * eps  # (S, P)

    def apply(self, params, eps, x, mc_samples: Optional[int] = None):
        theta = self._theta(params, eps)
        S = theta.shape[0]
        by_layer = {}
        for s in self.segments:
            w = theta[:, s.offset:s.offset + s.size].reshape((S,) + s.shape)
            by_layer.setdefault(s.layer_idx, {})[s.key] = w
        in_ndim = x.ndim
        for i, layer in enumerate(self.base.layers):
            if i in by_layer:
                x = layer.apply_theta(by_layer[i]["w"], by_layer[i].get("b"), x)
            else:
                x = layer.apply({}, {}, x)
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        if x.ndim == in_ndim and not any(
            l.is_variational for l in self.base.layers
        ):
            # mirror Sequential.apply (layers.py:704): broadcast only when
            # NO variational layer added the S axis. A packed net always
            # has variational segments, so S-batched (S, N, D) input —
            # whose output ndim equals the input ndim — is returned as-is
            # instead of being wrongly re-broadcast to (S, S, N, nc).
            x = jnp.broadcast_to(x[None], (S,) + x.shape)
        return x

    def kl(self, params):
        """Analytic KL over KL-counted segments — ONE fused chain."""
        sd = jax.nn.softplus(params["rho"])
        return jnp.sum(
            self._kl_mask * _gaussian_kl(params["mu"], sd, self._prior_sd)
        )

    def nkl(self, params, eps):
        """Per-sample log p(θ)−log q(θ) over KL-counted segments, (S,)."""
        sd = jax.nn.softplus(params["rho"])
        theta = params["mu"] + sd * eps
        lp = _normal_logpdf(theta, 0.0, self._prior_sd)
        lq = _normal_logpdf(theta, params["mu"], sd)
        return jnp.sum(self._kl_mask * (lp - lq), axis=-1)

    def unpack(self, params):
        """Per-layer parameter tuple (Sequential layout) from flat params —
        for non-hot paths that walk layers (embeddings extraction)."""
        out = [dict() for _ in self.base.layers]
        for s in self.segments:
            out[s.layer_idx]["mu_" + s.key] = (
                params["mu"][s.offset:s.offset + s.size].reshape(s.shape)
            )
            out[s.layer_idx]["rho_" + s.key] = (
                params["rho"][s.offset:s.offset + s.size].reshape(s.shape)
            )
        return tuple(out)

    def unpack_eps(self, eps):
        """Per-layer eps tuple from the flat (S, P) draw."""
        S = eps.shape[0]
        out = [dict() for _ in self.base.layers]
        for s in self.segments:
            out[s.layer_idx][s.key] = (
                eps[:, s.offset:s.offset + s.size].reshape((S,) + s.shape)
            )
        return tuple(out)

    def pack_eps(self, eps_tree):
        """Flat (S, P) eps from a per-layer Sequential eps pytree."""
        S = _infer_mc_samples(eps_tree)
        parts = []
        for s in self.segments:
            parts.append(eps_tree[s.layer_idx][s.key].reshape(S, -1))
        return jnp.concatenate(parts, axis=1)

    @property
    def variational_layers(self) -> Tuple[int, ...]:
        return self.base.variational_layers


def pack_net(net) -> Optional[PackedMeanField]:
    """Pack a Sequential of mean-field layers, or None if unsupported."""
    if not isinstance(net, Sequential):
        return None
    segs = _mean_field_segments(net)
    if segs is None:
        return None
    return PackedMeanField(net, segs)

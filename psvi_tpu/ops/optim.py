"""Pure, scan-differentiable optimizers.

Replaces BOTH vendored bilevel optimizer stacks of the reference:

- ``psvi/robust_higher/optim.py`` (DifferentiableOptimizer: in-graph Adam/SGD
  updates built with ``create_graph=True``) — in JAX, an optimizer written as
  a pure function is differentiable for free; unrolling happens via
  ``jax.lax.scan`` and the outer ``jax.grad`` flows straight through.
- ``psvi/hypergrad/diff_optimizers.py`` (GradientDescent/HeavyBall/Momentum/
  DifferentiableAdam with params-history protocol) — the AID/IFT fixed-point
  maps in ``ops/hypergrad.py`` reuse these same update rules.

Update rules match ``torch.optim.Adam`` exactly (bias-corrected first/second
moments; ``denom = √v/√(1−β₂ᵗ) + eps``) so training dynamics are comparable
to the reference runs.

API: ``opt = adam(lr)``; ``state = opt.init(params)``;
``params, state = opt.step(params, grads, state[, lr])`` — the optional
``lr`` override supports scheduled learning rates inside jitted loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _sqrt_safe(v):
    """sqrt with a finite derivative at exactly 0.

    The bilevel outer grad differentiates THROUGH the Adam update; at
    ``nu == 0`` (a parameter whose inner gradient is exactly zero — a dead
    ReLU/pool path, more common under bfloat16 rounding) ``d√nu/dnu = inf``
    and the chain rule produces ``0·inf = NaN`` hypergradients. Forward is
    bit-identical to ``jnp.sqrt`` (√0 = 0); the derivative at 0 is taken as
    0, the correct dead-path subgradient (the parameter does not move).
    """
    pos = v > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, v, 1.0)), 0.0)


class AdamState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    mu: Any  # first moments, like params
    nu: Any  # second moments, like params


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable
    step: Callable


def adam(
    lr: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> Optimizer:
    """torch.optim.Adam-equivalent, as a pure pytree-to-pytree step."""

    def init(params):
        # two independent zero trees: donation requires distinct buffers
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), mu, nu)

    def step(params, grads, state: AdamState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        count = state.count + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(b1, t)
        bc2 = 1.0 - jnp.power(b2, t)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: p - lr_t * (m / bc1) / (_sqrt_safe(v) / jnp.sqrt(bc2) + eps),
            params,
            mu,
            nu,
        )
        return new_params, AdamState(count, mu, nu)

    return Optimizer(init, step)


class SGDState(NamedTuple):
    count: jnp.ndarray
    momentum: Any


def sgd(lr: float, momentum: float = 0.0) -> Optimizer:
    """Plain (optionally heavy-ball) SGD, matching ``hypergrad.GradientDescent``
    / ``Momentum`` (ref ``psvi/hypergrad/diff_optimizers.py:51-104``)."""

    def init(params):
        if momentum == 0.0:
            return SGDState(jnp.zeros((), jnp.int32), None)
        return SGDState(
            jnp.zeros((), jnp.int32),
            jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def step(params, grads, state: SGDState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        if momentum == 0.0:
            new_params = jax.tree_util.tree_map(
                lambda p, g: p - lr_t * g, params, grads
            )
            return new_params, SGDState(state.count + 1, None)
        mom = jax.tree_util.tree_map(
            lambda m, g: momentum * m + g, state.momentum, grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, m: p - lr_t * m, params, mom
        )
        return new_params, SGDState(state.count + 1, mom)

    return Optimizer(init, step)


def heavy_ball(lr: float, momentum: float = 0.9) -> Optimizer:
    """Heavy-ball: p' = p − lr·g + momentum·(p − p_prev)
    (ref ``hypergrad/diff_optimizers.py:64-79,162-167``)."""

    def init(params):
        return SGDState(jnp.zeros((), jnp.int32),
                        jax.tree_util.tree_map(jnp.array, params))

    def step(params, grads, state: SGDState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        new_params = jax.tree_util.tree_map(
            lambda p, g, prev: p - lr_t * g + momentum * (p - prev),
            params, grads, state.momentum,
        )
        return new_params, SGDState(state.count + 1, params)

    return Optimizer(init, step)


def step_lr(lr0: float, step_size: int, gamma: float):
    """StepLR schedule (ref ``psvi_classes.py:864-866``): lr = lr0·γ^⌊t/step⌋."""

    def schedule(t):
        k = jnp.floor_divide(t, jnp.int32(step_size)).astype(jnp.float32)
        return jnp.float32(lr0) * jnp.power(jnp.float32(gamma), k)

    return schedule


def clip_nonnegative(x):
    """Project onto the nonnegative orthant — the v-clamp for unparameterised
    learnable weights (ref ``psvi_classes.py:585-591``)."""
    return jax.tree_util.tree_map(lambda a: jnp.maximum(a, 0.0), x)

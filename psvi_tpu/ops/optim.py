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


def adamw(
    lr: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> Optimizer:
    """torch.optim.AdamW: decoupled weight decay applied multiplicatively
    BEFORE the Adam update (ref ``robust_higher/optim.py`` AdamW class)."""
    base = adam(lr, b1, b2, eps)

    def step(params, grads, state: AdamState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        decayed = jax.tree_util.tree_map(
            lambda p: p * (1.0 - lr_t * weight_decay), params
        )
        return base.step(decayed, grads, state, lr_now)

    return Optimizer(base.init, step)


class RMSpropState(NamedTuple):
    count: jnp.ndarray
    sq_avg: Any
    momentum: Any  # None unless momentum > 0
    grad_avg: Any  # None unless centered


def rmsprop(
    lr: float, alpha: float = 0.99, eps: float = 1e-8,
    momentum: float = 0.0, centered: bool = False,
) -> Optimizer:
    """torch.optim.RMSprop (ref ``robust_higher/optim.py`` RMSprop class):
    ``sq ← α·sq + (1−α)g²``; centered subtracts the squared running mean;
    optional heavy-ball momentum buffer on the preconditioned step."""

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return RMSpropState(
            jnp.zeros((), jnp.int32), zeros(),
            zeros() if momentum > 0 else None,
            zeros() if centered else None,
        )

    def step(params, grads, state: RMSpropState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        sq = jax.tree_util.tree_map(
            lambda s, g: alpha * s + (1.0 - alpha) * jnp.square(g),
            state.sq_avg, grads,
        )
        if centered:
            gavg = jax.tree_util.tree_map(
                lambda a, g: alpha * a + (1.0 - alpha) * g,
                state.grad_avg, grads,
            )
            denom = jax.tree_util.tree_map(
                lambda s, a: _sqrt_safe(s - jnp.square(a)) + eps, sq, gavg
            )
        else:
            gavg = None
            denom = jax.tree_util.tree_map(lambda s: _sqrt_safe(s) + eps, sq)
        if momentum > 0:
            buf = jax.tree_util.tree_map(
                lambda b, g, d: momentum * b + g / d,
                state.momentum, grads, denom,
            )
            new_params = jax.tree_util.tree_map(
                lambda p, b: p - lr_t * b, params, buf
            )
        else:
            buf = None
            new_params = jax.tree_util.tree_map(
                lambda p, g, d: p - lr_t * g / d, params, grads, denom
            )
        return new_params, RMSpropState(state.count + 1, sq, buf, gavg)

    return Optimizer(init, step)


class AdagradState(NamedTuple):
    count: jnp.ndarray
    sum_sq: Any


def adagrad(
    lr: float, lr_decay: float = 0.0, eps: float = 1e-10,
    initial_accumulator_value: float = 0.0,
) -> Optimizer:
    """torch.optim.Adagrad (ref ``robust_higher/optim.py`` Adagrad class):
    ``clr = lr / (1 + (t−1)·lr_decay)``; ``p ← p − clr·g/(√Σg² + eps)``."""

    def init(params):
        return AdagradState(
            jnp.zeros((), jnp.int32),
            jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params
            ),
        )

    def step(params, grads, state: AdagradState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        count = state.count + 1
        clr = lr_t / (1.0 + (count.astype(jnp.float32) - 1.0) * lr_decay)
        sum_sq = jax.tree_util.tree_map(
            lambda s, g: s + jnp.square(g), state.sum_sq, grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g, s: p - clr * g / (_sqrt_safe(s) + eps),
            params, grads, sum_sq,
        )
        return new_params, AdagradState(count, sum_sq)

    return Optimizer(init, step)


class AdadeltaState(NamedTuple):
    count: jnp.ndarray
    sq_avg: Any
    acc_delta: Any


def adadelta(lr: float = 1.0, rho: float = 0.9, eps: float = 1e-6) -> Optimizer:
    """torch.optim.Adadelta (ref ``robust_higher/optim.py`` Adadelta class)."""

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdadeltaState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def step(params, grads, state: AdadeltaState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        sq = jax.tree_util.tree_map(
            lambda s, g: rho * s + (1.0 - rho) * jnp.square(g),
            state.sq_avg, grads,
        )
        delta = jax.tree_util.tree_map(
            lambda g, s, a: g * jnp.sqrt(a + eps) / jnp.sqrt(s + eps),
            grads, sq, state.acc_delta,
        )
        acc = jax.tree_util.tree_map(
            lambda a, d: rho * a + (1.0 - rho) * jnp.square(d),
            state.acc_delta, delta,
        )
        new_params = jax.tree_util.tree_map(
            lambda p, d: p - lr_t * d, params, delta
        )
        return new_params, AdadeltaState(state.count + 1, sq, acc)

    return Optimizer(init, step)


def adamax(
    lr: float = 2e-3, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> Optimizer:
    """torch.optim.Adamax (ref ``robust_higher/optim.py`` Adamax class):
    infinity-norm second moment ``u ← max(β₂·u, |g|)``."""

    def init(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), mu, nu)

    def step(params, grads, state: AdamState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        count = state.count + 1
        bc1 = 1.0 - jnp.power(b1, count.astype(jnp.float32))
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda u, g: jnp.maximum(b2 * u, jnp.abs(g) + eps), state.nu, grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, m, u: p - (lr_t / bc1) * m / u, params, mu, nu
        )
        return new_params, AdamState(count, mu, nu)

    return Optimizer(init, step)


class ASGDState(NamedTuple):
    count: jnp.ndarray
    eta: jnp.ndarray
    mu_t: jnp.ndarray
    ax: Any


def asgd(
    lr: float = 1e-2, lambd: float = 1e-4, alpha: float = 0.75,
    t0: float = 1e6, weight_decay: float = 0.0,
) -> Optimizer:
    """torch.optim.ASGD (ref ``robust_higher/optim.py`` ASGD class):
    decayed step ``η_t = lr/(1+λ·lr·t)^α`` with tail averaging into ``ax``."""

    def init(params):
        return ASGDState(
            jnp.zeros((), jnp.int32),
            jnp.asarray(lr, jnp.float32),
            jnp.ones((), jnp.float32),
            jax.tree_util.tree_map(jnp.array, params),
        )

    def step(params, grads, state: ASGDState, lr_now: Optional[jnp.ndarray] = None):
        lr_t = lr if lr_now is None else lr_now
        count = state.count + 1
        t = count.astype(jnp.float32)
        if weight_decay != 0.0:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params
            )
        # torch order: decay p by the CURRENT eta, then step, then update eta
        new_params = jax.tree_util.tree_map(
            lambda p, g: p * (1.0 - lambd * state.eta) - state.eta * g,
            params, grads,
        )
        ax = jax.tree_util.tree_map(
            lambda a, p: jnp.where(state.mu_t != 1.0,
                                   a + state.mu_t * (p - a), p),
            state.ax, new_params,
        )
        eta = lr_t / jnp.power(1.0 + lambd * lr_t * t, alpha)
        mu_t = 1.0 / jnp.maximum(1.0, t - t0)
        return new_params, ASGDState(count, eta, mu_t, ax)

    return Optimizer(init, step)


class RpropState(NamedTuple):
    count: jnp.ndarray
    prev_grad: Any
    step_size: Any


def rprop(
    lr: float = 1e-2, etas: tuple = (0.5, 1.2), step_sizes: tuple = (1e-6, 50.0)
) -> Optimizer:
    """torch.optim.Rprop (ref ``robust_higher/optim.py`` Rprop class):
    sign-agreement adaptive per-parameter steps, branchless via ``where`` so
    it stays scan-/jit-differentiable (zero gradient through the sign logic,
    matching torch where the update is piecewise constant in g)."""
    etaminus, etaplus = etas
    step_min, step_max = step_sizes

    def init(params):
        return RpropState(
            jnp.zeros((), jnp.int32),
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(lambda p: jnp.full_like(p, lr), params),
        )

    def step(params, grads, state: RpropState, lr_now: Optional[jnp.ndarray] = None):
        del lr_now  # per-param steps, no global lr
        sign = jax.tree_util.tree_map(
            lambda g, pg: jnp.sign(g * pg), grads, state.prev_grad
        )
        new_step = jax.tree_util.tree_map(
            lambda st, s: jnp.clip(
                st * jnp.where(s > 0, etaplus, jnp.where(s < 0, etaminus, 1.0)),
                step_min, step_max,
            ),
            state.step_size, sign,
        )
        # torch zeroes the gradient where the sign flipped (no step there)
        eff_grad = jax.tree_util.tree_map(
            lambda g, s: jnp.where(s < 0, 0.0, g), grads, sign
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g, st: p - jnp.sign(g) * st,
            params, eff_grad, new_step,
        )
        return new_params, RpropState(
            state.count + 1, eff_grad, new_step
        )

    return Optimizer(init, step)


#: name → factory, mirroring the reference's DifferentiableOptimizer zoo
#: (``psvi/robust_higher/optim.py:264-756`` registers SGD/Adam/AdamW/Adadelta/
#: Adagrad/Adamax/ASGD/RMSprop/Rprop via ``register_optim``). Select on the
#: engine with ``PSVI(inner_optimizer="rmsprop")``.
REGISTRY = {
    "adam": adam,
    "adamw": adamw,
    "sgd": sgd,
    "heavy_ball": heavy_ball,
    "rmsprop": rmsprop,
    "adagrad": adagrad,
    "adadelta": adadelta,
    "adamax": adamax,
    "asgd": asgd,
    "rprop": rprop,
}


def make(name: str, lr: float, **kwargs) -> Optimizer:
    """Look up an optimizer by reference name (case-insensitive)."""
    key = name.lower()
    if key not in REGISTRY:
        raise ValueError(
            f"unknown optimizer {name!r}; available: {sorted(REGISTRY)}"
        )
    return REGISTRY[key](lr, **kwargs)


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

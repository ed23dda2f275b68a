"""Implicit-differentiation hypergradient solvers over pytrees.

TPU-native replacement for the reference's vendored hypertorch stack
(``psvi/hypergrad/hypergradients.py``):

- ``cg_solve``            — conjugate gradient over pytrees
  (ref ``CG_torch.py:9-45``), fixed K iterations in a ``lax.scan``
  (the reference's tol-based early exit at 1e-10 virtually never fires).
- ``fixed_point``         — fixed-point AID (ref ``hypergradients.py:83-140``)
- ``cg_normaleq``         — CG on the normal equations (ref :199-244), the
  solver used by every ``hyper_step`` in the reference
  (``psvi_classes.py:610,667-675``).

The fixed-point map Φ(w, λ) is one optimizer step on the inner loss
(ref ``GradientDescent`` fp_map, ``diff_optimizers.py:51-61``):
``Φ(w, λ) = w − η ∇_w L_inner(w, λ; ε)``. Jacobian products come from
``jax.vjp`` (JᵀX) and ``jax.jvp`` (JX) instead of torch's double-grad trick
(ref ``hypergradients.py:308-311``).

Stochasticity: the reference re-evaluates the inner loss with FRESH parameter
samples for each linearization (each ``fp_map`` call resamples). We mirror
this by folding a PRNG key per product; pass ``n_eps_keys=1`` for a fully
deterministic solve on one noise draw.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

tmap = jax.tree_util.tree_map


def tree_dot(a, b):
    leaves = jax.tree_util.tree_leaves(tmap(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves)


def tree_add(a, b, scale=1.0):
    return tmap(lambda x, y: x + scale * y, a, b)


def tree_scale(a, s):
    return tmap(lambda x: s * x, a)


def cg_solve(matvec: Callable, b, K: int):
    """Solve A x = b with K conjugate-gradient iterations (A SPD).

    Matches the reference CG (``CG_torch.py``) update order; x₀ = 0.
    ``matvec(x, i)`` receives the iteration index for key folding.
    """
    x0 = tmap(jnp.zeros_like, b)

    def body(carry, i):
        x, r, p, rtr = carry
        Ap = matvec(p, i)
        pAp = tree_dot(p, Ap)
        alpha = rtr / jnp.where(pAp == 0, 1.0, pAp)
        x = tree_add(x, p, alpha)
        r = tree_add(r, Ap, -alpha)
        rtr_new = tree_dot(r, r)
        beta = rtr_new / jnp.where(rtr == 0, 1.0, rtr)
        p = tree_add(r, p, beta)
        return (x, r, p, rtr_new), None

    r0 = b
    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, r0, tree_dot(r0, r0)), jnp.arange(K)
    )
    return x


class HyperGrads(NamedTuple):
    hyper_grads: Any
    outer_loss: jnp.ndarray


def _outer_grads(outer_loss_fn, params, hyper):
    loss, (g_w, g_h) = jax.value_and_grad(outer_loss_fn, argnums=(0, 1))(
        params, hyper
    )
    return loss, g_w, g_h


def cg_normaleq(
    fp_map: Callable,  # (params, hyper, key) -> params  (one inner-opt step)
    outer_loss_fn: Callable,  # (params, hyper) -> scalar
    params,
    hyper,
    K: int,
    key,
) -> HyperGrads:
    """CG on the normal equations (ref ``hypergradients.py:199-244``):
    solve (I−J)(I−Jᵀ) v = (I−J) g_w, then hypergrad = (∂Φ/∂λ)ᵀ v + g_λ,
    where J = ∂Φ/∂w at the inner solution.
    """
    loss, g_w, g_h = _outer_grads(outer_loss_fn, params, hyper)

    # vjp side reuses ONE sample (ref builds w_mapped once and reuses its
    # graph for every Jᵀ product, :213-216)
    k_vjp, k_jvp = jax.random.split(key)
    w_mapped, vjp_fn = jax.vjp(lambda p: fp_map(p, hyper, k_vjp), params)

    def Jt(x):
        return vjp_fn(x)[0]

    def J(x, i):
        # jvp side resamples per product (ref jvp re-evaluates fp_map, :308-311)
        k = jax.random.fold_in(k_jvp, i)
        return jax.jvp(lambda p: fp_map(p, hyper, k), (params,), (x,))[1]

    def matvec(x, i):
        v1 = tree_add(x, Jt(x), -1.0)  # (I − Jᵀ) x
        return tree_add(v1, J(v1, i), -1.0)  # (I − J)(I − Jᵀ) x

    b = tree_add(g_w, J(g_w, jnp.int32(-1)), -1.0)  # (I − J) g_w
    vs = cg_solve(matvec, b, K)

    # (∂Φ/∂λ)ᵀ v  via vjp of fp_map in hyper
    _, vjp_h = jax.vjp(lambda h: fp_map(params, h, k_vjp), hyper)
    hyper_grads = tree_add(g_h, vjp_h(vs)[0])
    return HyperGrads(hyper_grads, loss)


def neumann(
    fp_map: Callable,
    outer_loss_fn: Callable,
    params,
    hyper,
    K: int,
    key,
) -> HyperGrads:
    """Neumann-series AID (ref ``hypergradients.py:247-278``):
    g ← Σ_{k=0..K} (Jᵀ)^k g_w, hypergrad = (∂Φ/∂λ)ᵀ g + g_λ.

    The reference builds ``w_mapped`` ONCE and reuses its graph for every
    Jᵀ product (:264-269), i.e. all products share one parameter sample —
    mirrored here by a single ``jax.vjp`` closure (the tol-based early exit
    at 1e-10 virtually never fires and is dropped, as in ``cg_solve``)."""
    loss, g_w, g_h = _outer_grads(outer_loss_fn, params, hyper)

    _, vjp_fn = jax.vjp(lambda p: fp_map(p, hyper, key), params)

    def body(carry, _):
        vs, gs = carry
        vs = vjp_fn(vs)[0]
        return (vs, tree_add(gs, vs)), None

    (_, gs), _ = jax.lax.scan(body, (g_w, g_w), None, length=K)

    _, vjp_h = jax.vjp(lambda h: fp_map(params, h, key), hyper)
    hyper_grads = tree_add(g_h, vjp_h(gs)[0])
    return HyperGrads(hyper_grads, loss)


def exact(
    opt_params_f: Callable,  # hyper -> params (closed-form inner solution)
    outer_loss_fn: Callable,  # (params, hyper) -> scalar
    hyper,
) -> HyperGrads:
    """Exact hypergradient through a closed-form inner solution
    (ref ``hypergradients.py:281-294``): differentiate
    ``outer_loss(opt_params_f(λ), λ)`` directly — native ``jax.grad``."""
    loss, grads = jax.value_and_grad(
        lambda h: outer_loss_fn(opt_params_f(h), h)
    )(hyper)
    return HyperGrads(grads, loss)


def reverse_unroll(
    inner_solver: Callable,  # hyper -> params (a differentiable unrolled solve)
    outer_loss_fn: Callable,  # (params, hyper) -> scalar
    hyper,
) -> HyperGrads:
    """Reverse-mode unrolled differentiation (ref ``hypergradients.py:14-34``
    and ``reverse`` :38-80). In JAX this is simply ``jax.grad`` through a
    ``lax.scan``-unrolled inner solve — exactly what the engine's nested
    trainer does (``PSVI._nested_step``); ``reverse``'s checkpointed
    recomputation corresponds to ``remat_inner=True``. Provided as a
    standalone helper for API parity."""
    loss, grads = jax.value_and_grad(
        lambda h: outer_loss_fn(inner_solver(h), h)
    )(hyper)
    return HyperGrads(grads, loss)


def fixed_point(
    fp_map: Callable,
    outer_loss_fn: Callable,
    params,
    hyper,
    K: int,
    key,
) -> HyperGrads:
    """Fixed-point AID (ref ``hypergradients.py:83-140``, stochastic=True):
    v ← Jᵀ v + g_w repeated K times, hypergrad = (∂Φ/∂λ)ᵀ v + g_λ."""
    loss, g_w, g_h = _outer_grads(outer_loss_fn, params, hyper)

    def body(vs, i):
        k = jax.random.fold_in(key, i)
        _, vjp_fn = jax.vjp(lambda p: fp_map(p, hyper, k), params)
        vs = tree_add(vjp_fn(vs)[0], g_w)
        return vs, None

    vs0 = tmap(jnp.zeros_like, g_w)
    vs, _ = jax.lax.scan(body, vs0, jnp.arange(K))

    k_last = jax.random.fold_in(key, jnp.int32(K))
    _, vjp_h = jax.vjp(lambda h: fp_map(params, h, k_last), hyper)
    hyper_grads = tree_add(g_h, vjp_h(vs)[0])
    return HyperGrads(hyper_grads, loss)

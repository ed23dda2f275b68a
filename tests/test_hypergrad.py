"""Hypergradient solver correctness against closed forms.

Quadratic bilevel problem with analytic solution:
  inner:  w*(λ) = argmin_w ½ wᵀA w − λᵀw   ⇒  w* = A⁻¹λ
  outer:  L(w, λ) = ½‖w − b‖² + ½γ‖λ‖²
  exact hypergradient: dL/dλ = A⁻¹(w* − b) + γλ
The fixed-point map is a GD step Φ(w, λ) = w − η(Aw − λ).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.ops import hypergrad as H


def _problem(seed=0, d=6):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((d, d))
    A = M @ M.T / d + np.eye(d)  # SPD, well-conditioned
    b = rng.standard_normal(d)
    lam = rng.standard_normal(d)
    gamma = 0.3
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(lam), gamma


def test_cg_solve_matches_linear_solve():
    A, b, _, _ = _problem()
    x = H.cg_solve(lambda v, i: A @ v, b, K=30)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-4)


def test_cg_solve_pytree():
    A, b, _, _ = _problem()
    tree_b = {"a": b[:3], "z": b[3:]}

    def matvec(x, i):
        v = jnp.concatenate([x["a"], x["z"]])
        out = A @ v
        return {"a": out[:3], "z": out[3:]}

    x = H.cg_solve(matvec, tree_b, K=30)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    got = np.concatenate([np.asarray(x["a"]), np.asarray(x["z"])])
    np.testing.assert_allclose(got, expect, rtol=1e-4)


@pytest.mark.parametrize("solver", ["cg_normaleq", "fixed_point", "neumann"])
def test_ift_hypergradient_quadratic(solver):
    A, b, lam, gamma = _problem()
    eta = 0.1

    def fp_map(w, h, key):
        return w - eta * (A @ w - h["lam"])

    def outer_loss(w, h):
        return 0.5 * jnp.sum((w - b) ** 2) + 0.5 * gamma * jnp.sum(h["lam"] ** 2)

    w_star = jnp.linalg.solve(A, lam)
    fn = {"cg_normaleq": H.cg_normaleq, "fixed_point": H.fixed_point,
          "neumann": H.neumann}[solver]
    K = {"cg_normaleq": 40, "fixed_point": 60, "neumann": 150}[solver]
    hg = fn(fp_map, outer_loss, w_star, {"lam": lam}, K, jax.random.PRNGKey(0))

    A_np = np.asarray(A)
    exact = np.linalg.solve(A_np, np.asarray(w_star - b)) + gamma * np.asarray(lam)
    np.testing.assert_allclose(
        np.asarray(hg.hyper_grads["lam"]), exact, rtol=2e-3, atol=1e-4
    )


def test_exact_hypergradient_closed_form():
    """`exact` differentiates through an analytic inner solution
    (ref hypergradients.py:281-294)."""
    A, b, lam, gamma = _problem()

    def outer_loss(w, h):
        return 0.5 * jnp.sum((w - b) ** 2) + 0.5 * gamma * jnp.sum(h["lam"] ** 2)

    hg = H.exact(lambda h: jnp.linalg.solve(A, h["lam"]), outer_loss,
                 {"lam": lam})
    A_np = np.asarray(A)
    w_star = np.linalg.solve(A_np, np.asarray(lam))
    expect = np.linalg.solve(A_np, w_star - np.asarray(b)) + gamma * np.asarray(lam)
    np.testing.assert_allclose(np.asarray(hg.hyper_grads["lam"]), expect,
                               rtol=1e-4, atol=1e-5)


def test_reverse_unroll_matches_exact():
    """`reverse_unroll` through a scan-unrolled GD solve converges to the
    exact hypergradient (ref hypergradients.py:14-80)."""
    A, b, lam, gamma = _problem()
    eta = 0.1

    def outer_loss(w, h):
        return 0.5 * jnp.sum((w - b) ** 2) + 0.5 * gamma * jnp.sum(h["lam"] ** 2)

    def inner_solver(h):
        def body(w, _):
            return w - eta * (A @ w - h["lam"]), None
        w, _ = jax.lax.scan(body, jnp.zeros_like(b), None, length=300)
        return w

    hg = H.reverse_unroll(inner_solver, outer_loss, {"lam": lam})
    A_np = np.asarray(A)
    w_star = np.linalg.solve(A_np, np.asarray(lam))
    expect = np.linalg.solve(A_np, w_star - np.asarray(b)) + gamma * np.asarray(lam)
    np.testing.assert_allclose(np.asarray(hg.hyper_grads["lam"]), expect,
                               rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize(
    "hypergrad_approx", ["cg_normaleq", "fixed_point", "neumann"]
)
def test_hyper_trainer_moves_toward_analytic_direction(hypergrad_approx):
    """The engine's hyper step on a logreg model produces a finite update in
    a descent direction of the outer loss, under every selectable AID solver
    (ref hyper_step dispatch, psvi_classes.py:610,658-675)."""
    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    eng = PSVI(
        data, method="psvi_learn_v", num_pseudo=8, mc_samples=4,
        architecture="logistic_regression", inner_it=5, num_epochs=2,
        data_minibatch=64, log_every=10, init_sd=1e-3, trainer="hyper",
        hyper_K=10, seed=0, hypergrad_approx=hypergrad_approx,
    )
    v0 = np.asarray(eng.state.v)
    state, aux = eng._step(eng.state, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["outer_loss"]))
    assert np.any(np.asarray(state.v) != v0)  # hypergrads applied


def test_engine_rejects_unknown_hypergrad_approx():
    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    with pytest.raises(ValueError, match="hypergrad_approx"):
        PSVI(data, method="psvi_learn_v", num_pseudo=8,
             architecture="logistic_regression", trainer="hyper",
             hypergrad_approx="not_a_solver")

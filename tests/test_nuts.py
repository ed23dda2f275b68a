"""Statistical correctness tests for the TPU-native NUTS sampler
(``psvi_tpu/ops/nuts.py``) — capability the reference declares via pystan
but ships disabled (``psvi/models/logreg.py:8,68-92``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.ops.nuts import nuts_sample


def test_nuts_correlated_gaussian_moments():
    """2-D correlated Gaussian: posterior mean/cov recovered within MC
    error; adaptation lands near the 0.8 target accept rate."""
    mu = jnp.asarray([1.0, -2.0])
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logd(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    samples, info = nuts_sample(
        logd, jnp.zeros(2), jax.random.PRNGKey(0),
        num_samples=4000, num_warmup=1000,
    )
    s = np.asarray(samples)
    assert s.shape == (4000, 2)
    assert not np.any(np.asarray(info["diverging"]))
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.35)
    acc = float(np.mean(np.asarray(info["accept_stat"])))
    assert 0.6 < acc <= 1.0


def test_nuts_anisotropic_mass_adaptation():
    """Badly scaled Gaussian (variances 100 vs 0.01): the Welford window
    must learn the diagonal metric for the chain to mix in both axes."""
    sd = jnp.asarray([10.0, 0.1])

    def logd(x):
        return -0.5 * jnp.sum(jnp.square(x / sd))

    samples, info = nuts_sample(
        logd, jnp.asarray([1.0, 0.1]), jax.random.PRNGKey(1),
        num_samples=4000, num_warmup=1500, max_depth=10,
    )
    s = np.asarray(samples)
    # inv_mass ≈ variance per dimension
    inv_mass = np.asarray(info["inv_mass"])
    assert inv_mass[0] / inv_mass[1] > 100.0
    np.testing.assert_allclose(s.std(0), np.asarray(sd), rtol=0.35)
    np.testing.assert_allclose(s.mean(0), np.zeros(2), atol=0.6)


def test_nuts_pytree_position():
    """Pytree positions round-trip through ravel/unravel."""
    def logd(tree):
        return -0.5 * (jnp.sum(tree["a"] ** 2) + jnp.sum(tree["b"] ** 2))

    init = {"a": jnp.zeros(3), "b": jnp.zeros((2, 2))}
    samples, _ = nuts_sample(
        logd, init, jax.random.PRNGKey(2), num_samples=200, num_warmup=200
    )
    assert samples["a"].shape == (200, 3)
    assert samples["b"].shape == (200, 2, 2)
    assert np.isfinite(np.asarray(samples["a"])).all()


def test_mcmc_sample_logreg_posterior_matches_laplace():
    """NUTS on a well-conditioned weighted logreg coreset posterior agrees
    with the Laplace approximation (same model; both asymptotically
    Gaussian here), and its predictive accuracy matches."""
    from psvi_tpu.models.logreg import (
        mcmc_sample, run_laplace, logreg_forward,
    )

    rng = np.random.default_rng(0)
    N, D = 200, 3
    theta_true = np.asarray([1.5, -2.0, 0.5])
    x = rng.standard_normal((N, D)).astype(np.float32)
    y = (rng.random(N) < 1 / (1 + np.exp(-x @ theta_true))).astype(np.float32)
    w = np.ones(N, np.float32)

    samples, info = mcmc_sample(
        jax.random.PRNGKey(3), x, y, w, num_samples=2000, num_warmup=800
    )
    s = np.asarray(samples)
    assert not np.any(np.asarray(info["diverging"]))

    lap = np.asarray(run_laplace(
        jax.random.PRNGKey(4), jnp.asarray(x), jnp.asarray(y), jnp.asarray(w),
        inner_it=8000, mc_samples=4000, diagonal=False, lr0net=1e-2,
    ))
    # posterior means agree within joint MC error
    np.testing.assert_allclose(s.mean(0), lap.mean(0), atol=0.25)
    np.testing.assert_allclose(s.std(0), lap.std(0), rtol=0.5)

    # predictive accuracy equivalent
    probs_nuts = np.asarray(logreg_forward(jnp.asarray(s[::10]), jnp.asarray(x)))
    probs_lap = np.asarray(logreg_forward(jnp.asarray(lap[::10]), jnp.asarray(x)))
    acc_nuts = np.mean((probs_nuts > 0.5) == (y > 0.5))
    acc_lap = np.mean((probs_lap > 0.5) == (y > 0.5))
    assert abs(acc_nuts - acc_lap) < 0.03


def test_run_random_mcmc_eval():
    """run_random(mcmc=True): the NUTS-evaluated growing coreset reaches
    sensible halfmoon accuracy (the reference's mcmc branch is dead code;
    ours runs)."""
    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.baselines import run_random

    data = read_dataset("halfmoon")
    res = run_random(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D,
        num_epochs=21, log_every=10, mc_samples=50, seed=0, mcmc=True,
    )
    assert len(res["accs"]) == 3
    assert res["accs"][-1] > 0.75


def test_uturn_direction_backward_segment():
    """A straight-line BACKWARD (eps<0) segment must not be flagged as a
    U-turn (regression: the unsigned criterion flagged every leftward
    subtree, truncating half of all NUTS trajectories)."""
    import jax.numpy as jnp

    from psvi_tpu.ops.nuts import _uturn

    p = jnp.ones(3)
    q0 = jnp.zeros(3)
    h = 0.1
    # generated in order while integrating backward: ckpt first, cur second
    q_ckpt = q0 - h * p
    q_cur = q0 - 2 * h * p
    inv_m = jnp.ones(3)
    assert not bool(_uturn(q_ckpt, p, q_cur, p, inv_m, direction=-1.0))
    # forward straight segment, generation order = trajectory order
    assert not bool(_uturn(q0 + h * p, p, q0 + 2 * h * p, p, inv_m,
                           direction=1.0))
    # an actual U-turn (momentum flipped against displacement) is caught
    assert bool(_uturn(q_ckpt, -p, q_cur, -p, inv_m, direction=-1.0))

"""Bayesian logistic regression primitives for the coreset baselines.

JAX re-design of ``psvi/models/logreg.py``:
- ``logreg_forward``     (ref :13-14)  — MC-averaged predictive probability
- ``log_joint`` / ``ll`` (ref :17-26)  — Bernoulli log-likelihoods + N(0,1) prior
- ``laplace_precision``  (ref :95-107) — diagonal / full Hessian of the
  weighted logreg negative log-joint at the MAP
- ``run_laplace``        (ref ``baselines.py:35-68``) — MAP fit by Adam
  (jitted ``lax.fori_loop``) then sampling from the Laplace approximation.

Stan/NUTS sampling (``mcmc_sample``, ref :68-92) is dead code in the
reference (the ``import stan`` is commented out and every baseline defaults
``mcmc=False``); here ``mcmc_sample`` is a REAL jitted NUTS sampler
(``psvi_tpu/ops/nuts.py``) — the ``mcmc=True`` branches actually work.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from psvi_tpu.ops import optim as O

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def logreg_forward(thetas, x):
    """MC-mean sigmoid predictive (ref logreg.py:13-14).
    thetas: (S, D); x: (N, D) → (N,)."""
    return jax.nn.sigmoid(x @ thetas.T).mean(axis=1)


def bernoulli_ll(theta, x, y):
    """Per-point Bernoulli log-likelihood log p(y | xᵀθ) (ref model(),
    logreg.py:17-26, single=True). theta: (D,), returns (N,)."""
    logits = x @ theta
    # -BCEWithLogits = y·log σ(l) + (1−y)·log(1−σ(l))
    return y * jax.nn.log_sigmoid(logits) + (1.0 - y) * jax.nn.log_sigmoid(-logits)


def bernoulli_ll_multi(thetas, x, y):
    """(N, S) log-likelihood matrix for S parameter samples (ref model()
    multi-sample branch)."""
    logits = x @ thetas.T  # (N, S)
    return y[:, None] * jax.nn.log_sigmoid(logits) + (1.0 - y)[:, None] * (
        jax.nn.log_sigmoid(-logits)
    )


def log_prior(theta, mu0=0.0, sigma0=1.0):
    return jnp.sum(
        -0.5 * jnp.square((theta - mu0) / sigma0)
        - jnp.log(jnp.float32(sigma0)) - _HALF_LOG_2PI
    )


def laplace_precision(z_core, theta, w, diagonal=True):
    """Hessian of the weighted negative log-joint (ref logreg.py:95-107).
    Uses w>0 masking via weights themselves (w clamped ≥ 0 upstream)."""
    m = z_core @ theta
    p = jax.nn.sigmoid(m)
    d = p * (1.0 - p) * jnp.maximum(w, 0.0)
    a = z_core.T * jnp.sqrt(d)  # (D, M)
    if diagonal:
        return jnp.sum(jnp.square(a), axis=1) + 1.0
    return jnp.eye(z_core.shape[1]) + a @ a.T


@partial(jax.jit, static_argnames=("inner_it", "mc_samples", "diagonal", "lr0net"))
def run_laplace_from(
    key,
    theta0,
    x_core,
    y_core,
    w_core,
    inner_it: int = 1000,
    mc_samples: int = 4,
    diagonal: bool = True,
    lr0net: float = 1e-3,
):
    """MAP continuation from ``theta0`` + Laplace samples. The reference's
    ``run_laplace`` (baselines.py:35-68) CONTINUES optimizing the caller's
    persistent ``theta`` parameter — callers like ``run_opsvi`` rely on θ
    converging across epochs. Returns ((S, D) samples, final θ)."""
    D = x_core.shape[1]
    opt = O.adam(lr0net)

    def loss_fn(theta):
        ll = bernoulli_ll(theta, x_core, y_core)
        return -jnp.dot(w_core, ll) - log_prior(theta)

    def body(_, carry):
        theta, state = carry
        g = jax.grad(loss_fn)(theta)
        return opt.step(theta, g, state)

    theta, _ = jax.lax.fori_loop(0, inner_it, body, (theta0, opt.init(theta0)))

    prec = laplace_precision(x_core, theta, w_core, diagonal=diagonal)
    eps = jax.random.normal(key, (mc_samples, D))
    if diagonal:
        samples = theta + eps * (prec ** -0.5)
    else:
        # precision → covariance Cholesky: Σ = P⁻¹; sample θ + L ε, L = chol(Σ)
        cov = jnp.linalg.inv(prec)
        L = jnp.linalg.cholesky(cov)
        samples = theta + eps @ L.T
    return samples, theta


def run_laplace(
    key,
    x_core,
    y_core,
    w_core,
    inner_it: int = 1000,
    mc_samples: int = 4,
    diagonal: bool = True,
    lr0net: float = 1e-3,
):
    """MAP fit from a fresh N(0, I) draw + Laplace samples
    (ref ``baselines.py:35-68`` as used with a freshly created θ,
    e.g. run_random :155-175). Returns (S, D) parameter samples."""
    D = x_core.shape[1]
    k0, k1 = jax.random.split(key)
    theta0 = jax.random.normal(k0, (D,))
    samples, _ = run_laplace_from(
        k1, theta0, x_core, y_core, w_core,
        inner_it=inner_it, mc_samples=mc_samples, diagonal=diagonal,
        lr0net=lr0net,
    )
    return samples


def evaluate_coreset_laplace(
    key, x_core, y_core, w_core, x_test, y_test,
    inner_it=1000, mc_samples=4, lr0net=1e-3,
):
    """MAP + Laplace eval of a weighted coreset (ref baselines.py:72-114)."""
    samples = run_laplace(
        key, x_core, y_core, w_core,
        inner_it=inner_it, mc_samples=mc_samples, lr0net=lr0net,
    )
    probs = logreg_forward(samples, x_test)
    acc = jnp.mean(((probs > 0.5).astype(jnp.float32) == y_test))
    p = jnp.clip(jnp.where(y_test > 0.5, probs, 1.0 - probs), 1e-38)
    nll = -jnp.mean(jnp.log(p))
    return acc, nll


def mcmc_sample(
    key,
    x_core,
    y_core,
    w_core,
    num_samples: int = 1000,
    num_warmup: int = 500,
    max_depth: int = 8,
):
    """NUTS sampling of the weighted logreg coreset posterior.

    The reference declares this capability through pystan but ships it
    disabled (``psvi/models/logreg.py:8,68-92`` — the Stan program is the
    same weighted Bernoulli-logit likelihood with a N(0,1) prior). Here it
    is a REAL jitted sampler (``psvi_tpu/ops/nuts.py``), exceeding the
    reference. Returns ((num_samples, D) θ draws, info dict).
    """
    from psvi_tpu.ops.nuts import nuts_sample

    x = jnp.asarray(x_core, jnp.float32)
    y = jnp.asarray(y_core, jnp.float32)
    w = jnp.maximum(jnp.asarray(w_core, jnp.float32), 0.0)

    def logdensity(theta):
        return jnp.dot(w, bernoulli_ll(theta, x, y)) + log_prior(theta)

    theta0 = jnp.zeros((x.shape[1],), jnp.float32)
    return nuts_sample(
        logdensity, theta0, key,
        num_samples=num_samples, num_warmup=num_warmup, max_depth=max_depth,
    )

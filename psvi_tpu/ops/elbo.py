"""Core PSVI objectives as pure JAX functions.

These reproduce, term for term, the reference objectives:

- ``inner_elbo``  — negative inner ELBO of q conditioned on the weighted
  pseudodata (ref ``psvi/inference/psvi_classes.py:488-511``):
  ``Σ_s [ Σ_m N·f(v)_m · NLL(u_m, z_m; θ_s) ] + KL(q‖p)``.
- ``psvi_elbo``   — negative outer PSVI-ELBO, the self-normalized
  importance-sampling estimate over S parameter samples
  (ref ``psvi_classes.py:445-486``): with
  ``log_weights_s = −pseudo_nll_s + sampled_nkl_s``,
  ``w = softmax(log_weights)``,
  ``loss = Σ_s w_s (data_nll_s − pseudo_nll_s) − mean_s log_weights_s``.
- ``predictive_mixture`` — importance-weighted posterior predictive used by
  ``evaluate``/``pred_on_grid`` (ref ``psvi_classes.py:1031-1108,1130-1175``).
- diagnostics: IW entropy, normalized ESS, v entropy
  (ref ``psvi_classes.py:1085-1101``).

All functions take the network's sampled noise ``eps`` explicitly so the
``sampled_nkl`` term uses the *same* parameter samples as the forward pass —
the pure-function equivalent of the reference's ``_cached_weight`` caching
(``psvi/models/neural_net.py:110-115``).

Likelihoods: ``categorical`` (classification; logits) and ``gaussian``
(regression; fixed precision tau — ref ``psvi_classes.py:1986``:
``distr_fn = gaussian_fn(scale=1/√tau)``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def categorical_nll(logits, labels):
    """Per-sample, per-datapoint negative log-likelihood.

    logits: (S, N, nc); labels: (N,) int — returns (S, N).
    Matches ``-Categorical(logits).log_prob(y)`` (ref psvi_classes.py:466).
    """
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, labels[None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return logz - picked


def soft_label_nll(logits, soft_targets):
    """KL-divergence loss for learnable soft labels (learn_z path).

    logits: (S, N, nc); soft_targets: (N, nc) raw label logits z.
    Reference behavior (``psvi_classes.py:464-474,495-505``): the target
    distribution is ``softmax(z, dim=0)`` — normalized over the *datapoint*
    axis, as in the reference — then
    ``nll[s,n] = Σ_c p[n,c]·(log p[n,c] − log_softmax(logits)[s,n,c])``
    (torch ``KLDivLoss(reduction='none')(log_probs, p).sum(class axis)``).
    Returns (S, N).
    """
    p = jax.nn.softmax(soft_targets, axis=0)
    logp = jnp.log(jnp.clip(p, 1e-38))
    log_q = jax.nn.log_softmax(logits, axis=-1)
    plogp = jnp.where(p > 0, p * logp, 0.0)
    return jnp.sum(plogp[None] - p[None] * log_q, axis=-1)


def gaussian_nll(preds, targets, tau: float):
    """Gaussian NLL with precision tau (scale = 1/√tau).

    preds: (S, N); targets: (N,) — returns (S, N).
    Ref ``psvi_classes.py:2038``: ``-Normal(out, 1/√tau).log_prob(y)``.
    """
    scale = 1.0 / jnp.sqrt(jnp.float32(tau))
    return (
        0.5 * jnp.square((targets[None] - preds) / scale)
        + jnp.log(scale)
        + _HALF_LOG_2PI
    )


def nll_fn(likelihood: str, learn_z: bool, nc: int, tau: Optional[float] = None):
    """Returns nll(outputs, labels) -> (S, N) for the configured likelihood."""
    if likelihood == "categorical":
        if learn_z:
            return lambda logits, z: soft_label_nll(logits, z)
        return lambda logits, y: categorical_nll(logits, y)
    if likelihood == "gaussian":
        return lambda preds, y: gaussian_nll(
            preds.squeeze(-1) if preds.ndim == 3 else preds,
            y.squeeze(-1) if y.ndim == 2 else y,
            tau,
        )
    raise ValueError(f"unknown likelihood {likelihood!r}")


def inner_elbo(
    net,
    params,
    eps,
    u,
    z,
    core_weights,  # N·f(v), shape (M,) — rescaling applied by caller
    likelihood: str = "categorical",
    learn_z: bool = False,
    nc: int = 2,
    tau: Optional[float] = None,
):
    """Negative inner ELBO (ref ``psvi_classes.py:488-511``).

    ``Σ_s pseudo_nll_s + KL(q‖p)`` where
    ``pseudo_nll_s = Σ_m core_weights_m · NLL(u_m, z_m; θ_s)``.
    Note the reference *sums* (not averages) over the S MC samples.
    """
    nll = nll_fn(likelihood, learn_z, nc, tau)
    kl = net.kl(params)
    if u.shape[0] == 0:
        return kl
    out = net.apply(params, eps, u)
    pseudo_nll = nll(out, z) @ core_weights  # (S,)
    return jnp.sum(pseudo_nll) + kl


def psvi_elbo(
    net,
    params,
    eps,
    u,
    z,
    core_weights,  # N·f(v), shape (M,)
    xbatch,
    ybatch,
    N: int,
    likelihood: str = "categorical",
    learn_z: bool = False,
    nc: int = 2,
    tau: Optional[float] = None,
):
    """Negative outer PSVI-ELBO (ref ``psvi_classes.py:445-486``).

    Forward runs once over ``concat(u, xbatch)`` exactly as the reference
    (``psvi_classes.py:451-463``) so pseudo- and data-NLLs share θ samples.
    """
    M, B = u.shape[0], xbatch.shape[0]
    all_x = jnp.concatenate([u, xbatch], axis=0)
    if learn_z:
        # ref :455-461: batch labels become nc·one_hot rows appended to z
        yb = ybatch.astype(jnp.int32)
        all_y = jnp.concatenate(
            [z, nc * jax.nn.one_hot(yb, nc, dtype=z.dtype)], axis=0
        )
    elif likelihood == "gaussian":
        all_y = jnp.concatenate([z.reshape(-1), ybatch.reshape(-1)], axis=0)
    else:
        all_y = jnp.concatenate([z, ybatch], axis=0)

    out = net.apply(params, eps, all_x)
    nll = nll_fn(likelihood, learn_z, nc, tau)
    all_nlls = nll(out, all_y)  # (S, M+B)

    pseudo_nll = all_nlls[:, :M] @ core_weights if M > 0 else jnp.zeros(
        all_nlls.shape[0]
    )
    data_nll = (N / B) * jnp.sum(all_nlls[:, M:], axis=-1)
    sampled_nkl = net.nkl(params, eps)  # (S,)

    log_weights = -pseudo_nll + sampled_nkl
    weights = jax.nn.softmax(log_weights, axis=0)
    return jnp.sum(weights * (data_nll - pseudo_nll)) - jnp.mean(log_weights)


def ablated_elbo(
    net,
    params,
    eps,
    xbatch,
    ybatch,
    N: int,
    likelihood: str = "categorical",
    nc: int = 2,
    tau: Optional[float] = None,
):
    """PSVI_Ablated objective: plain multi-sample ELBO on the data batch,
    no importance weighting (ref ``psvi_classes.py:1397-1408``):
    ``mean_s data_nll_s − mean_s sampled_nkl_s``."""
    B = xbatch.shape[0]
    out = net.apply(params, eps, xbatch)
    nll = nll_fn(likelihood, False, nc, tau)
    data_nll = (N / B) * jnp.sum(nll(out, ybatch), axis=-1)  # (S,)
    sampled_nkl = net.nkl(params, eps)
    return jnp.mean(data_nll) - jnp.mean(sampled_nkl)


def importance_log_weights(
    net, params, eps, u, z, core_weights,
    likelihood: str = "categorical",
    learn_z: bool = False,
    nc: int = 2,
    tau: Optional[float] = None,
    pseudo_out=None,
):
    """Evaluation-time importance log-weights (ref ``psvi_classes.py:
    1045-1070``, ``pred_on_grid`` :1146-1164, regressor :2241-2255).

    Reference quirk, reproduced deliberately: ``evaluate`` computes the
    pseudo term from the *positive* ``log_prob`` (``psvi_classes.py:1050``:
    ``distr_fn(logits).log_prob(z).matmul(N·f(v))``) and then negates it —
    ``log_weights = −pseudo + sampled_nkl`` — which is the OPPOSITE sign
    convention from the training objective at :475-484 (where the pseudo term
    is an NLL). We replicate it exactly so predictive numbers match.
    In the learn_z branch the KLDiv term is additionally summed over the
    S axis before weighting (``.sum((1, 2))`` at :1052-1056 → scalar).
    If ``pseudo_out`` (the network output on u) is provided, it is reused
    instead of recomputing the forward.
    """
    if u.shape[0] == 0:
        pseudo = 0.0
    else:
        if pseudo_out is None:
            pseudo_out = net.apply(params, eps, u)
        nll = nll_fn(likelihood, learn_z, nc, tau)
        if learn_z:
            # (S, M) KLDiv summed over S → (M,), then weighted → scalar
            pseudo = jnp.sum(nll(pseudo_out, z), axis=0) @ core_weights
        elif likelihood == "gaussian":
            # ref :2241-2247: scalar total weighted log-likelihood
            ll = -nll(pseudo_out, z)
            pseudo = jnp.sum(ll * core_weights[None, :])
        else:
            ll = -nll(pseudo_out, z)  # positive log_prob (ref :1050)
            pseudo = ll @ core_weights  # (S,)
    sampled_nkl = net.nkl(params, eps)
    return -pseudo + sampled_nkl


def predictive_mixture(test_logits, log_weights, correction: bool = True):
    """Importance-weighted mixture of per-sample predictive distributions.

    test_logits: (S, N, nc). Returns (probs (N, nc), weights (S,)).
    ``correction=False`` gives plain MC averaging (ref ``psvi_classes.py:
    1072-1080``)."""
    probs_s = jax.nn.softmax(test_logits, axis=-1)
    weights = jax.nn.softmax(log_weights, axis=0)
    if correction:
        probs = jnp.einsum("s,snc->nc", weights, probs_s)
    else:
        probs = jnp.mean(probs_s, axis=0)
    return probs, weights


def iw_diagnostics(weights, v_weights, num_pseudo: int):
    """IW entropy, normalized ESS, and v 'entropy' diagnostics
    (ref ``psvi_classes.py:1085-1101``). v_weights = f(v)."""
    w = weights
    iw_entropy = -jnp.sum(jnp.where(w > 0, w * jnp.log(jnp.clip(w, 1e-38)), 0.0))
    ness = jnp.square(jnp.sum(w)) / jnp.sum(jnp.square(w)) / w.shape[0]
    vs = v_weights
    v_entropy = jnp.square(jnp.sum(vs)) / jnp.sum(jnp.square(vs)) / num_pseudo
    return iw_entropy, ness, v_entropy

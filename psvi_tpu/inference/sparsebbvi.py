"""Sparse black-box VI: incremental coreset with the PSVI ELBO.

TPU-native re-design of ``psvi/inference/sparsebbvi.py:28-198``
(``run_sparsevi_with_bb_elbo``): grow a coreset greedily by correlation of
per-sample centered log-likelihoods with the residual, and optimize the
full-length weight vector on the generalized (self-normalized IW) PSVI-ELBO
— all through a *network-based* (black-box) variational posterior rather
than a Laplace approximation.

Re-design notes: the reference re-jits nothing and lets the coreset tensor
grow each iteration; here the coreset lives in a fixed-capacity padded
buffer (capacity = num_epochs) with a 0/1 mask so every jitted kernel has
static shapes — no recompiles as the coreset grows.

Helper objectives mirror ``psvi/inference/utils.py``:
``elbo`` (:85-91), ``sparsevi_psvi_elbo`` (:94-105),
``forward_through_coreset`` (:108-122), ``predict_through_coreset``
(:125-141).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.models.networks import make_fcnet, make_logreg
from psvi_tpu.ops import optim as O


def _bernoulli_ll(logits, y):
    """(S, N) Bernoulli log-likelihood; y broadcast over samples."""
    return y[None] * jax.nn.log_sigmoid(logits) + (1.0 - y)[None] * (
        jax.nn.log_sigmoid(-logits)
    )


def run_sparsevi_with_bb_elbo(
    x=None, y=None, xt=None, yt=None, mc_samples=4, data_minibatch=128,
    num_epochs=100, inner_it=10, outer_it=10, log_every=10,
    n_layers=1, n_hidden=40, logistic_regression=True, lr0=1e-3,
    seed=0, register_elbos=False, **kwargs,
) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    x, y = jnp.asarray(x), jnp.asarray(y)
    xt, yt = jnp.asarray(xt), jnp.asarray(yt)
    N, D = x.shape
    S = mc_samples

    net = (
        make_logreg(D, 1, init_sd=0.01)
        if logistic_regression
        else make_fcnet(D, n_hidden, 1, n_layers=n_layers, init_sd=0.01)
    )
    key, k0 = jax.random.split(key)
    params = net.init(k0)
    opt_net = O.adam(lr0)
    opt_net_state = opt_net.init(params)

    w = jnp.zeros(N)
    opt_w = O.adam(lr0)
    opt_w_state = opt_w.init(w)

    CAP = num_epochs + 1  # coreset capacity (one point max per iteration)
    core_x = jnp.zeros((CAP, D))
    core_y = jnp.zeros((CAP,))
    core_mask = jnp.zeros((CAP,))
    core_ids = np.full(CAP, -1, np.int64)
    n_core = 0

    B = min(data_minibatch, N)
    sum_scaling = N / B

    @jax.jit
    def inner_steps(params, opt_state, cx, cy, cw, key):
        """inner_it ELBO steps on the coreset support (ref :133-141;
        elbo at utils.py:85-91: pseudo_nll·w − sampled_nkl, summed).

        Gradients ACCUMULATE across the inner loop: the reference calls
        ``optim_net0.zero_grad()`` once per epoch (ref :134) and then
        ``loss.backward(); step()`` inner_it times without re-zeroing, so
        step t applies the SUM of gradients 1..t — a quirk replicated here
        (the Adam moments also persist across epochs, as there)."""
        keys = jax.random.split(key, inner_it)
        g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(carry, k):
            params, opt_state, g_acc = carry
            eps = net.sample_eps(k, S)

            def loss_fn(p):
                logits = net.apply(p, eps, cx).squeeze(-1)  # (S, CAP)
                pseudo_nll = (-_bernoulli_ll(logits, cy)) @ cw  # (S,)
                nkl = net.nkl(p, eps)
                # ref utils.py:91: `(pseudo_nll.sum() − sampled_nkl).sum()`
                # broadcasts scalar − (S,) ⇒ S·Σ pseudo − Σ nkl; replicated.
                return S * jnp.sum(pseudo_nll) - jnp.sum(nkl)

            loss, g = jax.value_and_grad(loss_fn)(params)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            params, opt_state = opt_net.step(params, g_acc, opt_state)
            return (params, opt_state, g_acc), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, g0), keys
        )
        return params, opt_state, losses

    @jax.jit
    def select_stats(params, cx, cy, cw, cmask, xb, yb, key):
        """Correlation statistics for the greedy step (ref :143-167;
        forward_through_coreset at utils.py:108-122)."""
        eps = net.sample_eps(key, S)
        all_x = jnp.concatenate([cx, xb], axis=0)
        logits = net.apply(params, eps, all_x).squeeze(-1)
        all_ll = _bernoulli_ll(logits, jnp.concatenate([cy, yb]))
        core_ll, data_ll = all_ll[:, :CAP], all_ll[:, CAP:]  # (S, ·)
        nkl = net.nkl(params, eps)
        # log_weights_s = Σ_m ll_core[s,m]·w_m + nkl_s (ref utils.py:119-121)
        weights = jax.nn.softmax(core_ll @ cw + nkl)
        ll_core, ll_data = core_ll.T, data_ll.T  # (M, S), (B, S)
        cll_data = ll_data - jnp.einsum("s,ns->ns", weights, ll_data)
        cll_core = ll_core - jnp.einsum("s,ms->ms", weights, ll_core)
        resid = sum_scaling * cll_data.sum(axis=0) - jnp.einsum(
            "m,ms->s", cw, cll_core
        )
        corrs = (cll_data @ resid) / jnp.sqrt(
            jnp.sum(cll_data**2, axis=1) + 1e-30
        ) / S
        corecorrs = jnp.abs(cll_core @ resid) / jnp.sqrt(
            jnp.sum(cll_core**2, axis=1) + 1e-30
        ) / S
        # mask out empty slots
        corecorrs = jnp.where(cmask > 0, corecorrs, -jnp.inf)
        return corrs, corecorrs

    @jax.jit
    def outer_steps(params, w, opt_w_state, cx, cy, cmask, core_idx_arr,
                    xb, yb, key):
        """outer_it projected Adam steps on w via the generalized PSVI-ELBO
        (ref :179-190; sparsevi_psvi_elbo at utils.py:94-105)."""
        keys = jax.random.split(key, outer_it)
        Nu = jnp.maximum(jnp.sum(cmask), 1.0)

        def body(carry, k):
            w, opt_w_state = carry
            eps = net.sample_eps(k, S)

            def loss_fn(w_in):
                cw = w_in[core_idx_arr] * cmask
                all_x = jnp.concatenate([cx, xb], axis=0)
                logits = net.apply(params, eps, all_x).squeeze(-1)
                all_nll = -_bernoulli_ll(
                    logits, jnp.concatenate([cy, yb])
                )
                pseudo_nll = (N / Nu) * (all_nll[:, :CAP] @ cw)
                data_nll = jnp.sum(all_nll[:, CAP:], axis=-1)
                nkl = net.nkl(params, eps)
                log_weights = -pseudo_nll + nkl
                weights = jax.nn.softmax(log_weights)
                return jnp.sum(
                    weights * (sum_scaling * data_nll - pseudo_nll)
                ) - jnp.mean(log_weights)

            loss, g = jax.value_and_grad(loss_fn)(w)
            w, opt_w_state = opt_w.step(w, g, opt_w_state)
            w = jnp.maximum(w, 0.0)
            return (w, opt_w_state), loss

        (w, opt_w_state), losses = jax.lax.scan(body, (w, opt_w_state), keys)
        return w, opt_w_state, losses

    @jax.jit
    def predict(params, cx, cy, cw, key):
        """IW-corrected prediction (ref predict_through_coreset,
        utils.py:125-141)."""
        eps = net.sample_eps(key, S)
        all_x = jnp.concatenate([xt, cx], axis=0)
        logits = net.apply(params, eps, all_x).squeeze(-1)
        Ntest = xt.shape[0]
        pnll = -_bernoulli_ll(logits[:, Ntest:], cy)
        pseudo_nll = pnll @ cw
        nkl = net.nkl(params, eps)
        weights = jax.nn.softmax(-pseudo_nll + nkl)
        test_probs = jnp.clip(
            jnp.einsum("s,sn->n", weights, jax.nn.sigmoid(logits[:, :Ntest])),
            0.0, 1.0,
        )
        acc = jnp.mean((test_probs > 0.5).astype(jnp.float32) == yt)
        p = jnp.clip(jnp.where(yt > 0.5, test_probs, 1 - test_probs), 1e-38)
        nll = -jnp.mean(jnp.log(p))
        return acc, nll

    accs, nlls, csizes, times, elbos = [], [], [], [0.0], []
    t0 = time.time()
    for it in range(num_epochs):
        cw = w[jnp.asarray(np.where(core_ids >= 0, core_ids, 0))] * core_mask
        if it % log_every == 0:
            key, k = jax.random.split(key)
            acc, nll = predict(params, core_x, core_y, cw, k)
            accs.append(float(acc)), nlls.append(float(nll))
            csizes.append(n_core)
            times.append(times[-1] + time.time() - t0)

        # 1. fit coreset posterior
        key, k1, k2, k3 = jax.random.split(key, 4)
        params, opt_net_state, inner_losses = inner_steps(
            params, opt_net_state, core_x, core_y, cw, k1
        )
        if register_elbos:
            elbos.append((1, -float(inner_losses[-1])))

        # 2-3. greedy selection
        sub_idcs = rng.integers(0, N, size=B)
        xb, yb = x[jnp.asarray(sub_idcs)], y[jnp.asarray(sub_idcs)]
        corrs, corecorrs = select_stats(
            params, core_x, core_y, cw, core_mask, xb, yb, k2
        )
        max_core = float(jnp.max(corecorrs)) if n_core > 0 else -np.inf
        if n_core == 0 or float(jnp.max(corrs)) > max_core:
            # intentional divergence: the reference computes
            # sub_idcs[argmax(max(corrs))] (sparsebbvi.py:169) — argmax of a
            # SCALAR is always 0, so it adds the first minibatch element
            # regardless of correlation. We pick the true argmax.
            pt = int(sub_idcs[int(jnp.argmax(corrs))])
            if pt not in core_ids[:n_core]:
                core_ids[n_core] = pt
                core_x = core_x.at[n_core].set(x[pt])
                core_y = core_y.at[n_core].set(y[pt])
                core_mask = core_mask.at[n_core].set(1.0)
                n_core += 1

        # 4. weight optimization on the generalized ELBO
        sub_idcs = rng.integers(0, N, size=B)
        xb, yb = x[jnp.asarray(sub_idcs)], y[jnp.asarray(sub_idcs)]
        core_idx_arr = jnp.asarray(np.where(core_ids >= 0, core_ids, 0))
        w, opt_w_state, outer_losses = outer_steps(
            params, w, opt_w_state, core_x, core_y, core_mask,
            core_idx_arr, xb, yb, k3,
        )
        if register_elbos:
            elbos.append((0, -float(outer_losses[-1])))

    return {"accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
            "elbos": elbos}

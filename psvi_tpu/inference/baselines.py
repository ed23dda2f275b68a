"""Classic coreset / VI baselines.

TPU-native re-designs of ``psvi/inference/baselines.py`` (1957 LoC of torch).
The sequential greedy loops stay host-side (they are inherently O(num_epochs)
small-scalar decisions); every numeric kernel — MAP Laplace fits, per-sample
log-likelihood matrices, residual correlations, MFVI ELBO steps — is jitted
JAX running on the accelerator.

Methods (surface parity with ``inf_dict``, ref psvi_experiments.py:402-458):
- ``run_random``                (ref baselines.py:118-203)
- ``run_giga``                  (ref :207-423, Campbell & Broderick 2018)
- ``run_sparsevi``              (ref :426-648, Campbell & Beronov 2019)
- ``run_opsvi``                 (ref :652-821, Manousakas et al 2020)
- ``run_mfvi`` / ``run_mfvi_subset``           (ref :824-1062)
- ``run_mfvi_regressor`` / ``run_mfvi_subset_regressor`` / ``fit`` (ref :1066-1346)
- ``run_kmeans``                (ref :1348-1423)
- ``run_el2n_coreset``          (ref :1427-1510)
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.data.datasets import DataBundle
from psvi_tpu.models import logreg as LR
from psvi_tpu.models.frequentist import RunFrequentistModel
from psvi_tpu.models.networks import set_up_model
from psvi_tpu.ops import elbo as E
from psvi_tpu.ops import optim as O
from psvi_tpu.ops.kmeans import KmeansCluster


def _aug(x):
    """Append the bias column of ones (ref baselines.py:146-147)."""
    return jnp.concatenate([x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)


def _eval_laplace(key, x_core, y_core, w_core, xt_aug, yt, inner_it,
                  mc_samples, lr0net, mcmc=False):
    """Coreset-posterior predictive evaluation. ``mcmc=True`` samples the
    posterior with the jitted NUTS sampler (the reference's pystan branch,
    ``baselines.py:152-153,486-487``, which its disabled Stan dependency
    never actually runs) instead of the Laplace approximation."""
    if x_core.shape[0] == 0:
        # empty coreset: prior samples
        samples = jax.random.normal(key, (mc_samples, xt_aug.shape[1]))
        probs = LR.logreg_forward(samples, xt_aug)
        acc = jnp.mean((probs > 0.5).astype(jnp.float32) == yt)
        p = jnp.clip(jnp.where(yt > 0.5, probs, 1 - probs), 1e-38)
        return float(acc), float(-jnp.mean(jnp.log(p)))
    if mcmc:
        samples, _ = LR.mcmc_sample(
            key, x_core, y_core, w_core,
            num_samples=max(mc_samples, 100), num_warmup=300,
        )
        probs = LR.logreg_forward(samples, xt_aug)
        acc = jnp.mean((probs > 0.5).astype(jnp.float32) == yt)
        p = jnp.clip(jnp.where(yt > 0.5, probs, 1 - probs), 1e-38)
        return float(acc), float(-jnp.mean(jnp.log(p)))
    acc, nll = LR.evaluate_coreset_laplace(
        key, x_core, y_core, w_core, xt_aug, yt,
        inner_it=inner_it, mc_samples=mc_samples, lr0net=lr0net,
    )
    return float(acc), float(nll)


def run_random(
    x=None, y=None, xt=None, yt=None, mc_samples=4, num_epochs=100,
    log_every=10, N=None, D=None, seed=0, lr0net=1e-3, mcmc=False, **kwargs,
) -> Dict[str, Any]:
    """Grow a random coreset; evaluate via Laplace, or NUTS when
    ``mcmc=True`` (ref :118-203; its mcmc branch at :152-153 is dead
    pystan code — ours actually samples)."""
    num_epochs = min(num_epochs, 2000) if mcmc else num_epochs  # ref :148
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    x, y, xt, yt = map(jnp.asarray, (x, y, xt, yt))
    x_aug, xt_aug = _aug(x), _aug(xt)
    w = np.zeros(N, np.float32)
    core_idcs: list = []
    accs, nlls, csizes, times = [], [], [], [0.0]
    log_idcs, log_wts = [], []
    t0 = time.time()
    for it in range(num_epochs):
        if it % log_every == 0:
            key, k = jax.random.split(key)
            acc, nll = _eval_laplace(
                k, x_aug[jnp.asarray(core_idcs, jnp.int32)], y[jnp.asarray(core_idcs, jnp.int32)],
                jnp.asarray(w[core_idcs]), xt_aug, yt, 1000, mc_samples, lr0net,
                mcmc=mcmc,
            )
            times.append(times[-1] + time.time() - t0)
            accs.append(acc), nlls.append(nll), csizes.append(len(core_idcs))
            log_idcs.append(list(core_idcs)), log_wts.append(w.tolist())
        remaining = np.setdiff1d(np.arange(N), np.asarray(core_idcs, int))
        core_idcs.append(int(rng.choice(remaining)))
        w[core_idcs] = N / len(core_idcs)
    return {
        "accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
        "wt_index": _process_wt_index(log_idcs, log_wts),
    }


def _process_wt_index(log_idcs, log_wts):
    """Per-logged-iteration {index: weight} maps
    (ref inference/utils.py:180-192)."""
    out = []
    for idcs, wts in zip(log_idcs, log_wts):
        out.append({int(i): float(wts[int(i)]) for i in idcs})
    return out


@partial(jax.jit, static_argnames=())
def _centered_lls(thetas, x_aug, y):
    """(N, S) per-sample lls, centered across samples (ref :316-323)."""
    ll = LR.bernoulli_ll_multi(thetas, x_aug, y)
    return ll - ll.mean(axis=1, keepdims=True)


def run_giga(
    x=None, y=None, xt=None, yt=None, mc_samples=100, data_minibatch=512,
    num_epochs=100, log_every=10, N=None, D=None, seed=0, subset_size=200,
    lr0net=1e-3, mcmc=False, giga_growth="log_every", **kwargs,
) -> Dict[str, Any]:
    """GIGA coreset: geodesic greedy selection with closed-form weights on
    normalized log-likelihood vectors (ref :207-423).

    giga_growth:
      'log_every'  — reference-faithful: the greedy grow step only runs on
        logged iterations because the reference indents the entire
        selection block under ``if it % log_every == 0:``
        (ref baselines.py:326-398). This caps coreset growth at
        ~num_epochs/log_every points and explains the 0.4-0.5 accuracies
        in PARITY.md — a REFERENCE DEFECT (GIGA, Campbell & Broderick
        2018, grows every iteration), reproduced only for parity. It also
        RESAMPLES the target direction ℓ̂_sum from a fresh minibatch every
        iteration, which breaks the geodesic invariants the algorithm's
        convergence rests on (the paper's target is the fixed full-data
        sum), and it feeds GIGA's unit-sphere-coefficient w straight into
        the Laplace coreset posterior without the paper's predictive
        calibration (applied only in its dead mcmc branch, :325-331) —
        with Σw = O(1) instead of O(N) that posterior stays at the prior.
      'every_step' — paper-correct (Campbell & Broderick 2018): the
        (N, S) centered log-likelihood matrix is computed ONCE (the
        posterior sample set is fixed), the target ℓ̂_sum is the fixed
        full-data direction, greedy selection runs over ALL N candidates
        every iteration, and evaluation calibrates the predictive weights
        w_pred = w·‖ΣL‖/‖ℓ_n‖·⟨lw, ℓ̂_sum⟩. O(N·S) per iteration — for
        beyond-memory N use the reference mode.

    Weight normalization: both modes divide the calibrated w by
    ‖(1−γ)·lw_old + γ·ℓ̂‖ (the norm of the UNNORMALIZED geodesic
    combination, as in the paper). The reference instead divides by
    ‖(1−γ)·lw_NEW + γ·ℓ̂‖ where lw_NEW is the already-normalized update
    (ref :409-414 — `lw` is reassigned on :407 before the `w` line reads
    it), mixing normalized and unnormalized quantities; another shipped
    defect, deliberately not reproduced."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    S = max(mc_samples, 50)  # (ref :227-230)
    x, y, xt, yt = map(jnp.asarray, (x, y, xt, yt))
    x_aug, xt_aug = _aug(x), _aug(xt)
    w = np.zeros(N, np.float32)

    # posterior approx on a random subset, computed once (ref :350-374)
    sub_idcs = rng.integers(0, N, size=subset_size)
    sum_scaling = N / data_minibatch
    key, k = jax.random.split(key)
    if mcmc:
        # ref :271-273 (dead pystan branch): subset posterior via MCMC
        param_samples, _ = LR.mcmc_sample(
            k, x_aug[jnp.asarray(sub_idcs)], y[jnp.asarray(sub_idcs)],
            sum_scaling * jnp.ones(subset_size), num_samples=S,
        )
    else:
        param_samples = LR.run_laplace(
            k, x_aug[jnp.asarray(sub_idcs)], y[jnp.asarray(sub_idcs)],
            sum_scaling * jnp.ones(subset_size),
            inner_it=1000, mc_samples=S, lr0net=lr0net,
        )

    def normalize(v, axis):
        n = jnp.linalg.norm(v, axis=axis, keepdims=True)
        return v / jnp.where(n == 0, 1.0, n)

    if giga_growth not in ("log_every", "every_step"):
        raise ValueError(
            f"giga_growth must be 'log_every' or 'every_step', "
            f"got {giga_growth!r}"
        )
    lw = jnp.zeros(S)
    core_idcs: list = []
    accs, nlls, csizes, times = [], [], [], [0.0]
    t0 = time.time()
    norm_ll_core = jnp.zeros((0, S))
    if giga_growth == "every_step":
        # paper-correct: fixed posterior samples → the (N, S) centered ll
        # matrix and the full-data target direction are computed ONCE
        ll_all = _centered_lls(param_samples, x_aug, y)
        sum_lls_full = ll_all.sum(axis=0)
        norm_lls_full = normalize(ll_all, 1)
        norm_sumlls_full = normalize(sum_lls_full, 0).reshape(-1)
        all_idcs = np.arange(N)
    for it in range(num_epochs):
        core_arr = jnp.asarray(core_idcs, jnp.int32)
        if giga_growth == "every_step":
            sub_idcs = all_idcs
            ll_core = ll_all[core_arr]
            sum_lls, norm_lls = sum_lls_full, norm_lls_full
            norm_sumlls = norm_sumlls_full
        else:
            sub_idcs = rng.integers(0, N, size=data_minibatch)
            sub_arr = jnp.asarray(sub_idcs)
            ll_data = _centered_lls(param_samples, x_aug[sub_arr], y[sub_arr])
            ll_core = _centered_lls(param_samples, x_aug[core_arr], y[core_arr])
            sum_lls = ll_data.sum(axis=0)
            norm_lls = normalize(ll_data, 1)
            norm_sumlls = normalize(sum_lls, 0).reshape(-1)

        if it % log_every == 0:
            key, k = jax.random.split(key)
            w_eval = jnp.asarray(w[core_idcs])
            if (mcmc or giga_growth == "every_step") and core_idcs:
                # GIGA's w lives on the normalized-log-likelihood scale;
                # the predictive needs the data-count rescaling
                # w_pred = w·||ΣL|| / ||ℓ_core||·(lw·ℓ̂) (ref :325-331).
                # The reference applies it ONLY in its mcmc branch and
                # feeds RAW normalized-scale w to the Laplace posterior
                # (:335-345) — with O(1) weights that posterior stays at
                # the prior, which is why shipped GIGA sits at ~0.5
                # accuracy. A third shipped defect: the paper-correct
                # 'every_step' mode calibrates the Laplace branch too;
                # 'log_every' reproduces the reference as-is.
                w_eval = (
                    w_eval * jnp.linalg.norm(sum_lls)
                    / jnp.linalg.norm(ll_core, axis=1)
                    * jnp.dot(lw, norm_sumlls)
                )
            # ref evaluates with inner_it=100 (:335-345) — at lr0net=1e-2
            # that Adam MAP fit is far from converged (full-data Laplace
            # scores 0.56 vs 0.94 at 1000 iterations on synth_lr_10), a
            # further shipped weakness; the corrected mode evaluates the
            # converged posterior
            eval_it = 1000 if giga_growth == "every_step" else 100
            acc, nll = _eval_laplace(
                k, x_aug[core_arr], y[core_arr], w_eval,
                xt_aug, yt, eval_it, S, lr0net, mcmc=mcmc,
            )
            times.append(times[-1] + time.time() - t0)
            accs.append(acc), nlls.append(nll)
            csizes.append(int((w > 0).sum()))

        if giga_growth == "every_step" or it % log_every == 0:
            # geodesic direction & greedy pick (ref :382-398; nested under
            # the log branch in giga_growth='log_every' as the reference
            # indents it — see docstring)
            d = normalize(norm_sumlls - jnp.dot(norm_sumlls, lw) * lw, 0)
            proj = jnp.einsum("ns,s->n", norm_lls, lw)
            dns = normalize(norm_lls - proj[:, None] * lw[None, :], 1)
            pick = int(jnp.argmax(dns @ d))
            pt_idx = int(sub_idcs[pick])
            if pt_idx not in core_idcs:
                core_idcs.append(pt_idx)
                idx_new = -1
                core_arr = jnp.asarray(core_idcs, jnp.int32)
                ll_core = _centered_lls(
                    param_samples, x_aug[core_arr], y[core_arr]
                )
            else:
                idx_new = core_idcs.index(pt_idx)
            norm_ll_core = normalize(ll_core, 1)
            nlc = norm_ll_core[idx_new]
            zeta0 = jnp.dot(norm_sumlls, nlc)
            zeta1 = jnp.dot(norm_sumlls, lw)
            zeta2 = jnp.dot(nlc, lw)
            gamma = (zeta0 - zeta1 * zeta2) / (
                zeta0 - zeta1 * zeta2 + zeta1 - zeta0 * zeta2
            )
            lw_unnorm = (1 - gamma) * lw + gamma * nlc
            lw = normalize(lw_unnorm, 0).reshape(-1)
            onehot = np.zeros(N, np.float32)
            onehot[pt_idx] = 1.0
            w = np.maximum(
                ((1 - float(gamma)) * w + float(gamma) * onehot)
                / float(jnp.linalg.norm(lw_unnorm)),
                0.0,
            )
    return {"accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
            "_core_idcs": core_idcs, "_w": w, "_lw": np.asarray(lw)}


def run_sparsevi(
    x=None, y=None, xt=None, yt=None, mc_samples=4, data_minibatch=128,
    num_epochs=100, log_every=10, N=None, D=None, diagonal=True,
    inner_it=10, outer_it=10, lr0net=1e-3, lr0v=1e-1, seed=0, mcmc=False,
    **kwargs,
) -> Dict[str, Any]:
    """Sparse VI (ref :426-648): Laplace coreset posterior, greedy
    residual-correlation selection, projected Adam on weights.

    The coreset lives in a FIXED-SIZE padded buffer (capacity num_epochs —
    at most one point joins per epoch) with zero weights on unused slots.
    Zero-weight rows contribute exactly nothing to the MAP loss, its
    gradient and the Laplace Hessian (all are w-weighted sums), so the
    math is identical to the growing-array formulation while every jitted
    program keeps STATIC shapes: 2 compiles for the whole run instead of
    one per coreset size per step (the growing formulation recompiled
    ~3 programs × num_epochs times — 244 s → ~30 s per 101-epoch CPU run)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    outer_it = min(outer_it, 500)
    x, y, xt, yt = map(jnp.asarray, (x, y, xt, yt))
    x_aug, xt_aug = _aug(x), _aug(xt)
    M_max, Dp = num_epochs, x_aug.shape[1]
    xc = jnp.zeros((M_max, Dp), x_aug.dtype)
    yc = jnp.zeros((M_max,), y.dtype)
    wc = jnp.zeros((M_max,))
    mask = jnp.zeros((M_max,), bool)
    pos = np.zeros((M_max,), np.int32)  # dataset index per slot (host-side)
    m = 0
    opt_w = O.adam(lr0v)
    opt_w_state = opt_w.init(wc)

    accs, nlls, csizes, times = [], [], [], [0.0]
    log_idcs, log_wts = [], []
    core_idcs: list = []
    t0 = time.time()
    scale = N / data_minibatch

    @jax.jit
    def _select_stats(k, xc, yc, wc, mask, sub_x, sub_y):
        samples = LR.run_laplace(
            k, xc, yc, wc, inner_it=inner_it,
            mc_samples=mc_samples, diagonal=diagonal, lr0net=lr0net,
        )
        cll_data = _centered_lls(samples, sub_x, sub_y)
        cll_core = _centered_lls(samples, xc, yc)
        resid = scale * cll_data.sum(axis=0) - wc @ cll_core
        S = cll_data.shape[1]
        corrs = (cll_data @ resid) / jnp.sqrt(
            jnp.sum(cll_data**2, axis=1)
        ) / S
        corecorrs = jnp.abs(cll_core @ resid) / jnp.sqrt(
            jnp.sum(cll_core**2, axis=1)
        ) / S
        # padded slots must not win the max-correlation comparison
        return corrs, jnp.where(mask, corecorrs, -jnp.inf)

    @jax.jit
    def _w_grad(k, theta, xc, yc, wc, mask, sub_x, sub_y):
        # MAP continuation: ref creates theta once per epoch and the
        # outer_it weight loop keeps refining it (baselines.py:588-604)
        samples, theta = LR.run_laplace_from(
            k, theta, xc, yc, wc, inner_it=inner_it,
            mc_samples=mc_samples, diagonal=diagonal, lr0net=lr0net,
        )
        cll_data = _centered_lls(samples, sub_x, sub_y)
        cll_core = _centered_lls(samples, xc, yc)
        resid = scale * cll_data.sum(axis=0) - wc @ cll_core
        g = -(cll_core @ resid) / cll_core.shape[1]
        return jnp.where(mask, g, 0.0), theta

    for it in range(num_epochs):
        if it % log_every == 0:
            key, k = jax.random.split(key)
            acc, nll = _eval_laplace(
                k, xc, yc, wc, xt_aug, yt, 1000, mc_samples, lr0net,
                mcmc=mcmc,
            )
            times.append(times[-1] + time.time() - t0)
            accs.append(acc), nlls.append(nll), csizes.append(len(core_idcs))
            log_idcs.append(list(core_idcs))
            w_full = np.zeros(N)
            w_full[pos[:m]] = np.asarray(wc)[:m]
            log_wts.append(w_full.tolist())

        # greedy selection (ref :521-581); with an empty (all-masked)
        # coreset, corecorrs is -inf and the max-correlation point is
        # picked unconditionally — the reference's no-coreset branch
        sub_idcs = rng.integers(0, N, size=data_minibatch)
        sub_arr = jnp.asarray(sub_idcs)
        key, k = jax.random.split(key)
        corrs, corecorrs = _select_stats(
            k, xc, yc, wc, mask, x_aug[sub_arr], y[sub_arr]
        )
        if float(corrs.max()) > float(corecorrs.max()):
            pt = int(sub_idcs[int(jnp.argmax(corrs))])
            if pt not in core_idcs and m < M_max:
                core_idcs.append(pt)
                xc = xc.at[m].set(x_aug[pt])
                yc = yc.at[m].set(y[pt])
                mask = mask.at[m].set(True)
                pos[m] = pt
                m += 1

        # projected weight updates (ref :585-638); theta fresh per epoch,
        # refined across the outer_it iterations. The weight Adam is
        # constructed FRESH each epoch in the reference (:588), resetting
        # moments and bias correction.
        opt_w_state = opt_w.init(wc)
        key, k_th = jax.random.split(key)
        theta_w = jax.random.normal(k_th, (Dp,))
        for _ in range(outer_it):
            key, k2 = jax.random.split(key)
            sub_idcs2 = jnp.asarray(rng.integers(0, N, size=data_minibatch))
            g_core, theta_w = _w_grad(
                k2, theta_w, xc, yc, wc, mask,
                x_aug[sub_idcs2], y[sub_idcs2],
            )
            wc, opt_w_state = opt_w.step(wc, g_core, opt_w_state)
            wc = jnp.maximum(wc, 0.0)
    return {
        "accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
        "wt_index": _process_wt_index(log_idcs, log_wts),
    }


def run_opsvi(
    x=None, y=None, xt=None, yt=None, mc_samples=10, data_minibatch=128,
    num_epochs=100, log_every=10, N=None, D=None, num_pseudo=10,
    inner_it=10, diagonal=True, lr0net=1e-3, lr0u=1e-3, lr0v=1e-3,
    init_args="subsample", seed=0, log_pseudodata=False, **kwargs,
) -> Dict[str, Any]:
    """Original PSVI (Manousakas et al 2020): fixed-size pseudocoreset with
    manual gradients for weights and locations (ref :652-821)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    x, y, xt, yt = map(jnp.asarray, (x, y, xt, yt))
    x_aug, xt_aug = _aug(x), _aug(xt)

    # pseudodata init (ref inference/utils.py:33-77)
    x_np, y_np = np.asarray(x), np.asarray(y)
    M = num_pseudo
    if init_args == "random":
        u0 = x_np.mean() + 0.1 * rng.standard_normal((M, x_np.shape[1]))
        z0 = np.concatenate([
            np.full(M // 2, c, np.float32) if c < 1 else
            np.full(M - M // 2, c, np.float32) for c in range(2)
        ])
    else:
        idx0, idx1 = np.where(y_np == 0)[0], np.where(y_np == 1)[0]
        m0 = M // 2
        take0 = rng.choice(idx0, m0, replace=len(idx0) < m0)
        take1 = rng.choice(idx1, M - m0, replace=len(idx1) < M - m0)
        u0 = np.concatenate([x_np[take0], x_np[take1]])
        z0 = np.concatenate([np.zeros(m0), np.ones(M - m0)]).astype(np.float32)
    u = jnp.asarray(np.concatenate([u0, np.ones((M, 1))], axis=1), jnp.float32)
    z = jnp.asarray(z0)
    w = (N / M) * jnp.ones(M)

    opt_u, opt_w = O.adam(lr0u), O.adam(lr0v * N)
    opt_u_state, opt_w_state = opt_u.init(u), opt_w.init(w)

    # persistent MAP iterate: the reference's theta parameter is created once
    # and every run_laplace call CONTINUES optimizing it (baselines.py:713-714,
    # :772-782, :941-957) — convergence accumulates across epochs
    key, k_theta = jax.random.split(key)
    theta = jax.random.normal(k_theta, (x_aug.shape[1],))

    accs, nlls, csizes, times = [], [], [], [0.0]
    us, zs, ws = [], [], []
    t0 = time.time()

    @jax.jit
    def _grads(k, theta, u, z, w, sub_x, sub_y):
        samples, theta = LR.run_laplace_from(
            k, theta, u, z, w, inner_it=inner_it, mc_samples=mc_samples,
            diagonal=diagonal, lr0net=lr0net,
        )
        def core_resid_fn(u_in):
            cll_data = _centered_lls(samples, sub_x, sub_y)
            cll_core = _centered_lls(samples, u_in, z)
            resid = (N / data_minibatch) * cll_data.sum(axis=0) - w @ cll_core
            return cll_core, resid
        cll_core, resid = core_resid_fn(u)
        S = cll_core.shape[1]
        w_grad = -(cll_core @ resid) / S
        # u gradient of  (−w·cll_core)·resid / S  with resid, w detached
        # (ref :795-803)
        resid_d = jax.lax.stop_gradient(resid)
        def u_fn(u_in):
            cll_core_u = _centered_lls(samples, u_in, z)
            return jnp.dot(
                jnp.einsum("m,ms->s", -w, cll_core_u), resid_d
            ) / S
        u_grad = jax.grad(u_fn)(u)
        u_grad = u_grad.at[:, -1].set(0.0)  # zero bias-column grad (ref :804)
        return w_grad, u_grad, theta

    for it in range(num_epochs):
        if it % log_every == 0:
            key, k = jax.random.split(key)
            samples, theta = LR.run_laplace_from(
                k, theta, u, z, w, inner_it=inner_it,
                mc_samples=mc_samples, diagonal=diagonal, lr0net=lr0net,
            )
            probs = LR.logreg_forward(samples, xt_aug)
            acc = float(jnp.mean((probs > 0.5).astype(jnp.float32) == yt))
            pcl = jnp.clip(jnp.where(yt > 0.5, probs, 1 - probs), 1e-38)
            nll = float(-jnp.mean(jnp.log(pcl)))
            times.append(times[-1] + time.time() - t0)
            accs.append(acc), nlls.append(nll), csizes.append(M)
            if log_pseudodata:
                us.append(np.asarray(u)), zs.append(np.asarray(z))
                ws.append(np.asarray(w))
        sub_idcs = jnp.asarray(rng.integers(0, N, size=data_minibatch))
        key, k = jax.random.split(key)
        w_grad, u_grad, theta = _grads(
            k, theta, u, z, w, x_aug[sub_idcs], y[sub_idcs]
        )
        w, opt_w_state = opt_w.step(w, w_grad, opt_w_state)
        u, opt_u_state = opt_u.step(u, u_grad, opt_u_state)
        w = jnp.maximum(w, 0.0)
    out = {"accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
           "elbos": []}
    if log_pseudodata:
        out["us"], out["zs"], out["vs"] = us, zs, ws
    return out


# ----------------------------------------------------------------------
# MFVI flows (BNN)
# ----------------------------------------------------------------------


class _MFVI:
    """Shared machinery for mean-field VI fits on a fixed or streamed batch."""

    def __init__(self, data: DataBundle, architecture, n_hidden, nc, mc_samples,
                 init_sd, lr0net, data_minibatch, seed, n_layers=1):
        self.data = data
        self.nc = nc
        self.mc_samples = mc_samples
        self.B = min(data_minibatch, data.N)
        self.net = set_up_model(
            architecture, data.D, n_hidden, nc, init_sd,
            n_layers=n_layers, n_channels=data.channels or 1,
        )
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        self.params = self.net.init(k)
        self.opt = O.adam(lr0net)
        self.opt_state = self.opt.init(self.params)

    def elbo_loss(self, params, eps, xb, yb, scale, distr, tau):
        out = self.net.apply(params, eps, xb)
        nll = E.nll_fn(distr, False, self.nc, tau)(out, yb)
        # reference sums over (samples, batch): baselines.py:883-887
        data_nll = scale * jnp.sum(nll)
        return data_nll + self.net.kl(params)


def run_mfvi(
    train=None, mc_samples=4, data_minibatch=128, num_epochs=100,
    log_every=10, N=None, D=None, lr0net=1e-3, mul_fact=2, seed=0,
    architecture=None, n_hidden=None, nc=2, n_layers=1, init_sd=1e-3,
    mesh=None, shard_batch=False, **kwargs,
) -> Dict[str, Any]:
    """Mean-field VI on the full training set (ref :824-920).

    mesh + shard_batch=True: minibatch rows sharded over the mesh 'data'
    axis — with no inner loop the data-NLL term IS the step, so this is
    the flow where batch-DP pays (SCALING.md). Numerics equal the
    replicated run (the constraint only changes layout)."""
    data: DataBundle = train
    m = _MFVI(data, architecture, n_hidden, nc, mc_samples, init_sd,
              lr0net, data_minibatch, seed, n_layers)
    x, y = jnp.asarray(data.x), jnp.asarray(data.y)
    xt, yt = jnp.asarray(data.xt), jnp.asarray(data.yt)
    n_train = data.N

    batch_shardings = None
    if mesh is not None and shard_batch:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_shardings = (
            NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
            NamedSharding(mesh, P("data")),
        )
        dsize = mesh.shape["data"]
        m.B = max(dsize, (m.B // dsize) * dsize)

    @jax.jit
    def step(params, opt_state, key):
        kb, ke = jax.random.split(key)
        idx = jax.random.choice(kb, n_train, (m.B,), replace=False)
        xb, yb = x[idx], y[idx]
        if batch_shardings is not None:
            xb = jax.lax.with_sharding_constraint(xb, batch_shardings[0])
            yb = jax.lax.with_sharding_constraint(yb, batch_shardings[1])
        eps = m.net.sample_eps(ke, mc_samples)
        loss, g = jax.value_and_grad(m.elbo_loss)(
            params, eps, xb, yb, n_train / m.B, "categorical", None
        )
        params, opt_state = m.opt.step(params, g, opt_state)
        return params, opt_state, loss

    @jax.jit
    def evaluate(params, key):
        eps = m.net.sample_eps(key, mc_samples)
        logits = m.net.apply(params, eps, xt).mean(axis=0)  # mean logits (ref :901)
        pred = jnp.argmax(logits, -1).astype(jnp.float32)
        acc = jnp.mean(pred == yt)
        nll = jnp.mean(E.categorical_nll(logits[None], yt)[0])
        return acc, nll

    accs, nlls, times, elbos = [], [], [0.0], []
    t0 = time.time()
    total_iterations = mul_fact * num_epochs
    for i in range(total_iterations):
        m.key, ks, ke = jax.random.split(m.key, 3)
        m.params, m.opt_state, loss = step(m.params, m.opt_state, ks)
        elbos.append(-float(loss))
        if i % log_every == 0 or i == total_iterations - 1:
            acc, nll = evaluate(m.params, ke)
            times.append(times[-1] + time.time() - t0)
            accs.append(float(acc)), nlls.append(float(nll))
    return {"accs": accs, "nlls": nlls, "times": times[1:], "elbos": elbos,
            "csizes": None}


def run_mfvi_subset(
    train=None, mc_samples=4, data_minibatch=128, num_epochs=100,
    log_every=10, D=None, lr0net=1e-3, mul_fact=2, seed=0,
    num_pseudo=100, init_args="subsample", architecture=None, n_hidden=None,
    nc=2, n_layers=1, init_sd=1e-3, log_pseudodata=False, **kwargs,
) -> Dict[str, Any]:
    """MFVI on a fixed size-M class-balanced subset with sum-scaling
    n_train/M (ref :923-1062) — the PR-1 reference configuration."""
    data: DataBundle = train
    m = _MFVI(data, architecture, n_hidden, nc, mc_samples, init_sd,
              lr0net, data_minibatch, seed, n_layers)
    rng = np.random.default_rng(seed)
    x_np, y_np = np.asarray(data.x), np.asarray(data.y)

    # fixed class-balanced batch (ref :961-1005)
    M = num_pseudo
    ppc = [M // nc] * nc
    ppc[-1] = M - sum(ppc[:-1])
    if init_args == "random":
        xb = x_np.mean() + 0.1 * rng.standard_normal((M,) + x_np.shape[1:])
        yb = np.concatenate(
            [np.full(p, c, np.float32) for c, p in enumerate(ppc)]
        )
    else:
        xs, ys = [], []
        for c in range(nc):
            idx = np.where(y_np == c)[0]
            take = rng.choice(idx, ppc[c], replace=len(idx) < ppc[c])
            xs.append(x_np[take])
            ys.append(np.full(ppc[c], c, np.float32))
        xb, yb = np.concatenate(xs), np.concatenate(ys)
    xb = jnp.asarray(xb, jnp.float32)
    yb = jnp.asarray(yb)
    xt, yt = jnp.asarray(data.xt), jnp.asarray(data.yt)
    sum_scaling = data.N / M

    @jax.jit
    def step(params, opt_state, key):
        eps = m.net.sample_eps(key, mc_samples)
        loss, g = jax.value_and_grad(m.elbo_loss)(
            params, eps, xb, yb, sum_scaling, "categorical", None
        )
        params, opt_state = m.opt.step(params, g, opt_state)
        return params, opt_state, loss

    @jax.jit
    def evaluate(params, key):
        eps = m.net.sample_eps(key, mc_samples)
        logits = m.net.apply(params, eps, xt).mean(axis=0)
        pred = jnp.argmax(logits, -1).astype(jnp.float32)
        acc = jnp.mean(pred == yt)
        nll = jnp.mean(E.categorical_nll(logits[None], yt)[0])
        return acc, nll

    accs, nlls, times, elbos = [], [], [0.0], []
    t0 = time.time()
    for i in range(mul_fact * num_epochs):
        m.key, ks, ke = jax.random.split(m.key, 3)
        m.params, m.opt_state, loss = step(m.params, m.opt_state, ks)
        elbos.append(-float(loss))
        if i % log_every == 0:
            acc, nll = evaluate(m.params, ke)
            times.append(times[-1] + time.time() - t0)
            accs.append(float(acc)), nlls.append(float(nll))
    out = {"accs": accs, "nlls": nlls, "times": times[1:], "elbos": elbos,
           "csizes": [num_pseudo] * (mul_fact * num_epochs)}
    if log_pseudodata:
        out["us"], out["zs"] = np.asarray(xb), np.asarray(yb)
        out["vs"] = [sum_scaling] * num_pseudo
    return out


def fit(
    m: _MFVI, x, y, xp, yp, y_mean, y_std, tau, epochs, log_every=-1,
    batch_size=None, mc_samples=4,
) -> Dict[str, Any]:
    """Fit a mean-field regression BNN, log RMSE/pred-LL (ref :1283-1346).
    xp/yp: prediction set (validation or test); yp is unnormalized."""
    n_train = x.shape[0]
    B = min(batch_size or n_train, n_train)

    @jax.jit
    def step(params, opt_state, key):
        kb, ke = jax.random.split(key)
        idx = jax.random.choice(kb, n_train, (B,), replace=False)
        eps = m.net.sample_eps(ke, mc_samples)
        loss, g = jax.value_and_grad(m.elbo_loss)(
            params, eps, x[idx], y[idx], n_train / B, "gaussian", tau
        )
        params, opt_state = m.opt.step(params, g, opt_state)
        return params, opt_state, loss

    @jax.jit
    def evaluate(params, key):
        eps = m.net.sample_eps(key, mc_samples)
        preds = m.net.apply(params, eps, xp).squeeze(-1)
        y_pred = (preds * y_std + y_mean).mean(axis=0)
        ytrue = yp.reshape(-1)
        rmse = jnp.sqrt(jnp.mean(jnp.square(y_pred - ytrue)))
        scale = 1.0 / jnp.sqrt(jnp.float32(tau))
        ll = jnp.mean(
            -0.5 * jnp.square((ytrue - y_pred) / scale)
            - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
        )
        return rmse, ll

    lls, rmses, times, elbos = [], [], [0.0], []
    t0 = time.time()
    for e in range(epochs):
        m.key, ks, ke = jax.random.split(m.key, 3)
        m.params, m.opt_state, loss = step(m.params, m.opt_state, ks)
        elbos.append(-float(loss))
        is_ckpt = (e % log_every == 0) if log_every > 0 else (e == epochs - 1)
        if is_ckpt:
            rmse, ll = evaluate(m.params, ke)
            times.append(times[-1] + time.time() - t0)
            lls.append(float(ll)), rmses.append(float(rmse))
    return {"rmses": rmses, "lls": lls, "times": times[1:], "elbos": elbos,
            "scale": 1.0 / np.sqrt(tau)}


def run_mfvi_regressor(
    train=None, mc_samples=4, data_minibatch=128, num_epochs=100,
    log_every=10, lr0net=1e-3, seed=0, architecture="regressor_net",
    n_hidden=40, n_layers=1, init_sd=1e-6, model_selection=True, **kwargs,
) -> Dict[str, Any]:
    """Regression MFVI with tau grid-search model selection (ref :1066-1169)."""
    data: DataBundle = train
    x, y = jnp.asarray(data.x), jnp.asarray(data.y)
    xv, yv = jnp.asarray(data.xv), jnp.asarray(data.yv)
    xt, yt = jnp.asarray(data.xt), jnp.asarray(data.yt)
    bpe = max(1, data.N // data_minibatch)
    best_tau, best_ll = data.taus[0], -float("inf")
    if model_selection:
        for tau in data.taus:
            m = _MFVI(data, architecture, n_hidden, 1, mc_samples, init_sd,
                      lr0net, data_minibatch, seed, n_layers)
            r = fit(m, x, y, xv, yv, data.y_mean, data.y_std, tau,
                    num_epochs * bpe, log_every=-1,
                    batch_size=data_minibatch, mc_samples=mc_samples)
            if r["lls"][-1] > best_ll:
                best_tau, best_ll = tau, r["lls"][-1]
    m = _MFVI(data, architecture, n_hidden, 1, mc_samples, init_sd,
              lr0net, data_minibatch, seed, n_layers)
    res = fit(m, x, y, xt, yt, data.y_mean, data.y_std, best_tau,
              num_epochs * bpe, log_every=log_every,
              batch_size=data_minibatch, mc_samples=mc_samples)
    res["best_tau"] = best_tau
    return res


def run_mfvi_subset_regressor(
    train=None, mc_samples=4, data_minibatch=128, num_epochs=100,
    log_every=10, lr0net=1e-3, seed=0, num_pseudo=100,
    architecture="regressor_net", n_hidden=40, n_layers=1, init_sd=1e-6,
    model_selection=False, **kwargs,
) -> Dict[str, Any]:
    """Regression MFVI restricted to a random subset (ref :1173-1278)."""
    data: DataBundle = train
    rng = np.random.default_rng(seed)
    idx = rng.choice(data.N, size=min(num_pseudo, data.N), replace=False)
    xs, ys = jnp.asarray(data.x[idx]), jnp.asarray(data.y[idx])
    xv, yv = jnp.asarray(data.xv), jnp.asarray(data.yv)
    xt, yt = jnp.asarray(data.xt), jnp.asarray(data.yt)
    bpe = max(1, data.N // data_minibatch)
    best_tau, best_ll = data.taus[0], -float("inf")
    if model_selection:
        for tau in data.taus:
            m = _MFVI(data, architecture, n_hidden, 1, mc_samples, init_sd,
                      lr0net, data_minibatch, seed, n_layers)
            r = fit(m, xs, ys, xv, yv, data.y_mean, data.y_std, tau,
                    num_epochs * bpe, log_every=-1, mc_samples=mc_samples)
            if r["lls"][-1] > best_ll:
                best_tau, best_ll = tau, r["lls"][-1]
    m = _MFVI(data, architecture, n_hidden, 1, mc_samples, init_sd,
              lr0net, data_minibatch, seed, n_layers)
    res = fit(m, xs, ys, xt, yt, data.y_mean, data.y_std, best_tau,
              num_epochs * bpe, log_every=log_every, mc_samples=mc_samples)
    res["csizes"] = [num_pseudo]
    res["best_tau"] = best_tau
    return res


# ----------------------------------------------------------------------
# selection-based logreg baselines
# ----------------------------------------------------------------------


def run_kmeans(
    x=None, y=None, xt=None, yt=None, num_epochs=100, log_every=10,
    N=None, D=None, seed=0, lr0net=1e-3, nc=2, mc_samples=4,
    inner_it=1000, **kwargs,
) -> Dict[str, Any]:
    """k-means-selected coreset with Laplace evaluation (ref :1348-1423)."""
    key = jax.random.PRNGKey(seed)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    x_aug, xt_aug = _aug(xj), _aug(jnp.asarray(xt))
    ytj = jnp.asarray(yt)
    w = np.zeros(N, np.float32)
    cluster = KmeansCluster(np.asarray(x), np.asarray(y), num_classes=nc, seed=seed)
    accs, nlls, csizes, times = [], [], [], [0.0]
    log_idcs, log_wts = [], []
    t0 = time.time()
    for it in range(num_epochs):
        if it % log_every == 0:
            cluster.set_num_clusters(max(it, 2 * nc))
            cluster.run_kmeans()
            core_idcs = cluster.get_arbitrary_pts(max(it, 1))
            core_arr = jnp.asarray(core_idcs, jnp.int32)
            key, k = jax.random.split(key)
            acc, nll = _eval_laplace(
                k, x_aug[core_arr], yj[core_arr], jnp.asarray(w[core_idcs]),
                xt_aug, ytj, inner_it, mc_samples, lr0net,
            )
            if core_idcs:
                w[core_idcs] = N / len(core_idcs)
            times.append(times[-1] + time.time() - t0)
            accs.append(acc), nlls.append(nll), csizes.append(len(core_idcs))
            log_idcs.append(list(core_idcs)), log_wts.append(w.tolist())
    return {"accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
            "wt_index": _process_wt_index(log_idcs, log_wts)}


def run_el2n_coreset(
    x=None, y=None, xt=None, yt=None, num_epochs=100, log_every=10,
    N=None, D=None, seed=0, lr0net=1e-3, nc=2, mc_samples=4,
    data_minibatch=128, inner_it=1000, **kwargs,
) -> Dict[str, Any]:
    """EL2N-scored coreset from a frequentist pretrain (ref :1427-1510)."""
    key = jax.random.PRNGKey(seed)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    x_aug, xt_aug = _aug(xj), _aug(jnp.asarray(xt))
    ytj = jnp.asarray(yt)
    w = np.zeros(N, np.float32)
    freq = RunFrequentistModel(
        x, y, xt, yt, num_classes=nc, is_logreg=True,
        data_minibatch=data_minibatch, num_epochs=21, seed=seed,
    )
    freq.train()
    accs, nlls, csizes, times = [], [], [], [0.0]
    log_idcs, log_wts = [], []
    t0 = time.time()
    for it in range(num_epochs):
        if it % log_every == 0:
            core_idcs = freq.get_largest_el2n_indices(it)
            core_arr = jnp.asarray(core_idcs, jnp.int32)
            key, k = jax.random.split(key)
            acc, nll = _eval_laplace(
                k, x_aug[core_arr], yj[core_arr], jnp.asarray(w[core_idcs]),
                xt_aug, ytj, inner_it, mc_samples, lr0net,
            )
            if core_idcs:
                w[core_idcs] = N / len(core_idcs)
            times.append(times[-1] + time.time() - t0)
            accs.append(acc), nlls.append(nll), csizes.append(len(core_idcs))
            log_idcs.append(list(core_idcs)), log_wts.append(w.tolist())
    return {"accs": accs, "nlls": nlls, "csizes": csizes, "times": times[1:],
            "wt_index": _process_wt_index(log_idcs, log_wts)}


# ----------------------------------------------------------------------
# selection + MFVI flows (ref baselines.py:1515-1952)
# ----------------------------------------------------------------------


class MfviSelect:
    """Select a coreset by a scoring method, then fit MFVI on the weighted
    subset (ref ``MfviSelect``, baselines.py:1515-1727)."""

    def __init__(self, train=None, data_minibatch=128, num_pseudo=100, nc=2,
                 architecture="logistic_regression", D=None, n_hidden=100,
                 mc_samples=4, init_sd=1e-3, lr0net=1e-3, num_epochs=100,
                 log_every=10, seed=0, mul_fact=2, log_pseudodata=False,
                 score_method="kmeans", pretrain_epochs=5, data_folder=None,
                 load_from_saved=False, distance_fn="euclidean",
                 last_layer_only=False, dnm=None, **kw):
        self.data: DataBundle = train
        self.num_pseudo, self.nc = num_pseudo, nc
        self.architecture, self.D, self.n_hidden = architecture, D or train.D, n_hidden
        self.mc_samples, self.init_sd = mc_samples, init_sd
        self.lr0net, self.num_epochs = lr0net, num_epochs
        self.log_every, self.seed, self.mul_fact = log_every, seed, mul_fact
        self.log_pseudodata = log_pseudodata
        self.score_method = score_method
        self.pretrain_epochs = pretrain_epochs
        self.data_folder, self.load_from_saved = data_folder, load_from_saved
        self.distance_fn, self.last_layer_only = distance_fn, last_layer_only
        self.dnm = dnm
        self.data_minibatch = data_minibatch
        self.wt_index = {}
        self._m = _MFVI(self.data, architecture, n_hidden, nc, mc_samples,
                        init_sd, lr0net, data_minibatch, seed)

    def select_data(self):
        from psvi_tpu.inference.selection import CoresetSelect

        sel = CoresetSelect(
            self.data.x, self.data.y, self.data.xt, self.data.yt,
            num_pseudo=self.num_pseudo, nc=self.nc,
            architecture=self.architecture, D=self.D, n_hidden=self.n_hidden,
            mc_samples=self.mc_samples, init_sd=self.init_sd,
            data_minibatch=self.data_minibatch,
            pretrain_epochs=self.pretrain_epochs, lr0net=self.lr0net,
            seed=self.seed, score_method=self.score_method,
            data_folder=self.data_folder,
            load_from_saved=self.load_from_saved, dnm=self.dnm,
            distance_fn=self.distance_fn,
            last_layer_only=self.last_layer_only,
            n_channels=self.data.channels or 1,
        )
        idx, xs, ys, wts = sel.select_data()
        self.chosen = (idx, jnp.asarray(xs, jnp.float32),
                       jnp.asarray(ys), jnp.asarray(wts))
        self.wt_index = sel.wt_index

    def _test(self, key):
        m = self._m
        xt, yt = jnp.asarray(self.data.xt), jnp.asarray(self.data.yt)
        eps = m.net.sample_eps(key, self.mc_samples)
        logits = m.net.apply(m.params, eps, xt).mean(axis=0)
        pred = jnp.argmax(logits, -1).astype(jnp.float32)
        acc = float(jnp.mean(pred == yt))
        nll = float(jnp.mean(E.categorical_nll(logits[None], yt)[0]))
        return acc, nll

    def evaluate_coreset(self) -> Dict[str, Any]:
        """Weighted-subset MFVI fit: loss = −Σ_m w_m Σ_s ll[s,m] + KL
        (ref :1693-1700: ``wts.dot(log_prob.sum(0))``)."""
        m = self._m
        idx, xs, ys, wts = self.chosen

        @jax.jit
        def step(params, opt_state, key):
            eps = m.net.sample_eps(key, self.mc_samples)

            def loss_fn(p):
                out = m.net.apply(p, eps, xs)
                ll = -E.categorical_nll(out, ys)  # (S, M)
                return -jnp.dot(wts, jnp.sum(ll, axis=0)) + m.net.kl(p)

            loss, g = jax.value_and_grad(loss_fn)(params)
            params, opt_state = m.opt.step(params, g, opt_state)
            return params, opt_state, loss

        accs, nlls, elbos = [], [], []
        total = self.mul_fact * self.num_epochs
        for i in range(total):
            m.key, ks, ke = jax.random.split(m.key, 3)
            m.params, m.opt_state, loss = step(m.params, m.opt_state, ks)
            elbos.append(-float(loss))
            if i % self.log_every == 0:
                acc, nll = self._test(ke)
                accs.append(acc), nlls.append(nll)
        results = {
            "accs": accs, "nlls": nlls, "times": 0, "elbos": elbos,
            "csizes": [self.num_pseudo] * total, "wt_index": self.wt_index,
        }
        if self.log_pseudodata:
            results["us"], results["zs"] = np.asarray(xs), np.asarray(ys)
            results["vs"] = np.asarray(wts).tolist()
        return results


class IncrementalMfviSelect(MfviSelect):
    """Start from a 20-point kmeans coreset, then add one point per step by
    entropy score under the evolving net (ref :1730-1852)."""

    def select_data(self):
        from psvi_tpu.inference.selection import (
            KmeansSelection, RandomIncrementalSelection,
        )

        min_pts = 20
        init_sel = KmeansSelection(
            self.data.x, self.data.y, min_pts, self.nc, self.seed,
            embedding_flag=(self.architecture == "lenet"),
        )
        init_sel.pretrain(
            self.data.xt, self.data.yt, self.architecture, self.D,
            self.n_hidden, self.mc_samples, self.init_sd,
            self.data_minibatch, self.pretrain_epochs, self.lr0net,
            self.data_folder, self.load_from_saved, self.dnm,
            n_channels=self.data.channels or 1,
        )
        idx, xs, ys, wts = init_sel.get_weighted_subset()
        self.chosen = (idx, jnp.asarray(xs, jnp.float32),
                       jnp.asarray(ys), jnp.asarray(wts))
        self.evaluate_coreset()
        core_idc = list(idx)

        inc = RandomIncrementalSelection(
            self.data.x, self.data.y, self.num_pseudo, self.nc, self.seed,
            score_type="entropy",
        )
        orig_epochs = self.num_epochs
        for _ in range(min_pts + 1, self.num_pseudo):
            inc.update_current_state(core_idc, _NetShim(self._m, self.mc_samples))
            ii, xs, ys, wts = inc.get_weighted_subset()
            self.chosen = (ii, jnp.asarray(xs, jnp.float32),
                           jnp.asarray(ys), jnp.asarray(wts))
            core_idc = list(ii)
            self.num_epochs = 10
            self.evaluate_coreset()
        self.num_epochs = orig_epochs
        self.wt_index = {str(k): float(v) for k, v in zip(core_idc, np.asarray(wts))}


class _NetShim:
    """Adapter exposing (net, params, mc_samples) of the evolving MFVI fit
    as a `pretrained_vi` for score computation."""

    def __init__(self, m: "_MFVI", mc_samples):
        self.net = m.net
        self.params = m.params
        self.mc_samples = mc_samples
        self.forgetting_events = None


def run_selection_with_mfvi(
    train=None, mfvi_selection_method="kmeans", **kwargs,
) -> Dict[str, Any]:
    """Dispatcher (ref baselines.py:1855-1952)."""
    cls = (
        IncrementalMfviSelect
        if mfvi_selection_method == "incremental"
        else MfviSelect
    )
    sel = cls(train=train, score_method=mfvi_selection_method, **kwargs)
    sel.select_data()
    return sel.evaluate_coreset()

"""Reproduce the reference's notebook studies end-to-end on psvi_tpu.

The reference's only end-to-end validation is its notebooks
(``psvi/notebooks/*.ipynb`` — SURVEY.md §4): each shells out to
``flow_psvi.py`` with a pinned config, loads the results pickle, and
post-processes. This script reproduces every study through OUR driver
(same flags — the CLI is surface-compatible) and emits the notebook's
headline numbers as JSON into ``results/notebooks/``.

Studies (reference notebook → what it demonstrates):

- ``is_vs_dim``       IS-vs-dim.ipynb: IW diagnostics (NESS, IW entropy)
                      of psvi_alpha_v as the data dimension grows
                      (synth_lr_10/50/200).
- ``fullcov``         full-covariance.ipynb: fn2 (full-covariance VI
                      layers) on halfmoon — mfvi and psvi_learn_v with
                      the hyper (IFT) trainer.
- ``joint``           joint-optimizer.ipynb: single-level joint trainer
                      + retrain_on_coreset on halfmoon fn.
- ``mcmc``            monte-carlo-tuning.ipynb: VI on the learned
                      coreset, then MCMC over the *network weights* on
                      the coreset-weighted likelihood. The reference
                      uses pyro/tyxe NUTS; here it is our own jitted
                      NUTS (ops/nuts.py) on the flattened BNN posterior
                      (the reference's in-repo pystan path ships dead).
- ``incremental``     incremental-learning.ipynb: class-incremental
                      four_blobs with coreset replay
                      (--increment --increment_sizes 10 15 20).

Default configs are scaled (~min-scale smoke on CPU); ``--full`` uses the
notebooks' exact epoch counts (run on TPU).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "results", "notebooks")


def _save(name, payload):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, default=float)
    print(f"[{name}] saved {path}")


def _run(method, dataset, **kw):
    from psvi_tpu.experiments import INF_DICT
    from psvi_tpu.data import read_dataset

    data = read_dataset(dataset)
    kw.setdefault("log_pseudodata", True)
    kw.setdefault("dnm", dataset)
    res = INF_DICT[method](data, **kw)
    return data, res


def study_is_vs_dim(full):
    """IS-vs-dim.ipynb: NESS / IW-entropy vs dimension (psvi_alpha_v,
    M=20, synth_lr_{10,50,200})."""
    epochs = 1401 if full else 301
    trials = 10 if full else 3
    from psvi_tpu.experiments import experiment_driver

    res = experiment_driver(
        ["synth_lr_10", "synth_lr_50", "synth_lr_200"],
        ["psvi_alpha_v"],
        dict(
            architecture="logistic_regression", coreset_sizes=[20],
            num_epochs=epochs, inner_it=50, log_every=20,
            lr0u=1e-3, lr0v=1e-2, lr0net=1e-4, num_trials=trials,
            init_at="subsample", init_sd=1e-3, data_minibatch=128,
            mc_samples=10, compute_weights_entropy=True,
        ),
    )
    out = {}
    for dnm, md in res.items():
        rows = []
        for t, r in md["psvi_alpha_v"][20].items():
            rows.append(
                {
                    "trial": t,
                    "final_acc": r["accs"][-1],
                    "final_ness": r["ness"][-1] if r["ness"] else None,
                    "final_went": r["went"][-1] if r["went"] else None,
                }
            )
        out[dnm] = rows
    _save("is_vs_dim", {"epochs": epochs, "trials": trials, "results": out})
    return out


def study_fullcov(full):
    """full-covariance.ipynb: fn2 halfmoon — mfvi (mc 64) and
    psvi_learn_v with trainer=hyper."""
    e_mfvi = 2501 if full else 501
    e_psvi = 5001 if full else 301
    S = 64 if full else 16
    _, r_mfvi = _run(
        "mfvi", "halfmoon", num_epochs=e_mfvi, log_every=200 if full else 100,
        lr0net=2e-4, n_hidden=50, architecture="fn2", init_sd=1e-10,
        data_minibatch=512, mc_samples=S, seed=0,
    )
    _, r_psvi = _run(
        "psvi_learn_v", "halfmoon", num_epochs=e_psvi,
        inner_it=100 if full else 20, log_every=200 if full else 100,
        lr0u=1e-7, lr0v=1e-7, lr0net=1e-3, n_hidden=50,
        architecture="fn2", init_args="subsample", init_sd=1e-5,
        data_minibatch=128, num_pseudo=64, mc_samples=S,
        trainer="hyper", seed=0,
    )
    payload = {
        "mfvi_final_acc": r_mfvi["accs"][-1],
        "psvi_learn_v_final_acc": r_psvi["accs"][-1],
        "psvi_has_grid_preds": bool(len(r_psvi.get("grid_preds", []))),
        "config": {"mc_samples": S, "epochs": [e_mfvi, e_psvi]},
    }
    _save("fullcov", payload)
    return payload


def study_joint(full):
    """joint-optimizer.ipynb: psvi_alpha_v halfmoon fn, trainer=joint,
    retrain_on_coreset, random init."""
    epochs = 2001 if full else 501
    # notebook-exact --init_at random needs the full 2001 epochs for the
    # randomly-initialized coreset to become summarizing (measured: at 501
    # epochs the retrain phase lands at 0.24 from random init vs 0.84 from
    # subsample init); the smoke config uses subsample
    _, r = _run(
        "psvi_alpha_v", "halfmoon", num_epochs=epochs, inner_it=50,
        log_every=500 if full else 100, lr0u=1e-2, lr0v=1e-1, lr0net=1e-4,
        n_hidden=100, architecture="fn",
        init_args="random" if full else "subsample", init_sd=1e-3,
        data_minibatch=128, num_pseudo=10 if not full else 20,
        trainer="joint", retrain_on_coreset=True, mc_samples=10, seed=0,
    )
    payload = {
        "final_acc": r["accs"][-1],
        "coreset_size": len(r["vs"][-1]) if r.get("vs") else None,
        "epochs": epochs,
    }
    _save("joint", payload)
    return payload


def study_mcmc(full):
    """monte-carlo-tuning.ipynb: (1) psvi_alpha_v learns a coreset on
    halfmoon fn; (2) NUTS over the FLATTENED BNN WEIGHTS on the
    coreset-weighted likelihood (the notebook's pyro/tyxe step, via our
    ops/nuts.py); (3) compare VI vs MCMC coreset predictives and the
    mfvi / mfvi_subset baselines."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from psvi_tpu.ops.nuts import nuts_sample

    epochs = 1001 if full else 301
    h = 100
    M = 30
    data, r = _run(
        "psvi_alpha_v", "halfmoon", num_epochs=epochs, inner_it=50,
        log_every=100, lr0u=1e-2, lr0v=1e-1, lr0net=1e-4,
        n_hidden=h, architecture="fn", init_args="subsample", init_sd=1e-3,
        data_minibatch=128, num_pseudo=M, retrain_on_coreset=True,
        mc_samples=10, seed=0,
    )
    us = np.asarray(r["us"][-1])
    zs = np.asarray(r["zs"][-1]).astype(int)
    vs = np.asarray(r["vs"][-1])
    alpha = float(np.asarray(r.get("alpha", [0.0])).ravel()[-1])
    N = data.N
    w = N * np.exp(alpha) * (np.exp(vs - vs.max()) / np.exp(vs - vs.max()).sum())

    D, nc = us.shape[1], int(data.nc)
    sizes = [(h, D), (h,), (nc, h), (nc,)]
    splits = np.cumsum([int(np.prod(s)) for s in sizes])[:-1]

    x_core = jnp.asarray(us)
    y_core = jnp.asarray(zs)
    w_core = jnp.asarray(np.maximum(w, 0.0), jnp.float32)

    def unflatten(theta):
        parts = jnp.split(theta, splits)
        return [p.reshape(s) for p, s in zip(parts, sizes)]

    def forward(theta, x):
        W1, b1, W2, b2 = unflatten(theta)
        a = jnp.maximum(x @ W1.T + b1, 0.0)
        return a @ W2.T + b2

    def logdensity(theta):
        # coreset-weighted categorical likelihood + N(0,1) weight prior —
        # the BNN analog of the reference's Stan program
        # (psvi/models/logreg.py:46-65)
        logits = forward(theta, x_core)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, y_core[:, None], axis=1)[:, 0]
        return jnp.dot(w_core, ll) - 0.5 * jnp.sum(jnp.square(theta))

    P = int(splits[-1] + nc)
    n_samp = 500 if full else 150
    theta0 = jnp.zeros((P,), jnp.float32)
    samples, info = nuts_sample(
        logdensity, theta0, jax.random.PRNGKey(0),
        num_samples=n_samp, num_warmup=n_samp, max_depth=8,
    )
    # MCMC predictive: average softmax over posterior draws
    xt = jnp.asarray(data.xt)
    probs = jax.vmap(
        lambda th: jax.nn.softmax(forward(th, xt), axis=-1)
    )(samples[:: max(1, n_samp // 100)])
    pred = jnp.mean(probs, axis=0)
    acc_mcmc = float(
        jnp.mean((jnp.argmax(pred, 1) == jnp.asarray(data.yt)).astype(
            jnp.float32
        ))
    )
    payload = {
        "vi_coreset_final_acc": r["accs"][-1],
        "mcmc_coreset_acc": acc_mcmc,
        "nuts_dim": P,
        "nuts_samples": n_samp,
        "epochs": epochs,
    }
    _save("mcmc", payload)
    return payload


def study_incremental(full):
    """incremental-learning.ipynb: class-incremental four_blobs with
    coreset replay (psvi_alpha_v fn, increment_sizes 10 15 20)."""
    epochs = 1201 if full else 303
    interval = 401 if full else 101
    _, r = _run(
        "psvi_alpha_v", "four_blobs", increment=True,
        increment_sizes=(10, 15, 20), increment_interval=interval,
        num_epochs=epochs, inner_it=100 if full else 20,
        log_every=100 if full else 50, lr0u=1e-4, lr0v=1e-3, lr0net=1e-4,
        n_layers=1, n_hidden=80, architecture="fn", init_args="subsample",
        init_sd=1e-4, data_minibatch=128, mc_samples=10, seed=0,
        num_pseudo=10,
    )
    payload = {
        "accs": list(map(float, r["accs"])),
        "csizes": list(map(int, r["csizes"])),
        "final_acc": r["accs"][-1],
        "epochs": epochs,
    }
    _save("incremental", payload)
    return payload


STUDIES = {
    "is_vs_dim": study_is_vs_dim,
    "fullcov": study_fullcov,
    "joint": study_joint,
    "mcmc": study_mcmc,
    "incremental": study_incremental,
}


def main():
    ap = argparse.ArgumentParser()
    # No choices=: for nargs='*' argparse validates the DEFAULT list itself
    # against choices, so running with no study names crashed with
    # "invalid choice" (ADVICE r03). Validate by hand below instead.
    ap.add_argument("studies", nargs="*", default=[],
                    help=f"studies to run (any of: {', '.join(STUDIES)})")
    ap.add_argument("--full", action="store_true",
                    help="notebook-exact epoch counts (TPU scale)")
    args = ap.parse_args()
    bad = [s for s in args.studies if s not in STUDIES]
    if bad:
        ap.error(f"unknown studies {bad}; choose from {list(STUDIES)}")
    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit platform request despite the axon
        # sitecustomize force-registration (same handling as the CLI)
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    for s in args.studies or list(STUDIES):
        print(f"=== {s} ===", flush=True)
        STUDIES[s](args.full)


if __name__ == "__main__":
    main()

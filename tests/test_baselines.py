"""Baseline inference methods: smoke + convergence sanity."""

import numpy as np
import pytest

from psvi_tpu.data import read_dataset, read_regression_dataset
from psvi_tpu.inference import baselines as B


@pytest.fixture(scope="module")
def halfmoon():
    return read_dataset("halfmoon")


@pytest.fixture(scope="module")
def kw(halfmoon):
    d = halfmoon
    return dict(x=d.x, y=d.y, xt=d.xt, yt=d.yt, N=d.N, D=d.D,
                num_epochs=21, log_every=10, mc_samples=4, seed=0)


def test_run_random_grows_and_learns(kw):
    r = B.run_random(**kw)
    assert r["csizes"] == [0, 10, 20]
    assert r["accs"][-1] > 0.6
    # wt_index: one {idx: weight} dict per logged iteration (ref
    # process_wt_index, inference/utils.py:180-192)
    assert len(r["wt_index"][-1]) == 20


def test_run_giga(kw):
    r = B.run_giga(**kw, data_minibatch=128)
    assert len(r["accs"]) == 3
    assert all(np.isfinite(r["nlls"]))


def test_run_giga_every_step_grows_real_coreset(kw):
    """giga_growth='every_step' (paper-correct, Campbell & Broderick 2018)
    runs a greedy step every iteration against the fixed full-data target
    (repeat picks refine weights, so unique points grow sub-linearly); the
    reference-faithful 'log_every' mode is capped at ~num_epochs/log_every
    greedy steps by the reference's indentation defect (ref
    baselines.py:326-398)."""
    r_ref = B.run_giga(**kw, data_minibatch=128, giga_growth="log_every")
    r_fix = B.run_giga(**kw, data_minibatch=128, giga_growth="every_step")
    assert r_fix["csizes"][-1] > r_ref["csizes"][-1]
    assert all(np.isfinite(r_fix["nlls"]))
    with pytest.raises(ValueError, match="giga_growth"):
        B.run_giga(**kw, giga_growth="sometimes")


def test_run_sparsevi(kw):
    r = B.run_sparsevi(**kw, data_minibatch=128, inner_it=20, outer_it=5)
    assert r["accs"][-1] > 0.6
    assert r["csizes"][-1] > 0


def test_run_opsvi(kw):
    r = B.run_opsvi(**kw, data_minibatch=128, num_pseudo=10, inner_it=20)
    assert len(r["accs"]) == 3
    assert all(np.isfinite(r["nlls"]))


def test_run_kmeans(kw):
    r = B.run_kmeans(**kw, nc=2)
    assert len(r["accs"]) == 3


def test_run_el2n(kw):
    r = B.run_el2n_coreset(**kw, nc=2)
    assert len(r["accs"]) == 3


def test_run_mfvi(halfmoon):
    r = B.run_mfvi(train=halfmoon, architecture="fn", n_hidden=20, nc=2,
                   num_epochs=30, log_every=10, mc_samples=4, init_sd=1e-3)
    assert r["accs"][-1] > 0.75
    assert len(r["elbos"]) == 60  # mul_fact=2


def test_run_mfvi_subset(halfmoon):
    r = B.run_mfvi_subset(train=halfmoon, architecture="fn", n_hidden=20,
                          nc=2, num_epochs=30, log_every=10, mc_samples=4,
                          num_pseudo=20, init_sd=1e-3, log_pseudodata=True)
    assert r["accs"][-1] > 0.75
    assert r["us"].shape == (20, 2)
    assert r["csizes"][0] == 20


def test_mfvi_regressor_model_selection():
    rd = read_regression_dataset("sinus")
    r = B.run_mfvi_regressor(train=rd, num_epochs=3, log_every=5,
                             model_selection=True, mc_samples=4)
    assert r["best_tau"] in rd.taus
    assert all(np.isfinite(r["rmses"]))


def test_mfvi_subset_regressor():
    rd = read_regression_dataset("sinus")
    r = B.run_mfvi_subset_regressor(train=rd, num_epochs=3, log_every=5,
                                    num_pseudo=50, mc_samples=4)
    assert r["csizes"] == [50]
    assert all(np.isfinite(r["lls"]))


def test_laplace_fit_quality():
    """MAP+Laplace on a separable logreg problem recovers signal."""
    import jax
    import jax.numpy as jnp
    from psvi_tpu.models import logreg as LR

    rng = np.random.default_rng(0)
    X = rng.standard_normal((400, 2)).astype(np.float32)
    yy = (X @ np.array([2.0, -1.0]) > 0).astype(np.float32)
    Xa = jnp.concatenate([jnp.asarray(X), jnp.ones((400, 1))], axis=1)
    acc, nll = LR.evaluate_coreset_laplace(
        jax.random.PRNGKey(0), Xa, jnp.asarray(yy), jnp.ones(400),
        Xa, jnp.asarray(yy), inner_it=2000, mc_samples=8,
    )
    assert float(acc) > 0.9

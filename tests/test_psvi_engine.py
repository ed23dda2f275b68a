"""End-to-end engine tests: convergence on halfmoon, all trainers/variants,
lifecycle features (reset/prune/increment/retrain)."""

import numpy as np
import pytest

import jax

from psvi_tpu.data import read_dataset, read_regression_dataset
from psvi_tpu.inference import run_psvi
from psvi_tpu.inference.psvi import PSVI
from psvi_tpu.utils.config import METHOD_SPECS


@pytest.fixture(scope="module")
def halfmoon():
    return read_dataset("halfmoon")


def _quick(data, method="psvi_learn_v", **kw):
    kw.setdefault("num_pseudo", 10)
    kw.setdefault("mc_samples", 4)
    kw.setdefault("architecture", "logistic_regression")
    kw.setdefault("inner_it", 5)
    kw.setdefault("num_epochs", 11)
    kw.setdefault("data_minibatch", 64)
    kw.setdefault("log_every", 5)
    kw.setdefault("init_sd", 1e-3)
    return run_psvi(data, method=method, **kw)


def test_halfmoon_convergence(halfmoon):
    """PR-1 config: accuracy well above chance, NLL decreasing."""
    res = _quick(
        halfmoon, num_epochs=41, inner_it=10, lr0u=1e-2, lr0v=1e-1,
        log_every=20,
    )
    assert res["accs"][-1] > 0.80
    assert res["nlls"][-1] < res["nlls"][0]
    assert len(res["times"]) == len(res["accs"])
    # results-dict schema parity (ref psvi_classes.py:1009-1027)
    for k in ["accs", "nlls", "csizes", "times", "went", "ness", "vent", "vs",
              "avg_epoch_time", "gpu_memory", "chosen_indices"]:
        assert k in res


@pytest.mark.parametrize("trainer", ["nested", "joint", "alternating", "hyper"])
def test_trainers_run(halfmoon, trainer):
    res = _quick(halfmoon, trainer=trainer, hyper_K=3)
    assert len(res["accs"]) == 3
    assert all(np.isfinite(res["nlls"]))


@pytest.mark.parametrize(
    "method",
    [m for m, s in METHOD_SPECS.items() if not s.regressor and not s.evaluate_only],
)
def test_method_variants_run(halfmoon, method):
    res = _quick(halfmoon, method=method)
    assert all(np.isfinite(res["accs"]))
    assert res["accs"][-1] > 0.4  # above chance-ish after a few steps


def test_learn_z_runs(halfmoon):
    res = _quick(halfmoon, learn_z=True, num_epochs=6)
    assert all(np.isfinite(res["accs"]))


def test_psvi_evaluate_method(halfmoon):
    """PSVIEvaluate: net-only training, everything else frozen
    (ref psvi_classes.py:1885-1934)."""
    from psvi_tpu.inference.psvi import PSVI

    eng = PSVI(
        halfmoon, method="psvi_evaluate", num_pseudo=8, mc_samples=4,
        architecture="logistic_regression", inner_it=3, num_epochs=6,
        data_minibatch=64, log_every=3, init_sd=1e-3,
    )
    u0, v0 = np.asarray(eng.state.u), np.asarray(eng.state.v)
    res = eng.run_psvi()
    assert all(np.isfinite(res["accs"]))
    # coreset untouched; only the net trained
    np.testing.assert_array_equal(np.asarray(eng.state.u), u0)
    np.testing.assert_array_equal(np.asarray(eng.state.v), v0)


def test_bnn_fn_architecture(halfmoon):
    res = _quick(
        halfmoon, method="psvi_alpha_v", architecture="fn", n_hidden=20,
        num_epochs=16,
    )
    assert all(np.isfinite(res["accs"]))


def test_fullcov_fn2_architecture(halfmoon):
    res = _quick(
        halfmoon, method="psvi_alpha_v", architecture="fn2", n_hidden=8,
        num_epochs=6, mc_samples=4,
    )
    assert all(np.isfinite(res["accs"]))


def test_fullcov_fn2_hyper_trainer(halfmoon):
    """SURVEY §7 stage 4: IFT trainer with the full-covariance net."""
    res = _quick(
        halfmoon, method="psvi_alpha_v", architecture="fn2", n_hidden=6,
        num_epochs=6, mc_samples=4, trainer="hyper", hyper_K=3,
    )
    assert all(np.isfinite(res["accs"]))


def test_reset_and_retrain(halfmoon):
    res = _quick(halfmoon, reset=True, reset_interval=5,
                 retrain_on_coreset=True, num_epochs=6)
    # retrain doubles the eval series
    assert len(res["accs"]) == 4


def test_prune(halfmoon):
    eng = PSVI(
        halfmoon, method="psvi_learn_v", num_pseudo=10, mc_samples=4,
        architecture="logistic_regression", inner_it=3, num_epochs=12,
        data_minibatch=64, log_every=6, init_sd=1e-3,
        prune=True, prune_interval=5, prune_sizes=(5,),
    )
    res = eng.run_psvi()
    assert eng.num_pseudo == 5
    assert eng.state.u.shape[0] == 5
    assert all(np.isfinite(res["accs"]))


def test_increment():
    data = read_dataset("four_blobs")
    eng = PSVI(
        data, method="psvi_learn_v", num_pseudo=6, mc_samples=4,
        architecture="logistic_regression", inner_it=3, num_epochs=16,
        data_minibatch=64, log_every=8, init_sd=1e-3,
        increment=True, increment_interval=5, increment_sizes=(6, 9, 12),
    )
    res = eng.run_psvi()
    assert eng.nc == 4
    assert eng.state.u.shape[0] == 12
    assert all(np.isfinite(res["accs"]))


def test_truncated_nested(halfmoon):
    res = _quick(halfmoon, truncated=True, truncated_K=2, inner_it=5)
    assert all(np.isfinite(res["accs"]))


def test_regressor_sinus():
    rdata = read_regression_dataset("sinus")
    res = run_psvi(
        rdata, method="psvi_alpha_v_regressor", num_pseudo=10, mc_samples=4,
        architecture="regressor_net", n_hidden=20, inner_it=5, num_epochs=21,
        data_minibatch=64, log_every=10, init_sd=1e-3, tau=1.0,
    )
    assert res["rmses"][-1] < res["rmses"][0]
    assert all(np.isfinite(res["lls"]))


def test_pred_on_grid(halfmoon):
    eng = PSVI(
        halfmoon, method="psvi_learn_v", num_pseudo=10, mc_samples=4,
        architecture="logistic_regression", inner_it=3, num_epochs=3,
        data_minibatch=64, log_every=2, init_sd=1e-3,
    )
    eng.run_psvi()
    grid = eng.pred_on_grid(n_test_per_dim=10)
    assert grid.shape == (2, 100)
    np.testing.assert_allclose(grid.sum(0), 1.0, atol=1e-4)


def test_deterministic_same_seed(halfmoon):
    r1 = _quick(halfmoon, seed=3, num_epochs=6)
    r2 = _quick(halfmoon, seed=3, num_epochs=6)
    np.testing.assert_allclose(r1["accs"], r2["accs"])
    np.testing.assert_allclose(r1["nlls"], r2["nlls"])


def test_profile_dir_writes_trace(tmp_path):
    """profile_dir wraps the run in a jax.profiler trace (SURVEY §5
    tracing/profiling TPU equivalent)."""
    import glob

    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_learn_v", num_pseudo=5, mc_samples=4,
               inner_it=2, num_epochs=3, log_every=2, init_sd=1e-3,
               profile_dir=str(tmp_path / "trace"))
    res = eng.run_psvi()
    assert len(res["accs"]) == 2
    assert glob.glob(str(tmp_path / "trace" / "**" / "*.trace.json.gz"),
                     recursive=True)


def test_inner_unroll_same_numerics():
    """lax.scan unroll is a scheduling knob — results must be identical."""
    import jax

    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    kw = dict(method="psvi_learn_v", num_pseudo=5, mc_samples=4,
              inner_it=4, num_epochs=1, log_every=10, init_sd=1e-3, seed=0)
    e1 = PSVI(data, inner_unroll=1, **kw)
    e2 = PSVI(data, inner_unroll=4, **kw)
    k = jax.random.PRNGKey(7)
    s1, _ = e1._step(e1.state, k)
    s2, _ = e2._step(e2.state, k)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        assert jax.numpy.allclose(a, b, atol=1e-6), "unroll changed numerics"


def test_init_dataset_pool():
    """init_dataset substitutes the subsample-init pool (ref :115,234)."""
    import numpy as np

    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    pool_x = np.full((40, 2), 7.0, np.float32)
    pool_y = np.asarray([0.0, 1.0] * 20, np.float32)
    eng = PSVI(data, method="psvi_learn_v", num_pseudo=4, mc_samples=4,
               inner_it=2, num_epochs=1, log_every=10, init_sd=1e-3,
               seed=0, init_dataset=(pool_x, pool_y))
    assert np.allclose(np.asarray(eng.state.u), 7.0)


def test_psvi_evaluate_uses_softmax_weights():
    """PSVIEvaluate's f = exp(alpha)·softmax(v) with alpha fixed
    (ref psvi_classes.py:1896-1901) — raw-v weighting was a bug."""
    import jax.numpy as jnp

    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_evaluate", num_pseudo=5, mc_samples=4,
               inner_it=2, num_epochs=1, log_every=10, init_sd=1e-3, seed=0)
    v = jnp.asarray([1.0, -2.0, 0.5, 0.0, 3.0])
    alpha = jnp.asarray([0.7])
    cw, fv = eng._core_weights(v, alpha)
    expect = jnp.exp(alpha[0]) * jax.nn.softmax(v)
    assert jnp.allclose(fv, expect)
    assert jnp.allclose(cw, eng.N * expect)
    assert (fv > 0).all()


def test_joint_trainer_prune_runs(halfmoon):
    """prune under the joint trainer must re-init opt_joint's moment trees
    to the new coreset shape (regression: shape-mismatch crash)."""
    from psvi_tpu.inference.psvi import PSVI

    eng = PSVI(halfmoon, method="psvi_learn_v", num_pseudo=8, mc_samples=4,
               trainer="joint", num_epochs=5, log_every=2, init_sd=1e-3,
               seed=0, prune=True, prune_interval=2, prune_sizes=[4])
    res = eng.run_psvi()
    assert res["csizes"][-1] == 4
    assert all(np.isfinite(res["accs"]))

"""Tests for the fused bilevel nested-step megakernel (ops/fused_nested.py).

Three layers of verification:

1. the pure-jnp core (`backend='xla'`) against the ENGINE's own nested
   ``outer`` closure (``jax.value_and_grad`` through ``_run_inner``) on
   identical eps streams — catches math mismatches;
2. the Pallas kernel in interpreter mode against the XLA core — catches
   kernel-plumbing bugs (real Mosaic lowering is covered in
   ``test_pallas.py`` under ``PSVI_TPU_TESTS=1``);
3. the engine end-to-end: 20 chained steps with ``fused_inner=True``
   track the plain path's full state within f32 drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI
from psvi_tpu.ops.fused_nested import fused_nested_outer, supports

ENGINE_KW = dict(
    num_pseudo=20, mc_samples=6, architecture="logistic_regression",
    inner_it=5, num_epochs=1, data_minibatch=64, log_every=1000,
    init_sd=1e-3, seed=0,
)


def _fused_args(eng, key):
    """Build the fused op's inputs from an engine, with the SAME eps
    streams the engine's ``_nested_step`` would draw from ``key`` —
    reusing the engine's own flattening helpers."""
    state = eng.state
    k_batch, k_inner, k_outer = jax.random.split(key, 3)
    xb, yb = eng._sample_batch(k_batch)
    lr_now = eng.lr_net_sched(state.net_step)
    T, S, nc = eng.inner_it, eng.mc_samples, eng.nc
    M = eng.num_pseudo
    cfg = eng._fused_cfg(xb.shape[0])
    didx = eng._fused_dense_idx()
    L = len(didx)
    widths = cfg.widths

    # replicate _nested_step_fused's flattening (sample-major hidden,
    # class-major last) without jit
    def flat_w(e, lyr, lead=()):
        n = int(np.prod(lead, dtype=int)) if lead else 1
        if lyr == L - 1:
            perm = tuple(range(len(lead))) + (
                len(lead) + 1, len(lead), len(lead) + 2,
            )
            e = jnp.transpose(e, perm)
        return e.reshape(n * S * widths[lyr + 1], widths[lyr])

    def flat_b(e, lyr, lead=()):
        n = int(np.prod(lead, dtype=int)) if lead else 1
        if lyr == L - 1:
            perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead))
            e = jnp.transpose(e, perm)
        return e.reshape(n * S * widths[lyr + 1], 1)

    keys = jax.random.split(k_inner, max(T, 1))
    eps_ts = [eng.net.sample_eps(k, S) for k in keys[:T]]
    eps_wi = tuple(
        jnp.concatenate([flat_w(e[i]["w"], lyr) for e in eps_ts], 0)
        for lyr, i in enumerate(didx)
    )
    eps_bi = tuple(
        jnp.concatenate([flat_b(e[i]["b"], lyr) for e in eps_ts], 0)
        for lyr, i in enumerate(didx)
    )
    eo = eng.net.sample_eps(k_outer, S)
    eps_wo = tuple(flat_w(eo[i]["w"], lyr) for lyr, i in enumerate(didx))
    eps_bo = tuple(flat_b(eo[i]["b"], lyr) for lyr, i in enumerate(didx))

    params0 = []
    for lyr, i in enumerate(didx):
        p = state.params[i]
        out = widths[lyr + 1]
        params0 += [
            p["mu_w"], p["rho_w"],
            p["mu_b"].reshape(out, 1), p["rho_b"].reshape(out, 1),
        ]
    if eng.likelihood == "gaussian":
        ypse = state.z.reshape(1, M)
        ybat = yb.reshape(1, xb.shape[0])
    else:
        ypse = jax.nn.one_hot(state.z.astype(jnp.int32), nc).T
        ybat = jax.nn.one_hot(yb.astype(jnp.int32), nc).T
    args = (
        tuple(params0),
        state.u, state.v.reshape(1, M), state.alpha.reshape(1, 1),
        ypse, ybat,
        eps_wi, eps_bi, eps_wo, eps_bo,
        xb, jnp.asarray(lr_now, jnp.float32).reshape(1, 1),
    )
    return args, cfg, (k_batch, k_inner, k_outer), (xb, yb)


def _engine_outer(eng, k_inner, k_outer, xb, yb):
    """The engine's nested ``outer`` closure + grads (ref nested_step
    :541-600) — the oracle the fused op must reproduce."""
    state = eng.state
    lr_now = eng.lr_net_sched(state.net_step)
    hyper = eng._hyper_tree(state)

    def outer(h):
        u = h.get("u", state.u)
        v = h.get("v", state.v)
        z = h.get("z", state.z)
        alpha = h.get("alpha", state.alpha)
        paramsT, _, inner_losses = eng._run_inner(
            state.params, u, z, v, alpha, k_inner, lr_now
        )
        eps = eng._sample_eps(k_outer, eng.mc_samples)
        loss = eng._outer_loss(paramsT, eps, u, z, v, alpha, xb, yb)
        return loss, (paramsT, inner_losses)

    return jax.value_and_grad(outer, has_aux=True)(hyper), hyper


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.mark.parametrize(
    "method,dataset,arch",
    [
        ("psvi_learn_v", "halfmoon", "logistic_regression"),
        ("psvi", "halfmoon", "logistic_regression"),
        ("psvi_alpha_v", "halfmoon", "logistic_regression"),
        # nc=4 multiclass: exercises the per-class loops
        ("psvi_learn_v", "four_blobs", "logistic_regression"),
        # fn BNN (D→40→nc MLP): exercises the block-diagonal hidden layer
        ("psvi_learn_v", "halfmoon", "fn"),
        ("psvi_learn_v", "four_blobs", "fn"),
    ],
)
def test_fused_core_matches_engine_outer(method, dataset, arch):
    data = read_dataset(dataset)
    eng = PSVI(data, method=method, fused_inner=False,
               **{**ENGINE_KW, "architecture": arch})
    assert supports(eng)
    key = jax.random.PRNGKey(3)
    args, cfg, (k_batch, k_inner, k_outer), (xb, yb) = _fused_args(eng, key)
    loss, il, pT, g_u, g_v, g_alpha, g_z = fused_nested_outer(
        *args, cfg, backend="xla"
    )
    ((ref_loss, (ref_pT, ref_il)), ref_grads), hyper = _engine_outer(
        eng, k_inner, k_outer, xb, yb
    )
    assert np.isclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(il, ref_il, rtol=2e-5)
    didx = eng._fused_dense_idx()
    for lyr, i in enumerate(didx):
        np.testing.assert_allclose(
            pT[4 * lyr], ref_pT[i]["mu_w"], rtol=2e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            pT[4 * lyr + 2].ravel(), ref_pT[i]["mu_b"], rtol=2e-4, atol=1e-6
        )
    if "u" in ref_grads:
        assert _cos(g_u, ref_grads["u"]) > 0.999
        np.testing.assert_allclose(
            g_u, ref_grads["u"],
            atol=2e-5 * float(1.0 + np.abs(ref_grads["u"]).max()),
        )
    if "v" in ref_grads:
        assert _cos(g_v, ref_grads["v"]) > 0.999
    if "alpha" in ref_grads:
        # α multiplies ALL core weights, so ∂/∂α is a sum of N-scaled
        # terms with heavy cancellation: in f32 BOTH stacks return the
        # same few-% reassociation-noise value (verified: in f64 the two
        # paths agree to 1.6e-4 rel while the f32 value differs from the
        # f64 truth by >100%). Compare loosely in f32.
        assert np.isclose(
            float(g_alpha.ravel()[0]), float(ref_grads["alpha"][0]),
            rtol=0.05, atol=1e-6,
        )


def test_fused_core_matches_engine_outer_regressor():
    """Gaussian likelihood (regressor family, ref psvi_classes.py:1940-
    2335): nested trainer on a D→20→1 regressor_net."""
    from psvi_tpu.data import read_regression_dataset
    from psvi_tpu.inference.psvi import PSVIRegressor

    rdata = read_regression_dataset("sinus")
    eng = PSVIRegressor(
        rdata, method="psvi_alpha_v_regressor", num_pseudo=12, mc_samples=5,
        architecture="regressor_net", n_hidden=20, inner_it=4, num_epochs=1,
        data_minibatch=32, log_every=1000, init_sd=1e-3, tau=1.0, seed=0,
        fused_inner=False,
    )
    assert supports(eng)
    key = jax.random.PRNGKey(11)
    args, cfg, (k_batch, k_inner, k_outer), (xb, yb) = _fused_args(eng, key)
    assert cfg.likelihood == "gaussian"
    loss, il, pT, g_u, g_v, g_alpha, g_z = fused_nested_outer(
        *args, cfg, backend="xla"
    )
    ((ref_loss, (ref_pT, ref_il)), ref_grads), hyper = _engine_outer(
        eng, k_inner, k_outer, xb, yb
    )
    assert np.isclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(il, ref_il, rtol=2e-5)
    assert _cos(g_u, ref_grads["u"]) > 0.999
    assert _cos(g_v, ref_grads["v"]) > 0.999
    assert _cos(g_z, ref_grads["z"]) > 0.999


@pytest.mark.parametrize("arch", ["logistic_regression", "fn"])
def test_fused_interpret_matches_xla(arch):
    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_learn_v", fused_inner=False,
               **{**ENGINE_KW, "architecture": arch})
    args, cfg, _, _ = _fused_args(eng, jax.random.PRNGKey(5))
    out_x = fused_nested_outer(*args, cfg, backend="xla")
    out_p = fused_nested_outer(*args, cfg, backend="pallas", interpret=True)
    assert np.isclose(float(out_x[0]), float(out_p[0]), rtol=1e-6)
    np.testing.assert_allclose(out_x[1], out_p[1], rtol=1e-6)
    for a, b in zip(out_x[2], out_p[2]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(out_x[3], out_p[3], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(out_x[4], out_p[4], rtol=1e-4, atol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["logistic_regression", "fn"])
def test_engine_fused_trajectory_tracks_plain(arch):
    data = read_dataset("halfmoon")
    kw = {**ENGINE_KW, "architecture": arch}
    e1 = PSVI(data, method="psvi_learn_v", fused_inner=False, **kw)
    # fused_eps='stream' reproduces the plain path's eps stream exactly;
    # the default 'batched' is statistically identical but a different
    # stream (and ~100 us/step cheaper on TPU)
    e2 = PSVI(data, method="psvi_learn_v", fused_inner=True,
              fused_eps="stream", **kw)
    key = jax.random.PRNGKey(7)
    s1, l1 = e1._multi_step(e1.state, key, 20)
    s2, l2 = e2._multi_step(e2.state, key, 20)
    np.testing.assert_allclose(s1.u, s2.u, atol=5e-4)
    np.testing.assert_allclose(s1.v, s2.v, atol=5e-4)
    didx = e1._fused_dense_idx()
    np.testing.assert_allclose(
        s1.params[didx[0]]["mu_w"], s2.params[didx[0]]["mu_w"], atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4)


@pytest.mark.slow
def test_engine_fused_batched_eps_converges():
    """Default fused_eps='batched' is a different (but iid-identical)
    noise stream: trajectories diverge bitwise, so compare training
    QUALITY — final chained-loss levels within noise of the plain path."""
    data = read_dataset("halfmoon")
    e1 = PSVI(data, method="psvi_learn_v", fused_inner=False, **ENGINE_KW)
    e2 = PSVI(data, method="psvi_learn_v", fused_inner=True, **ENGINE_KW)
    key = jax.random.PRNGKey(9)
    _, l1 = e1._multi_step(e1.state, key, 150)
    _, l2 = e2._multi_step(e2.state, key, 150)
    tail1 = float(np.mean(np.asarray(l1)[-20:]))
    tail2 = float(np.mean(np.asarray(l2)[-20:]))
    assert abs(tail1 - tail2) / abs(tail1) < 0.05


def test_supports_gating():
    data = read_dataset("halfmoon")
    # fn2 (full-covariance layers) → unsupported
    eng = PSVI(data, method="psvi_alpha_v", fused_inner=False,
               **{**ENGINE_KW, "architecture": "fn2"})
    assert not supports(eng)
    with pytest.raises(ValueError):
        PSVI(data, method="psvi_alpha_v", fused_inner=True,
             **{**ENGINE_KW, "architecture": "fn2"})
    # hyper trainer → unsupported
    eng = PSVI(data, method="psvi_learn_v", trainer="hyper",
               fused_inner=False, **ENGINE_KW)
    assert not supports(eng)
    # learn_z → unsupported
    eng = PSVI(data, method="psvi_learn_v", learn_z=True,
               fused_inner=False, **ENGINE_KW)
    assert not supports(eng)
    # supported config resolves to the fused step only on TPU under 'auto'
    eng = PSVI(data, method="psvi_learn_v", fused_inner="auto", **ENGINE_KW)
    assert supports(eng)
    expect = "dense" if jax.default_backend() == "tpu" else None
    assert eng._use_fused_inner() == expect


def test_fused_force_raises_for_non_nested_trainer():
    """fused_inner=True must raise for ANY unsupported config, including
    non-nested trainers (the trainer guard must not short-circuit past
    the force check — ADVICE r03)."""
    data = read_dataset("halfmoon")
    with pytest.raises(ValueError):
        PSVI(data, method="psvi_learn_v", trainer="joint",
             fused_inner=True, **ENGINE_KW)
    with pytest.raises(ValueError):
        PSVI(data, method="psvi_learn_v", trainer="hyper",
             fused_inner=True, **ENGINE_KW)


def test_supports_rejects_nonuniform_prior_sd():
    """FusedCfg carries one prior_sd; mixed per-layer priors must fall
    back to the XLA path (ADVICE r03)."""
    import dataclasses as dc

    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_learn_v", fused_inner=False,
               **{**ENGINE_KW, "architecture": "fn"})
    assert supports(eng)
    layers = list(eng.net.layers)
    last = layers[-1]
    layers[-1] = dc.replace(last, prior_sd=2.0 * last.prior_sd)
    eng.net = dc.replace(eng.net, layers=tuple(layers))
    assert not supports(eng)


def test_supports_rejects_trial_vmap():
    """The trial-parallel runner wraps the step in jax.vmap; the fused
    pallas path is excluded there (ADVICE r03, parallel/trials.py)."""
    from psvi_tpu.parallel.trials import TrialParallelPSVI

    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_learn_v", fused_inner=False, **ENGINE_KW)
    assert supports(eng)
    eng._in_trial_vmap = True
    assert not supports(eng)

    kw = {k: v for k, v in ENGINE_KW.items() if k != "seed"}
    runner = TrialParallelPSVI(
        data, num_trials=2, method="psvi_learn_v", **kw
    )
    # the runner's step resolves to the plain nested step even where the
    # config itself is fused-eligible
    assert runner.base._trainer_fn() == runner.base._nested_step

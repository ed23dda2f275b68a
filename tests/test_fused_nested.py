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
from psvi_tpu.ops.fused_nested import (
    FusedCfg,
    fused_nested_outer,
    supports,
)

ENGINE_KW = dict(
    num_pseudo=20, mc_samples=6, architecture="logistic_regression",
    inner_it=5, num_epochs=1, data_minibatch=64, log_every=1000,
    init_sd=1e-3, seed=0,
)


def _class_major_w(e, S, nc, D):
    return jnp.transpose(e, (1, 0, 2)).reshape(nc * S, D)


def _class_major_b(e, S, nc):
    return jnp.transpose(e, (1, 0)).reshape(nc * S, 1)


def _fused_args(eng, key):
    """Build the fused op's inputs from an engine, with the SAME eps
    streams the engine's ``_nested_step`` would draw from ``key``."""
    state = eng.state
    k_batch, k_inner, k_outer = jax.random.split(key, 3)
    xb, yb = eng._sample_batch(k_batch)
    lr_now = eng.lr_net_sched(state.net_step)
    T, S, nc, D = eng.inner_it, eng.mc_samples, eng.nc, eng.D
    M, B = eng.num_pseudo, xb.shape[0]
    keys = jax.random.split(k_inner, max(T, 1))
    eps_ts = [eng.net.sample_eps(k, S) for k in keys[:T]]
    eps_wi = jnp.concatenate(
        [_class_major_w(e[0]["w"], S, nc, D) for e in eps_ts], 0
    )
    eps_bi = jnp.concatenate(
        [_class_major_b(e[0]["b"], S, nc) for e in eps_ts], 0
    )
    eo = eng.net.sample_eps(k_outer, S)
    p0 = state.params[0]
    cfg = FusedCfg(
        T=T, S=S, nc=nc, D=D, M=M, B=B, N=float(eng.N),
        parameterised=eng.spec.parameterised,
        use_alpha=eng.spec.learn_alpha or eng.spec.alpha_fixed,
        use_bias=True, prior_sd=1.0,
    )
    args = (
        p0["mu_w"], p0["rho_w"],
        p0["mu_b"].reshape(nc, 1), p0["rho_b"].reshape(nc, 1),
        state.u, state.v.reshape(1, M), state.alpha.reshape(1, 1),
        jax.nn.one_hot(state.z.astype(jnp.int32), nc).T,
        jax.nn.one_hot(yb.astype(jnp.int32), nc).T,
        eps_wi, eps_bi,
        _class_major_w(eo[0]["w"], S, nc, D),
        _class_major_b(eo[0]["b"], S, nc),
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
    "method,dataset",
    [
        ("psvi_learn_v", "halfmoon"),
        ("psvi", "halfmoon"),
        ("psvi_alpha_v", "halfmoon"),
        ("psvi_learn_v", "four_blobs"),  # nc=4: multiclass class loops
    ],
)
def test_fused_core_matches_engine_outer(method, dataset):
    data = read_dataset(dataset)
    eng = PSVI(data, method=method, fused_inner=False, **ENGINE_KW)
    assert supports(eng)
    key = jax.random.PRNGKey(3)
    args, cfg, (k_batch, k_inner, k_outer), (xb, yb) = _fused_args(eng, key)
    loss, il, pT, g_u, g_v, g_alpha = fused_nested_outer(
        *args, cfg, backend="xla"
    )
    ((ref_loss, (ref_pT, ref_il)), ref_grads), hyper = _engine_outer(
        eng, k_inner, k_outer, xb, yb
    )
    assert np.isclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(il, ref_il, rtol=2e-5)
    np.testing.assert_allclose(pT[0], ref_pT[0]["mu_w"], rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(
        pT[2].ravel(), ref_pT[0]["mu_b"], rtol=2e-4, atol=1e-7
    )
    if "u" in ref_grads:
        assert _cos(g_u, ref_grads["u"]) > 0.9999
        np.testing.assert_allclose(
            g_u, ref_grads["u"], atol=2e-5 * float(np.abs(ref_grads["u"]).max() + 1)
        )
    if "v" in ref_grads:
        assert _cos(g_v, ref_grads["v"]) > 0.9999
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


def test_fused_interpret_matches_xla():
    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_learn_v", fused_inner=False, **ENGINE_KW)
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
def test_engine_fused_trajectory_tracks_plain():
    data = read_dataset("halfmoon")
    e1 = PSVI(data, method="psvi_learn_v", fused_inner=False, **ENGINE_KW)
    e2 = PSVI(data, method="psvi_learn_v", fused_inner=True, **ENGINE_KW)
    key = jax.random.PRNGKey(7)
    s1, l1 = e1._multi_step(e1.state, key, 20)
    s2, l2 = e2._multi_step(e2.state, key, 20)
    np.testing.assert_allclose(s1.u, s2.u, atol=5e-4)
    np.testing.assert_allclose(s1.v, s2.v, atol=5e-4)
    np.testing.assert_allclose(
        s1.params[0]["mu_w"], s2.params[0]["mu_w"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), rtol=1e-4
    )


def test_supports_gating():
    data = read_dataset("halfmoon")
    # fn BNN: multi-layer → unsupported
    eng = PSVI(data, method="psvi_learn_v", fused_inner=False,
               **{**ENGINE_KW, "architecture": "fn"})
    assert not supports(eng)
    with pytest.raises(ValueError):
        PSVI(data, method="psvi_learn_v", fused_inner=True,
             **{**ENGINE_KW, "architecture": "fn"})._use_fused_inner()
    # hyper trainer → unsupported
    eng = PSVI(data, method="psvi_learn_v", trainer="hyper",
               fused_inner=False, **ENGINE_KW)
    assert not supports(eng)
    # supported config resolves to the fused step only on TPU under 'auto'
    eng = PSVI(data, method="psvi_learn_v", fused_inner="auto", **ENGINE_KW)
    assert supports(eng)
    assert eng._use_fused_inner() == (jax.default_backend() == "tpu")

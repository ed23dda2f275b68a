"""Pallas kernel tests.

Correctness of the fused sampled-linear kernels vs the XLA reference
formulation. These lower through Mosaic and therefore only run on a real
TPU (skipped on the CPU test mesh); run `python -m pytest tests/test_pallas.py`
with JAX_PLATFORMS unset on a TPU host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.ops import pallas_vi as PV

on_tpu = PV.pallas_available() and jax.devices()[0].platform in ("tpu", "axon")
needs_tpu = pytest.mark.skipif(not on_tpu, reason="requires TPU for Mosaic")


def _args(S=6, N=64, Din=32, Dout=16, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    return (
        jax.random.normal(ks[0], (S, N, Din)),
        jax.random.normal(ks[1], (Dout, Din)) * 0.1,
        jax.random.normal(ks[2], (Dout, Din)) * 0.1 - 3,
        jax.random.normal(ks[3], (Dout,)) * 0.1,
        jax.random.normal(ks[4], (Dout,)) * 0.1 - 3,
        jax.random.normal(ks[5], (S, Dout, Din)),
        jax.random.normal(ks[6], (S, Dout)),
    )


@needs_tpu
def test_sampled_linear_matches_xla():
    args = _args()
    yp = jax.jit(PV.sampled_linear)(*args)
    yr = jax.jit(PV.sampled_linear_reference)(*args)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=2e-5)


@needs_tpu
def test_sampled_linear_grads_match_xla():
    args = _args()

    def lp(*a):
        return jnp.sum(jnp.sin(PV.sampled_linear(*a)))

    def lr(*a):
        return jnp.sum(jnp.sin(PV.sampled_linear_reference(*a)))

    gp = jax.jit(jax.grad(lp, argnums=(0, 1, 2, 3, 4)))(*args)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2, 3, 4)))(*args)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


@needs_tpu
def test_prng_variant_deterministic_and_distinct():
    x, mu_w, rho_w, mu_b, rho_b, _, _ = _args()
    seed = jnp.int32(7)
    f = jax.jit(PV.sampled_linear_prng)
    y1 = f(x, mu_w, rho_w, mu_b, rho_b, seed)
    y2 = f(x, mu_w, rho_w, mu_b, rho_b, seed)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert float(jnp.abs(y1[0] - y1[1]).max()) > 1e-3  # samples differ
    y3 = f(x, mu_w, rho_w, mu_b, rho_b, jnp.int32(8))
    assert float(jnp.abs(y1 - y3).max()) > 1e-3  # seeds differ


@needs_tpu
def test_prng_cross_tile_consistency():
    """The same input row in different N-tiles must see the same sampled
    weights (the per-sample eps is regenerated identically per tile)."""
    S, N, Din, Dout = 4, 1024, 400, 120
    x, mu_w, rho_w, mu_b, rho_b, _, _ = _args(S, N, Din, Dout)
    x = x.at[:, 512].set(x[:, 0])
    y = PV.sampled_linear_prng(x, mu_w, rho_w, mu_b, rho_b, jnp.int32(3))
    np.testing.assert_allclose(
        np.asarray(y[:, 512]), np.asarray(y[:, 0]), atol=1e-6
    )


@needs_tpu
def test_prng_nkl_matches_analytic_kl():
    """E_s[−nkl_s] over many samples ≈ analytic KL(q‖p) — validates both the
    gaussianity of the in-kernel noise and forward/NKL bit-consistency."""
    from psvi_tpu.models import VILinear

    _, mu_w, rho_w, mu_b, rho_b, _, _ = _args(Din=64, Dout=32)
    layer = VILinear(64, 32)
    params = {"mu_w": mu_w, "rho_w": rho_w, "mu_b": mu_b, "rho_b": rho_b}
    kl = float(layer.kl(params))
    nkl = PV.vi_linear_nkl_prng(mu_w, rho_w, mu_b, rho_b, jnp.int32(11), 4000)
    mc = -float(jnp.mean(nkl))
    se = float(jnp.std(nkl)) / np.sqrt(4000)
    assert abs(mc - kl) < 5 * se + 1e-3 * abs(kl)


@needs_tpu
def test_prng_dx_matches_recovered_weights():
    S, N, Din, Dout = 4, 256, 128, 64
    x, mu_w, rho_w, mu_b, rho_b, _, _ = _args(S, N, Din, Dout)
    seed = jnp.int32(5)
    zero = jnp.zeros((S, 8, Din))
    b_rec = PV.sampled_linear_prng(zero, mu_w, rho_w, mu_b, rho_b, seed)[:, 0]
    eye = jnp.broadcast_to(jnp.eye(Din)[None], (S, Din, Din))
    w_rec = (
        PV.sampled_linear_prng(eye, mu_w, rho_w, mu_b, rho_b, seed)
        - b_rec[:, None, :]
    ).transpose(0, 2, 1)

    y = PV.sampled_linear_prng(x, mu_w, rho_w, mu_b, rho_b, seed)

    def loss(x_):
        return jnp.sum(jnp.sin(PV.sampled_linear_prng(x_, mu_w, rho_w, mu_b, rho_b, seed)))

    gx = jax.grad(loss)(x)
    dx_manual = jnp.einsum("sno,soi->sni", jnp.cos(y), w_rec)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(dx_manual), rtol=1e-4, atol=1e-5
    )


@needs_tpu
def test_vilinear_pallas_backend():
    """Layer-level integration: VILinear(backend='pallas') matches xla."""
    from psvi_tpu.models import VILinear

    lx = VILinear(12, 8, init_sd=0.05)
    lp = VILinear(12, 8, init_sd=0.05, backend="pallas")
    params = lx.init(jax.random.PRNGKey(0))
    eps = lx.sample_eps(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 32, 12))
    np.testing.assert_allclose(
        np.asarray(lp.apply(params, eps, x)),
        np.asarray(lx.apply(params, eps, x)),
        atol=2e-5,
    )


@needs_tpu
@pytest.mark.parametrize("arch", ["logistic_regression", "fn"])
def test_fused_nested_kernel_matches_xla(arch):
    """Real-Mosaic execution of the fused bilevel megakernel
    (ops/fused_nested.py) vs its XLA oracle on identical inputs."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_nested import _fused_args

    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI
    from psvi_tpu.ops.fused_nested import fused_nested_outer

    data = read_dataset("halfmoon")
    eng = PSVI(
        data, method="psvi_learn_v", num_pseudo=20, mc_samples=6,
        architecture=arch, inner_it=5, num_epochs=1, data_minibatch=64,
        log_every=1000, init_sd=1e-3, seed=0, fused_inner=False,
    )
    args, cfg, _, _ = _fused_args(eng, jax.random.PRNGKey(5))
    out_x = fused_nested_outer(*args, cfg, backend="xla")
    out_p = fused_nested_outer(*args, cfg, backend="pallas")
    # Every dot in _nested_core runs precision=HIGHEST (round-5 fix:
    # under the 2026-08 libtpu the former default-precision dots ran ONE
    # bf16 MXU pass and the second-order u-hypergradient collapsed to
    # cos 0.29 vs the oracle), so both backends execute the same exact
    # f32 math and agree to float-reassociation noise.
    assert np.isclose(float(out_x[0]), float(out_p[0]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_x[1]), np.asarray(out_p[1]), rtol=1e-5
    )
    for a, b in zip(out_x[2], out_p[2]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )
    np.testing.assert_allclose(
        np.asarray(out_x[3]), np.asarray(out_p[3]), rtol=1e-3,
        atol=2e-5 * float(1 + np.abs(np.asarray(out_x[3])).max()),
    )
    np.testing.assert_allclose(
        np.asarray(out_x[4]), np.asarray(out_p[4]), rtol=1e-3,
        atol=2e-5 * float(1 + np.abs(np.asarray(out_x[4])).max()),
    )

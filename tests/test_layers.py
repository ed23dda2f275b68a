"""Unit tests for variational layers: KL, sampled-NKL, forward shapes.

Golden-value checks run against the reference PyTorch implementation
(imported read-only from /root/reference as a numerical oracle) when torch
is available; otherwise against NumPy closed forms.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.models import (
    Flatten,
    MaxPool2d,
    ReLU,
    Sequential,
    VIConv2d,
    VILinear,
    VILinearFullCov,
    make_fcnet,
    make_lenet,
)
from psvi_tpu.models.layers import inverse_softplus

from conftest import reference_available

sys.path.insert(0, "/root/reference")


def test_inverse_softplus_roundtrip():
    x = jnp.array([1e-4, 1e-2, 0.5, 3.0, 20.0])
    y = inverse_softplus(x)
    np.testing.assert_allclose(jax.nn.softplus(y), x, rtol=1e-5)


def test_vilinear_shapes_and_determinism():
    layer = VILinear(4, 3, init_sd=0.01)
    key = jax.random.PRNGKey(0)
    params = layer.init(key)
    assert params["mu_w"].shape == (3, 4)
    eps = layer.sample_eps(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 7, 4))
    y = layer.apply(params, eps, x)
    assert y.shape == (5, 7, 3)
    # same eps -> same output
    y2 = layer.apply(params, eps, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_vilinear_kl_closed_form():
    layer = VILinear(2, 2, init_sd=0.5, prior_sd=1.0)
    params = layer.init(jax.random.PRNGKey(0))
    kl = float(layer.kl(params))
    # manual: sum over elements of log(1/sd)+ (sd^2+mu^2)/2 - 1/2
    mu_w, sd = np.asarray(params["mu_w"]), 0.5
    mu_b = np.asarray(params["mu_b"])
    expect = 0.0
    for m in list(mu_w.ravel()) + list(mu_b.ravel()):
        expect += -np.log(sd) + (sd**2 + m**2) / 2 - 0.5
    np.testing.assert_allclose(kl, expect, rtol=1e-5)


@pytest.mark.skipif(not reference_available, reason="reference torch oracle")
def test_kl_and_nkl_match_reference_vilinear():
    """Load the reference VILinear, copy its params into ours, compare
    kl() and sampled_nkl() given identical parameter samples."""
    import torch
    from psvi.models.neural_net import VILinear as RefVILinear

    torch.manual_seed(0)
    S, din, dout = 6, 3, 2
    ref = RefVILinear(din, dout, init_sd=0.07, mc_samples=S)

    layer = VILinear(din, dout, init_sd=0.07)
    params = {
        "mu_w": jnp.asarray(ref.weight.detach().numpy()),
        "rho_w": jnp.asarray(ref._weight_sd.detach().numpy()),
        "mu_b": jnp.asarray(ref.bias.detach().numpy()),
        "rho_b": jnp.asarray(ref._bias_sd.detach().numpy()),
    }
    np.testing.assert_allclose(float(layer.kl(params)), ref.kl().item(), rtol=1e-5)

    # run the reference forward to populate its cached samples, then recover
    # the eps it used: eps = (w_cached - mu) / sd
    x = torch.randn(4, din)
    y_ref_t = ref(x)  # caches the samples used below
    sd_w = torch.nn.functional.softplus(ref._weight_sd).detach().numpy()
    sd_b = torch.nn.functional.softplus(ref._bias_sd).detach().numpy()
    w_cached = ref._cached_weight.detach().numpy()  # (S, dout, din)
    b_cached = ref._cached_bias.detach().numpy()  # (S, 1, dout)
    eps = {
        "w": jnp.asarray((w_cached - np.asarray(params["mu_w"])) / sd_w),
        "b": jnp.asarray(
            (b_cached.squeeze(1) - np.asarray(params["mu_b"])) / sd_b
        ),
    }
    ours = np.asarray(layer.nkl(params, eps))
    theirs = ref.sampled_nkl().detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # forward parity given the same samples
    y_ref = y_ref_t.detach().numpy()
    y_ours = np.asarray(layer.apply(params, eps, jnp.asarray(x.numpy())[None].repeat(S, 0)))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


def test_fcnet_forward_and_nkl_shapes():
    net = make_fcnet(2, 10, 3, n_layers=2, init_sd=0.01)
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    eps = net.sample_eps(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (9, 2))
    out = net.apply(params, eps, x)
    assert out.shape == (4, 9, 3)
    assert net.nkl(params, eps).shape == (4,)
    assert net.kl(params).shape == ()


def test_lenet_forward_shapes():
    net = make_lenet(init_sd=0.05)
    params = net.init(jax.random.PRNGKey(0))
    eps = net.sample_eps(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 28, 28))
    out = net.apply(params, eps, x)
    assert out.shape == (3, 2, 10)
    # conv layers excluded from KL by default (ref psvi_classes.py:479-483)
    nkl = net.nkl(params, eps)
    assert nkl.shape == (3,)


@pytest.mark.skipif(not reference_available, reason="reference torch oracle")
def test_lenet_nkl_counts_only_dense_layers():
    """The reference objectives only count VILinear KL terms for LeNet —
    verify our count_kl defaults replicate that layer selection."""
    net = make_lenet()
    counted = [
        type(l).__name__
        for l in net.layers
        if l.is_variational and getattr(l, "count_kl", False)
    ]
    assert counted == ["VILinear", "VILinear", "VILinear"]


def test_fullcov_layer_nkl_matches_manual():
    layer = VILinearFullCov(3, 2, init_sd=0.1)
    params = layer.init(jax.random.PRNGKey(0))
    # randomize mean and corr to make the test non-trivial
    n = layer.num_params
    params = {
        "mean": jax.random.normal(jax.random.PRNGKey(1), (n,)) * 0.1,
        "rho": params["rho"],
        "corr": jax.random.normal(jax.random.PRNGKey(2), (n * (n - 1) // 2,))
        * 0.01,
    }
    eps = layer.sample_eps(jax.random.PRNGKey(3), 4)
    nkl = np.asarray(layer.nkl(params, eps))

    # manual oracle with scipy
    from scipy.stats import multivariate_normal

    L = np.asarray(layer._scale_tril(params))
    mean = np.asarray(params["mean"])
    cov = L @ L.T
    theta = mean + np.asarray(eps["e"]) @ L.T
    q = multivariate_normal(mean, cov)
    p = multivariate_normal(np.zeros(n), np.eye(n))
    expect = p.logpdf(theta) - q.logpdf(theta)
    np.testing.assert_allclose(nkl, expect, rtol=1e-4, atol=1e-5)


def test_fullcov_kl_matches_mc_estimate():
    layer = VILinearFullCov(2, 2, init_sd=0.3)
    params = layer.init(jax.random.PRNGKey(0))
    n = layer.num_params
    params = {
        "mean": 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n,)),
        "rho": params["rho"],
        "corr": 0.05 * jax.random.normal(jax.random.PRNGKey(2), (n * (n - 1) // 2,)),
    }
    kl = float(layer.kl(params))
    eps = layer.sample_eps(jax.random.PRNGKey(3), 200_000)
    mc_kl = -float(jnp.mean(layer.nkl(params, eps)))
    assert abs(kl - mc_kl) < 0.02 * max(1.0, abs(kl))


def test_maxpool_matches_torch_semantics():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 8, 8))
    pool = MaxPool2d(2, 2)
    y = pool.apply({}, {}, x)
    assert y.shape == (2, 3, 4, 4, 4)
    ref = np.asarray(x).reshape(2, 3, 4, 4, 2, 4, 2).max(axis=(4, 6))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6)

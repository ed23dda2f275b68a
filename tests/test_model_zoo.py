"""Forward-shape and KL-accounting tests across the full model zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.models import (
    make_alexnet,
    make_fc2net,
    make_logreg_fullcov,
    make_resnet,
    set_up_model,
)


def _fwd(net, x, S=2, seed=0):
    params = net.init(jax.random.PRNGKey(seed))
    eps = net.sample_eps(jax.random.PRNGKey(seed + 1), S)
    out = net.apply(params, eps, x)
    return params, eps, out


def test_alexnet_forward():
    net = make_alexnet(init_sd=0.05)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
    params, eps, out = _fwd(net, x)
    assert out.shape == (2, 2, 10)
    assert np.all(np.isfinite(np.asarray(out)))
    nkl = net.nkl(params, eps)
    assert nkl.shape == (2,)


def test_resnet18_forward():
    net = make_resnet("resnet18", channel=3, num_classes=10, init_sd=0.1)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
    params, eps, out = _fwd(net, x)
    assert out.shape == (2, 2, 10)
    assert np.all(np.isfinite(np.asarray(out)))
    # only the final dense layer counts toward KL by default
    # (conv layers excluded as in the reference objectives)
    assert float(net.kl(params)) > 0


def test_fc2net_full_covariance():
    net = make_fc2net(2, 8, 3, n_layers=1, init_sd=0.05)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
    params, eps, out = _fwd(net, x, S=3)
    assert out.shape == (3, 5, 3)
    kl = float(net.kl(params))
    nkl = net.nkl(params, eps)
    assert kl > 0 and nkl.shape == (3,)


def test_logreg_fullcov():
    net = make_logreg_fullcov(4, 2, init_sd=0.05)
    x = jax.random.normal(jax.random.PRNGKey(2), (7, 4))
    _, _, out = _fwd(net, x, S=3)
    assert out.shape == (3, 7, 2)


@pytest.mark.parametrize(
    "arch,kw",
    [
        ("logistic_regression", {}),
        ("logistic_regression_fullcov", {}),
        ("fn", {}),
        ("fn2", {}),
        ("regressor_net", {}),
    ],
)
def test_set_up_model_dispatch(arch, kw):
    net = set_up_model(arch, D=3, n_hidden=8, nc=2, init_sd=0.05, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    _, _, out = _fwd(net, x)
    assert out.shape[0] == 2 and out.shape[1] == 4


def test_set_up_model_unknown():
    with pytest.raises(ValueError):
        set_up_model("transformer", D=3, n_hidden=8, nc=2, init_sd=0.05)

"""Golden-value tests of the PSVI objectives vs the reference implementation
and a NumPy oracle."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.models import Sequential, VILinear, make_fcnet
from psvi_tpu.ops import elbo as E

from conftest import reference_available, stub_reference_deps

sys.path.insert(0, "/root/reference")
if reference_available:
    stub_reference_deps()


def _ref_psvi_object(model, u, z, v, N, learn_z=False, f=None):
    """Build a bare reference PSVI carrying just the attrs the objective
    methods read (psvi_classes.py:445-511)."""
    import torch
    from psvi.inference.psvi_classes import PSVI
    from psvi.models.neural_net import categorical_fn

    obj = PSVI.__new__(PSVI)
    obj.u = u
    obj.z = z
    obj.v = v
    obj.N = N
    obj.nc = int(model[-1].out_features)
    obj.mc_samples = 4
    obj.learn_z = learn_z
    obj.f = f if f is not None else (lambda *x: x[0])
    obj.distr_fn = categorical_fn
    return obj


def _extract_eps(torch_model, jax_net):
    """Recover the eps used by the reference forward from cached samples."""
    import torch
    import torch.nn.functional as F
    from psvi.models.neural_net import VILinear as RefVILinear

    eps = []
    for layer in torch_model:
        if isinstance(layer, RefVILinear):
            sd_w = F.softplus(layer._weight_sd).detach().numpy()
            sd_b = F.softplus(layer._bias_sd).detach().numpy()
            w_c = layer._cached_weight.detach().numpy()
            b_c = layer._cached_bias.detach().numpy().squeeze(1)
            mu_w = layer.weight.detach().numpy()
            mu_b = layer.bias.detach().numpy()
            eps.append(
                {
                    "w": jnp.asarray((w_c - mu_w) / sd_w),
                    "b": jnp.asarray((b_c - mu_b) / sd_b),
                }
            )
        else:
            eps.append({})
    return tuple(eps)


def _extract_params(torch_model):
    from psvi.models.neural_net import VILinear as RefVILinear

    params = []
    for layer in torch_model:
        if isinstance(layer, RefVILinear):
            params.append(
                {
                    "mu_w": jnp.asarray(layer.weight.detach().numpy()),
                    "rho_w": jnp.asarray(layer._weight_sd.detach().numpy()),
                    "mu_b": jnp.asarray(layer.bias.detach().numpy()),
                    "rho_b": jnp.asarray(layer._bias_sd.detach().numpy()),
                }
            )
        else:
            params.append({})
    return tuple(params)


@pytest.mark.skipif(not reference_available, reason="reference torch oracle")
@pytest.mark.parametrize("arch", ["logreg", "mlp"])
def test_objectives_match_reference(arch):
    import torch
    import torch.nn as nn
    from psvi.models.neural_net import VILinear as RefVILinear, set_mc_samples

    torch.manual_seed(0)
    S, D, nc, M, B, N = 4, 3, 2, 5, 8, 100

    if arch == "logreg":
        tmodel = nn.Sequential(RefVILinear(D, nc, init_sd=0.05, mc_samples=S))
        jnet = Sequential((VILinear(D, nc, init_sd=0.05),))
    else:
        tmodel = nn.Sequential(
            RefVILinear(D, 7, init_sd=0.05, mc_samples=S),
            nn.ReLU(),
            RefVILinear(7, nc, init_sd=0.05, mc_samples=S),
        )
        jnet = make_fcnet(D, 7, nc, n_layers=1, init_sd=0.05)
    set_mc_samples(tmodel, S)

    u = torch.randn(M, D)
    z = torch.randint(0, nc, (M,)).float()
    v = torch.rand(M) / M
    xb = torch.randn(B, D)
    yb = torch.randint(0, nc, (B,)).float()

    ref = _ref_psvi_object(tmodel, u, z, v, N)

    # --- inner elbo ---
    ref_inner = ref.inner_elbo(model=tmodel).item()
    eps = _extract_eps(tmodel, jnet)
    params = _extract_params(tmodel)
    cw = jnp.asarray((N * v).numpy())
    ours_inner = float(
        E.inner_elbo(
            jnet, params, eps, jnp.asarray(u.numpy()),
            jnp.asarray(z.numpy()), cw, nc=nc,
        )
    )
    np.testing.assert_allclose(ours_inner, ref_inner, rtol=2e-4)

    # --- outer psvi elbo ---
    ref_outer = ref.psvi_elbo(xb, yb, model=tmodel).item()
    eps = _extract_eps(tmodel, jnet)  # fresh samples cached by that call
    ours_outer = float(
        E.psvi_elbo(
            jnet, params, eps, jnp.asarray(u.numpy()), jnp.asarray(z.numpy()),
            cw, jnp.asarray(xb.numpy()), jnp.asarray(yb.numpy()), N, nc=nc,
        )
    )
    np.testing.assert_allclose(ours_outer, ref_outer, rtol=2e-4)


@pytest.mark.skipif(not reference_available, reason="reference torch oracle")
def test_learn_z_objectives_match_reference():
    import torch
    import torch.nn as nn
    from psvi.models.neural_net import VILinear as RefVILinear, set_mc_samples

    torch.manual_seed(1)
    S, D, nc, M, B, N = 4, 3, 3, 5, 6, 50
    tmodel = nn.Sequential(RefVILinear(D, nc, init_sd=0.05, mc_samples=S))
    jnet = Sequential((VILinear(D, nc, init_sd=0.05),))
    set_mc_samples(tmodel, S)

    u = torch.randn(M, D)
    z = torch.randn(M, nc)  # soft labels
    v = torch.rand(M) / M
    xb = torch.randn(B, D)
    yb = torch.randint(0, nc, (B,)).float()

    ref = _ref_psvi_object(tmodel, u, z, v, N, learn_z=True)

    ref_inner = ref.inner_elbo(model=tmodel).item()
    eps = _extract_eps(tmodel, jnet)
    params = _extract_params(tmodel)
    cw = jnp.asarray((N * v).numpy())
    ours_inner = float(
        E.inner_elbo(
            jnet, params, eps, jnp.asarray(u.numpy()), jnp.asarray(z.numpy()),
            cw, learn_z=True, nc=nc,
        )
    )
    np.testing.assert_allclose(ours_inner, ref_inner, rtol=2e-4)

    ref_outer = ref.psvi_elbo(xb, yb, model=tmodel).item()
    eps = _extract_eps(tmodel, jnet)
    ours_outer = float(
        E.psvi_elbo(
            jnet, params, eps, jnp.asarray(u.numpy()), jnp.asarray(z.numpy()),
            cw, jnp.asarray(xb.numpy()), jnp.asarray(yb.numpy()), N,
            learn_z=True, nc=nc,
        )
    )
    np.testing.assert_allclose(ours_outer, ref_outer, rtol=2e-4)


def test_psvi_elbo_numpy_oracle():
    """Hand-computed tiny case: logreg, S=2, M=1, B=1."""
    net = Sequential((VILinear(1, 2, init_sd=0.1),))
    params = ({
        "mu_w": jnp.array([[0.3], [-0.2]]),
        "rho_w": jnp.array([[0.1], [0.1]]),
        "mu_b": jnp.array([0.0, 0.1]),
        "rho_b": jnp.array([0.2, 0.2]),
    },)
    eps = ({
        "w": jnp.array([[[0.5], [-0.5]], [[1.0], [0.0]]]),
        "b": jnp.array([[0.1, -0.1], [0.0, 0.2]]),
    },)
    u = jnp.array([[1.0]])
    z = jnp.array([0.0])
    v = jnp.array([0.7])
    xb = jnp.array([[2.0]])
    yb = jnp.array([1.0])
    N = 10

    # numpy oracle
    import scipy.special as sp

    mu_w = np.array([[0.3], [-0.2]])
    sd_w = np.log1p(np.exp(np.array([[0.1], [0.1]])))
    mu_b = np.array([0.0, 0.1])
    sd_b = np.log1p(np.exp(np.array([0.2, 0.2])))
    ew = np.array(eps[0]["w"])
    eb = np.array(eps[0]["b"])
    w = mu_w[None] + sd_w[None] * ew  # (2, 2, 1)
    b = mu_b[None] + sd_b[None] * eb  # (2, 2)

    def nll(x, y, s):
        logits = w[s] @ x + b[s]
        return sp.logsumexp(logits) - logits[int(y)]

    pseudo_nll = np.array([N * 0.7 * nll([1.0], 0, s) for s in range(2)])
    data_nll = np.array([N * nll([2.0], 1, s) for s in range(2)])

    def logpdf(x, m, s):
        return -0.5 * ((x - m) / s) ** 2 - np.log(s) - 0.5 * np.log(2 * np.pi)

    nkl = np.array(
        [
            logpdf(w[s], 0, 1).sum()
            - logpdf(w[s], mu_w, sd_w).sum()
            + logpdf(b[s], 0, 1).sum()
            - logpdf(b[s], mu_b, sd_b).sum()
            for s in range(2)
        ]
    )
    lw = -pseudo_nll + nkl
    wts = sp.softmax(lw)
    expect = (wts * (data_nll - pseudo_nll)).sum() - lw.mean()

    got = float(
        E.psvi_elbo(net, params, eps, u, z, N * v, xb, yb, N, nc=2)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_gaussian_nll():
    preds = jnp.array([[1.0, 2.0]])
    targets = jnp.array([1.5, 1.5])
    tau = 4.0
    out = np.asarray(E.gaussian_nll(preds, targets, tau))
    scale = 0.5
    expect = 0.5 * ((np.array([1.5, 1.5]) - np.array([1.0, 2.0])) / scale) ** 2 + np.log(
        scale
    ) + 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(out[0], expect, rtol=1e-5)


def test_diagnostics_ranges():
    w = jax.nn.softmax(jnp.array([0.1, 0.5, -0.2, 0.9]))
    vw = jnp.array([0.2, 0.3, 0.5])
    iw_ent, ness, vent = E.iw_diagnostics(w, vw, 3)
    assert 0 < float(ness) <= 1.0
    assert float(iw_ent) > 0
    assert 0 < float(vent) <= 1.0


def test_gradients_flow_to_hyperparams():
    net = make_fcnet(2, 5, 2, n_layers=1, init_sd=0.05)
    params = net.init(jax.random.PRNGKey(0))
    eps = net.sample_eps(jax.random.PRNGKey(1), 4)
    u = jax.random.normal(jax.random.PRNGKey(2), (3, 2))
    z = jnp.array([0.0, 1.0, 0.0])
    v = jnp.full((3,), 1 / 3)
    xb = jax.random.normal(jax.random.PRNGKey(3), (6, 2))
    yb = jnp.array([0.0, 1.0, 1.0, 0.0, 1.0, 0.0])

    def loss(u, v):
        return E.psvi_elbo(net, params, eps, u, z, 30 * v, xb, yb, 30, nc=2)

    gu, gv = jax.grad(loss, argnums=(0, 1))(u, v)
    assert float(jnp.sum(jnp.abs(gu))) > 0
    assert float(jnp.sum(jnp.abs(gv))) > 0


def test_core_weights_simplex_and_alpha_properties():
    """Property tests (SURVEY §4 plan): softmax-v sums to exp(alpha);
    identity-f keeps raw v; N-rescaling linear."""
    import jax.numpy as jnp
    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_alpha_v", num_pseudo=7, mc_samples=4,
               architecture="logistic_regression", inner_it=2, num_epochs=2,
               data_minibatch=32, log_every=1, init_sd=1e-3)
    v = jnp.asarray(np.linspace(-1, 2, 7))
    alpha = jnp.asarray([0.7])
    cw, fv = eng._core_weights(v, alpha)
    np.testing.assert_allclose(float(fv.sum()), float(np.exp(0.7)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cw), data.N * np.asarray(fv), rtol=1e-6)

    eng2 = PSVI(data, method="psvi", num_pseudo=7, mc_samples=4,
                architecture="logistic_regression", inner_it=2, num_epochs=2,
                data_minibatch=32, log_every=1, init_sd=1e-3)
    cw2, fv2 = eng2._core_weights(v, alpha)
    np.testing.assert_allclose(np.asarray(fv2), np.asarray(v), rtol=1e-6)


def test_ness_bounds_property(rng):
    """Normalized ESS ∈ (0, 1] for any weight vector."""
    for _ in range(20):
        lw = jnp.asarray(rng.standard_normal(8) * rng.uniform(0.1, 5))
        w = jax.nn.softmax(lw)
        _, ness, _ = E.iw_diagnostics(w, jnp.abs(lw) + 1e-3, 8)
        assert 0 < float(ness) <= 1.0 + 1e-6

"""Evaluation-path parity vs the reference: same coreset state, same model
parameters, same parameter samples ⇒ same predictive accuracy/NLL.

This exercises the full evaluate() pipeline including the reference's
eval-time importance-weight sign convention (psvi_classes.py:1047-1070),
the per-batch weight computation, and the IW-corrected mixture.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.data import read_dataset
from psvi_tpu.ops import elbo as E
from psvi_tpu.models import Sequential, VILinear

from conftest import reference_available, stub_reference_deps

sys.path.insert(0, "/root/reference")
if reference_available:
    stub_reference_deps()


@pytest.mark.skipif(not reference_available, reason="reference torch oracle")
def test_evaluate_matches_reference_given_same_samples():
    import torch
    import torch.nn as nn
    from psvi.models.neural_net import VILinear as RefVILinear, set_mc_samples
    from psvi.inference.psvi_classes import PSVI as RefPSVI
    from psvi.models.neural_net import categorical_fn

    torch.manual_seed(0)
    data = read_dataset("halfmoon")
    S, M, D, nc = 6, 8, 2, 2
    B = 50  # one eval batch covering a slice of the test set

    tmodel = nn.Sequential(RefVILinear(D, nc, init_sd=0.05, mc_samples=S))
    set_mc_samples(tmodel, S)
    u = torch.randn(M, D)
    z = torch.randint(0, nc, (M,)).float()
    v = torch.rand(M) / M

    xt = torch.from_numpy(data.xt[:B])
    yt = torch.from_numpy(data.yt[:B])

    # --- reference evaluate (single batch) ---
    obj = RefPSVI.__new__(RefPSVI)
    obj.u, obj.z, obj.v = u, z, v
    obj.N, obj.nc, obj.num_pseudo = data.N, nc, M
    obj.mc_samples = S
    obj.learn_z = False
    obj.f = lambda *a: a[0]
    obj.distr_fn = categorical_fn
    obj.model = tmodel
    obj.compute_weights_entropy = True

    class _Loader(list):
        pass

    obj.test_loader = [(xt, yt)]
    obj.device = torch.device("cpu")
    acc_ref, nll_ref, iw_ref, ness_ref, vent_ref = RefPSVI.evaluate(obj)

    # --- recover the samples the reference just used ---
    layer = tmodel[0]
    import torch.nn.functional as F

    sd_w = F.softplus(layer._weight_sd).detach().numpy()
    sd_b = F.softplus(layer._bias_sd).detach().numpy()
    eps = (
        {
            "w": jnp.asarray(
                (layer._cached_weight.detach().numpy()
                 - layer.weight.detach().numpy()) / sd_w
            ),
            "b": jnp.asarray(
                (layer._cached_bias.detach().numpy().squeeze(1)
                 - layer.bias.detach().numpy()) / sd_b
            ),
        },
    )
    params = (
        {
            "mu_w": jnp.asarray(layer.weight.detach().numpy()),
            "rho_w": jnp.asarray(layer._weight_sd.detach().numpy()),
            "mu_b": jnp.asarray(layer.bias.detach().numpy()),
            "rho_b": jnp.asarray(layer._bias_sd.detach().numpy()),
        },
    )
    net = Sequential((VILinear(D, nc, init_sd=0.05),))

    # --- our evaluate math on the same batch and samples ---
    uj, zj = jnp.asarray(u.numpy()), jnp.asarray(z.numpy())
    cw = jnp.asarray((data.N * v).numpy())
    all_x = jnp.concatenate([uj, jnp.asarray(xt.numpy())], axis=0)
    logits = net.apply(params, eps, all_x)
    lw = E.importance_log_weights(
        net, params, eps, uj, zj, cw, nc=nc, pseudo_out=logits[:, :M]
    )
    probs, weights = E.predictive_mixture(logits[:, M:], lw, correction=True)
    pred = jnp.argmax(probs, -1).astype(jnp.float32)
    ytj = jnp.asarray(yt.numpy())
    acc = jnp.mean(pred == ytj)
    p_true = jnp.take_along_axis(probs, ytj.astype(jnp.int32)[:, None], 1)[:, 0]
    nll = -jnp.mean(jnp.log(jnp.clip(p_true, 1e-38)))
    iw_ent, ness, vent = E.iw_diagnostics(weights, v.numpy(), M)

    np.testing.assert_allclose(float(acc), acc_ref.item(), atol=1e-6)
    np.testing.assert_allclose(float(nll), nll_ref.item(), rtol=1e-4)
    np.testing.assert_allclose(float(iw_ent), iw_ref.item(), rtol=1e-4)
    np.testing.assert_allclose(float(ness), ness_ref.item(), rtol=1e-4)
    np.testing.assert_allclose(float(vent), vent_ref.item(), rtol=1e-4)

"""Packed flat-parameter representation: equivalence with the per-layer
Sequential representation (see models/packed.py — op-count optimization
for the TPU inner loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI
from psvi_tpu.models.networks import (
    make_fcnet,
    make_lenet,
    make_logreg_fullcov,
    set_up_model,
)
from psvi_tpu.models.packed import pack_net


@pytest.mark.parametrize("maker", [
    lambda: make_lenet(init_sd=1e-3),
    lambda: make_fcnet(4, 16, 3, n_layers=2, init_sd=1e-2),
])
def test_packed_apply_bitwise_equals_unpacked(maker):
    """Same init key + same noise (repacked) -> bitwise-equal forward."""
    net = maker()
    pnet = pack_net(net)
    assert pnet is not None
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    pparams = pnet.init(key)  # ravels the SAME per-layer init
    eps = net.sample_eps(jax.random.fold_in(key, 1), 4)
    flat_eps = pnet.pack_eps(eps)

    D = net.layers[0].in_dim if hasattr(net.layers[0], "in_dim") else None
    if D is not None:
        x = jax.random.normal(jax.random.fold_in(key, 2), (8, D))
    else:
        x = jax.random.normal(jax.random.fold_in(key, 2), (8, 1, 28, 28))

    y_seq = net.apply(params, eps, x)
    y_pkd = pnet.apply(pparams, flat_eps, x)
    np.testing.assert_array_equal(np.asarray(y_seq), np.asarray(y_pkd))


def test_packed_kl_nkl_close():
    net = make_lenet(init_sd=1e-3)
    pnet = pack_net(net)
    key = jax.random.PRNGKey(3)
    params = net.init(key)
    pparams = pnet.init(key)
    eps = net.sample_eps(jax.random.fold_in(key, 1), 6)
    flat_eps = pnet.pack_eps(eps)
    np.testing.assert_allclose(
        float(pnet.kl(pparams)), float(net.kl(params)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pnet.nkl(pparams, flat_eps)),
        np.asarray(net.nkl(params, eps)),
        rtol=1e-5,
    )


def test_packed_respects_count_kl_mask():
    """Conv segments are sampled but excluded from KL/NKL (ref
    psvi_classes.py:479-483,506-510) — the mask must reproduce that."""
    net = make_lenet(init_sd=1e-3)
    pnet = pack_net(net)
    # dense params = VILinear segments only
    dense = sum(s.size for s in pnet.segments if s.count_kl)
    total = pnet.num_params
    assert 0 < dense < total
    key = jax.random.PRNGKey(0)
    pparams = pnet.init(key)
    # KL must equal the dense-only Sequential KL (computed above) and be
    # invariant to conv-segment rho perturbations
    import dataclasses  # noqa: F401

    rho2 = pparams["rho"]
    conv_idx = np.concatenate([
        np.arange(s.offset, s.offset + s.size)
        for s in pnet.segments if not s.count_kl
    ])
    rho2 = rho2.at[jnp.asarray(conv_idx)].add(1.0)
    assert float(pnet.kl({"mu": pparams["mu"], "rho": rho2})) == float(
        pnet.kl(pparams)
    )


def test_fullcov_not_packable_falls_back():
    assert pack_net(make_logreg_fullcov(4, 2, init_sd=1e-3)) is None
    # engine auto-detects and keeps the unpacked representation
    hm = read_dataset("halfmoon")
    eng = PSVI(hm, method="psvi_alpha_v", architecture="logistic_regression_fullcov",
               num_pseudo=6, mc_samples=4, inner_it=2, num_epochs=1,
               data_minibatch=32, log_every=10, init_sd=1e-3, packed=False)
    assert not hasattr(eng.net, "segments")
    with pytest.raises(ValueError):
        PSVI(hm, method="psvi_alpha_v", architecture="logistic_regression_fullcov",
             num_pseudo=6, mc_samples=4, inner_it=2, num_epochs=1,
             data_minibatch=32, log_every=10, init_sd=1e-3, packed=True)


def test_engine_packed_convergence_matches_unpacked():
    """Full engine run, packed vs unpacked: statistically equivalent
    (different PRNG stream for the noise draw, so not bitwise)."""
    hm = read_dataset("halfmoon")
    accs = {}
    for packed in [False, True]:
        res = PSVI(
            hm, method="psvi_learn_v", num_pseudo=10, mc_samples=4,
            architecture="logistic_regression", inner_it=10, num_epochs=41,
            data_minibatch=64, log_every=40, init_sd=1e-3, lr0u=1e-2,
            lr0v=1e-1, seed=0, packed=packed,
        ).run_psvi()
        accs[packed] = res["accs"][-1]
        assert np.all(np.isfinite(res["nlls"]))
    assert accs[True] > 0.75 and accs[False] > 0.75


def test_engine_packed_lenet_steps_finite():
    data = read_dataset("synth_mnist")
    eng = PSVI(data, method="psvi_alpha_v", num_pseudo=12, mc_samples=4,
               architecture="lenet", inner_it=3, num_epochs=1,
               data_minibatch=32, log_every=100, init_sd=1e-3, seed=0,
               packed=True)
    assert hasattr(eng.net, "segments")
    s, aux = eng._multi_step(eng.state, jax.random.PRNGKey(0), 3)
    losses = np.asarray(jax.tree_util.tree_leaves(aux)[0]).ravel()
    assert np.all(np.isfinite(losses))
    for leaf in jax.tree_util.tree_leaves(s):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_packed_sbatched_input_shape():
    """S-batched (S, N, D) input must come back (S, N, nc), not re-broadcast
    to (S, S, N, nc) (regression: broadcast guard missing the
    is_variational condition Sequential.apply has)."""
    import jax
    import jax.numpy as jnp

    from psvi_tpu.models.networks import make_fcnet
    from psvi_tpu.models.packed import pack_net

    net = make_fcnet(2, 8, 2, n_layers=1, init_sd=1e-2)
    pnet = pack_net(net)
    params = pnet.init(jax.random.PRNGKey(0))
    S, N = 3, 5
    eps = pnet.sample_eps(jax.random.PRNGKey(1), S)
    x = jax.random.normal(jax.random.PRNGKey(2), (S, N, 2))
    out = pnet.apply(params, eps, x)
    assert out.shape == (S, N, 2)
    # unbatched input still gains the S axis
    out2 = pnet.apply(params, eps, x[0])
    assert out2.shape == (S, N, 2)

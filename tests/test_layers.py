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


def test_unbatched_input_paths_match_broadcast():
    """Unbatched (N, ...) inputs must produce the same outputs as the
    explicit (S, N, ...) broadcast — covers the VILinear/VILinearFullCov
    2-D einsum paths and VIConv2d's im2col patch formulation (the TPU
    fast path for first-layer convs, see layers.py:_apply_patches)."""
    key = jax.random.PRNGKey(0)
    S = 4

    # dense
    lin = VILinear(7, 5, init_sd=0.3)
    p = lin.init(key)
    e = lin.sample_eps(jax.random.fold_in(key, 1), S)
    x = jax.random.normal(jax.random.fold_in(key, 2), (9, 7))
    out2d = lin.apply(p, e, x)
    out3d = lin.apply(p, e, jnp.broadcast_to(x[None], (S, 9, 7)))
    np.testing.assert_allclose(np.asarray(out2d), np.asarray(out3d), rtol=1e-6)

    # full-covariance dense
    fc = VILinearFullCov(3, 2, init_sd=0.3)
    pf = fc.init(key)
    ef = fc.sample_eps(jax.random.fold_in(key, 3), S)
    xf = jax.random.normal(jax.random.fold_in(key, 4), (6, 3))
    o2 = fc.apply(pf, ef, xf)
    o3 = fc.apply(pf, ef, jnp.broadcast_to(xf[None], (S, 6, 3)))
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o3), rtol=1e-6)

    # conv: patch path (unbatched, C*k^2 <= 256) vs vmapped lax.conv
    for stride, padding in [(1, 2), (1, 0), (2, 1)]:
        conv = VIConv2d(3, 6, 5, stride=stride, padding=padding, init_sd=0.3)
        pc = conv.init(key)
        ec = conv.sample_eps(jax.random.fold_in(key, 5), S)
        xc = jax.random.normal(jax.random.fold_in(key, 6), (8, 3, 14, 14))
        got = conv.apply(pc, ec, xc)  # patch path
        want = conv.apply(pc, ec, jnp.broadcast_to(xc[None], (S,) + xc.shape))
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    # large-C conv falls back to broadcast+conv (same result trivially)
    big = VIConv2d(64, 8, 3, padding=1, init_sd=0.3)
    pb = big.init(key)
    eb = big.sample_eps(jax.random.fold_in(key, 7), S)
    xb = jax.random.normal(jax.random.fold_in(key, 8), (2, 64, 6, 6))
    got = big.apply(pb, eb, xb)
    want = big.apply(pb, eb, jnp.broadcast_to(xb[None], (S,) + xb.shape))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_sequential_unbatched_matches_broadcast_lenet():
    """End-to-end: Sequential no longer materializes the S-broadcast; the
    LeNet forward on (N, 1, 28, 28) must equal the old (S, N, ...) path."""
    key = jax.random.PRNGKey(1)
    S = 3
    net = make_lenet(init_sd=0.1)
    params = net.init(key)
    eps = net.sample_eps(jax.random.fold_in(key, 1), S)
    x = jax.random.normal(jax.random.fold_in(key, 2), (5, 1, 28, 28))
    out = net.apply(params, eps, x)
    # manual broadcast through the layer stack (the pre-change semantics)
    h = jnp.broadcast_to(x[None], (S,) + x.shape)
    for layer, p, e in zip(net.layers, params, eps):
        h = layer.apply(p, e, h)
    assert out.shape == (S, 5, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(h), rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(not reference_available, reason="reference oracle needed")
def test_conv_forward_kl_nkl_match_reference():
    """Golden-value: reference VIConv2d forward/kl/sampled_nkl vs ours given
    identical parameter samples (eps recovered from the reference's cached
    weights) — covers BOTH our 5-D vmapped-conv path and the 4-D im2col
    patch path (roadmap quality item)."""
    import torch
    from psvi.models.neural_net import VIConv2d as RefVIConv2d

    torch.manual_seed(3)
    S, C, K, k = 5, 2, 4, 3
    ref = RefVIConv2d(C, K, k, padding=1, init_sd=0.05, mc_samples=S)
    conv = VIConv2d(C, K, k, padding=1, init_sd=0.05)
    params = {
        "mu_w": jnp.asarray(ref.weight.detach().numpy()),
        "rho_w": jnp.asarray(ref._weight_sd.detach().numpy()),
        "mu_b": jnp.asarray(ref.bias.detach().numpy()),
        "rho_b": jnp.asarray(ref._bias_sd.detach().numpy()),
    }
    np.testing.assert_allclose(
        float(conv.kl(params)), ref.kl().item(), rtol=1e-5
    )

    x = torch.randn(3, C, 8, 8)
    y_ref = ref(x).detach().numpy()  # (S, N, K, 8, 8); caches samples
    sd_w = torch.nn.functional.softplus(ref._weight_sd).detach().numpy()
    sd_b = torch.nn.functional.softplus(ref._bias_sd).detach().numpy()
    w_cached = ref._cached_weight.detach().numpy()  # (S, K, C, k, k)
    b_cached = ref._cached_bias.detach().numpy().reshape(S, K)
    eps = {
        "w": jnp.asarray((w_cached - np.asarray(params["mu_w"])) / sd_w),
        "b": jnp.asarray((b_cached - np.asarray(params["mu_b"])) / sd_b),
    }

    xj = jnp.asarray(x.numpy())
    # 4-D input -> im2col patch path (C*k^2 = 18 <= 256)
    y_patch = np.asarray(conv.apply(params, eps, xj))
    # 5-D broadcast input -> vmapped lax.conv path
    y_conv = np.asarray(
        conv.apply(params, eps, jnp.broadcast_to(xj[None], (S,) + xj.shape))
    )
    np.testing.assert_allclose(y_patch, y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_conv, y_ref, rtol=1e-4, atol=1e-5)

    ours_nkl = np.asarray(conv.nkl(params, eps))
    theirs_nkl = ref.sampled_nkl().detach().numpy()
    np.testing.assert_allclose(ours_nkl, theirs_nkl, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available, reason="reference oracle needed")
def test_fullcov_forward_kl_nkl_match_reference():
    """Golden-value: reference VILinearMultivariateNormal vs our
    VILinearFullCov with the scale_tril COPIED from the reference (its
    (n-1) tril quirk leaves the last Cholesky row without free
    off-diagonals; our full lower triangle reproduces it exactly by
    zeroing those entries)."""
    import torch
    from psvi.models.neural_net import (
        VILinearMultivariateNormal as RefFullCov,
    )

    torch.manual_seed(4)
    S, din, dout = 6, 3, 2
    ref = RefFullCov(din, dout, init_sd=0.05, mc_samples=S)
    layer = VILinearFullCov(din, dout, init_sd=0.05)

    n = layer.num_params
    k_ref = ref.scale_tril.detach().numpy()  # (n, n)
    i, j = np.tril_indices(n, k=-1)
    params = {
        "mean": jnp.asarray(ref.mean.detach().numpy()),
        "rho": jnp.asarray(ref._sd.detach().numpy()),
        "corr": jnp.asarray(k_ref[i, j]),
    }
    np.testing.assert_allclose(
        np.asarray(layer._scale_tril(params)), k_ref, rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        float(layer.kl(params)), ref.kl().item(), rtol=1e-4
    )

    x = torch.randn(4, din)
    y_ref = ref(x).detach().numpy()  # (S, N, dout); sets sampled params
    w = ref.weight.detach().numpy().reshape(S, -1)  # (S, dout*din)
    b = ref.bias.detach().numpy().reshape(S, -1)
    theta = np.concatenate([w, b], axis=1)  # packing order = param_names
    import scipy.linalg as sla

    mean = np.asarray(params["mean"])
    eps_np = np.stack(
        [sla.solve_triangular(k_ref, t - mean, lower=True) for t in theta]
    )
    eps = {"e": jnp.asarray(eps_np.astype(np.float32))}

    y_ours = np.asarray(
        layer.apply(params, eps, jnp.asarray(x.numpy()))
    )
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)

    ours_nkl = np.asarray(layer.nkl(params, eps))
    theirs_nkl = ref.sampled_nkl().detach().numpy()
    np.testing.assert_allclose(ours_nkl, theirs_nkl, rtol=1e-4, atol=1e-3)


def test_argmax_pool_matches_reshape_pool():
    """pool backend 'argmax' (int8-argmax residuals): forward, grad and
    grad-of-grad bitwise-match the reshape-max formulation (no ties in
    random data; on ties argmax routes to one winner like torch)."""
    import jax
    import jax.numpy as jnp

    from psvi_tpu.models.layers import MaxPool2d, _argmax_pool

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 6, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 6, 4, 4))
    ref_pool = MaxPool2d(2, 2)

    f_ref = lambda x: jnp.sum(ref_pool.apply(None, None, x) * w)
    f_am = lambda x: jnp.sum(_argmax_pool(x, 2) * w)
    assert jnp.all(f_ref(x) == f_am(x))
    assert jnp.all(jax.grad(f_ref)(x) == jax.grad(f_am)(x))
    gg_ref = jax.grad(lambda x: jnp.sum(jax.grad(f_ref)(x) ** 2))(x)
    gg_am = jax.grad(lambda x: jnp.sum(jax.grad(f_am)(x) ** 2))(x)
    assert jnp.all(gg_ref == gg_am)


def test_fuse_conv_pool_matches_unfused():
    """Parity-split pooled conv (VIConvPool2d): forward, gradients and
    grad-of-grad match the literal conv->reshape-pool formulation to
    reassociation noise, for unbatched, batched and PrePatched inputs."""
    from psvi_tpu.models.layers import fuse_conv_pool, Identity, VIConvPool2d
    from psvi_tpu.models.networks import make_lenet

    net = make_lenet(init_sd=1e-2)
    fnet = fuse_conv_pool(net)
    assert isinstance(fnet.layers[0], VIConvPool2d)
    assert isinstance(fnet.layers[1], Identity)
    params = net.init(jax.random.PRNGKey(0))
    eps = net.sample_eps(jax.random.PRNGKey(1), 4)
    # identical pytree structure: states/checkpoints transfer
    assert jax.tree_util.tree_structure(
        fnet.init(jax.random.PRNGKey(0))
    ) == jax.tree_util.tree_structure(params)

    x = jax.random.normal(jax.random.PRNGKey(2), (5, 1, 28, 28))
    y0, y1 = net.apply(params, eps, x), fnet.apply(params, eps, x)
    np.testing.assert_allclose(y0, y1, atol=2e-6)
    xs = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 1, 28, 28))
    np.testing.assert_allclose(
        net.apply(params, eps, xs), fnet.apply(params, eps, xs), atol=2e-6
    )

    def loss(p, xx, n):
        return jnp.sum(jnp.sin(n.apply(p, eps, xx)))

    g0 = jax.grad(loss)(params, x, net)
    g1 = jax.grad(loss)(params, x, fnet)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(a, b, atol=5e-5)
    gx0 = jax.grad(loss, argnums=1)(params, x, net)
    gx1 = jax.grad(loss, argnums=1)(params, x, fnet)
    np.testing.assert_allclose(gx0, gx1, atol=5e-5)

    def gradnorm(p, n):
        g = jax.grad(loss)(p, x, n)
        return sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g))

    h0 = jax.grad(gradnorm)(params, net)
    h1 = jax.grad(gradnorm)(params, fnet)
    for a, b in zip(jax.tree_util.tree_leaves(h0), jax.tree_util.tree_leaves(h1)):
        np.testing.assert_allclose(a, b, atol=1e-2)


def test_prep_input_prepatched_equivalence():
    """Sequential.prep_input pre-extracts first-layer patches; applying
    the net to the PrePatched stand-in matches applying it to x, with
    identical gradients w.r.t. x through the extraction."""
    from psvi_tpu.models.layers import fuse_conv_pool, PrePatched
    from psvi_tpu.models.networks import make_lenet

    fnet = fuse_conv_pool(make_lenet(init_sd=1e-2))
    params = fnet.init(jax.random.PRNGKey(0))
    eps = fnet.sample_eps(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 1, 28, 28))
    pre = fnet.prep_input(x)
    assert isinstance(pre, PrePatched) and pre.shape == x.shape

    y0 = fnet.apply(params, eps, x)
    y1 = fnet.apply(params, eps, pre)
    np.testing.assert_allclose(y0, y1, atol=1e-6)

    f_direct = lambda xx: jnp.sum(jnp.cos(fnet.apply(params, eps, xx)))
    f_prep = lambda xx: jnp.sum(
        jnp.cos(fnet.apply(params, eps, fnet.prep_input(xx)))
    )
    np.testing.assert_allclose(
        jax.grad(f_direct)(x), jax.grad(f_prep)(x), atol=2e-5
    )
    # non-conv nets / batched inputs pass through untouched
    from psvi_tpu.models.networks import make_fcnet

    mlp = make_fcnet(4, 8, 2)
    z = jnp.ones((3, 4))
    assert mlp.prep_input(z) is z


def test_convpool_fallback_nontiling_floor_semantics():
    """A pooled conv whose output doesn't tile by pool_k (e.g. 27x27 input
    -> 23x23 conv output with pool_k=2) must pool with FLOOR semantics
    (crop trailing row/col), matching the unfused conv + reduce_window
    MaxPool2d path — not crash in the reshape (round-4 advisor finding)."""
    from psvi_tpu.models.layers import (
        MaxPool2d, Sequential, VIConv2d, VIConvPool2d, fuse_conv_pool,
    )

    conv = VIConv2d(1, 4, kernel_size=5, init_sd=1e-2)
    fused = Sequential((VIConvPool2d(
        **{f.name: getattr(conv, f.name)
           for f in __import__("dataclasses").fields(conv)}, pool_k=2),))
    unfused = Sequential((conv, MaxPool2d(2, 2)))  # falls to reduce_window

    params = unfused.init(jax.random.PRNGKey(0))
    eps = unfused.sample_eps(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 27, 27))
    y_ref = unfused.apply(params, eps, x)
    y_fused = fused.apply((params[0],), (eps[0],), x)
    assert y_fused.shape[-2:] == (11, 11) and y_ref.shape[-2:] == (11, 11)
    np.testing.assert_allclose(y_ref, y_fused, atol=2e-6)
    # fuse_conv_pool round-trip on the non-tiling net also works end-to-end
    fnet = fuse_conv_pool(Sequential((conv, MaxPool2d(2, 2))))
    y2 = fnet.apply(unfused.init(jax.random.PRNGKey(0)),
                    unfused.sample_eps(jax.random.PRNGKey(1), 3), x)
    np.testing.assert_allclose(y_ref, y2, atol=2e-6)

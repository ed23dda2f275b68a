"""Optimizer parity tests vs torch (when available) and closed forms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psvi_tpu.ops import optim as O

from conftest import reference_available


def test_adam_matches_torch():
    if not reference_available:
        pytest.skip("torch oracle unavailable")
    import torch

    p0 = np.array([1.0, -2.0, 0.5], np.float32)
    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=0.1)
    jopt = O.adam(0.1)
    jp = jnp.asarray(p0)
    state = jopt.init(jp)
    rng = np.random.default_rng(0)
    for _ in range(7):
        g = rng.standard_normal(3).astype(np.float32)
        tp.grad = torch.tensor(g)
        topt.step()
        jp, state = jopt.step(jp, jnp.asarray(g), state)
    np.testing.assert_allclose(
        np.asarray(jp), tp.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_adam_differentiable_through_steps():
    """d(final params)/d(initial params) flows through the scan — the core
    requirement replacing robust_higher."""
    opt = O.adam(0.1)

    def run(p0):
        state = opt.init(p0)

        def body(carry, _):
            p, s = carry
            g = 2.0 * p  # grad of p²
            p, s = opt.step(p, g, s)
            return (p, s), None

        (p, _), _ = jax.lax.scan(body, (p0, state), None, length=5)
        return jnp.sum(p**2)

    g = jax.grad(run)(jnp.array([1.0, 2.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_sgd_and_momentum():
    p = jnp.array([1.0])
    g = jnp.array([0.5])
    opt = O.sgd(0.1)
    p1, s = opt.step(p, g, opt.init(p))
    np.testing.assert_allclose(np.asarray(p1), [0.95])

    # torch-style momentum: v=mu*v+g; p-=lr*v
    optm = O.sgd(0.1, momentum=0.9)
    s = optm.init(p)
    p1, s = optm.step(p, g, s)
    np.testing.assert_allclose(np.asarray(p1), [0.95])
    p2, s = optm.step(p1, g, s)
    # v2 = 0.9*0.5+0.5 = 0.95; p2 = 0.95 - 0.095
    np.testing.assert_allclose(np.asarray(p2), [0.855], rtol=1e-6)


def test_heavy_ball():
    opt = O.heavy_ball(0.1, momentum=0.5)
    p = jnp.array([1.0])
    s = opt.init(p)
    p1, s = opt.step(p, jnp.array([1.0]), s)
    np.testing.assert_allclose(np.asarray(p1), [0.9])  # no prev motion
    p2, s = opt.step(p1, jnp.array([1.0]), s)
    # p2 = 0.9 - 0.1 + 0.5*(0.9-1.0) = 0.75
    np.testing.assert_allclose(np.asarray(p2), [0.75], rtol=1e-6)


def test_step_lr():
    sched = O.step_lr(1.0, step_size=3, gamma=0.1)
    lrs = [float(sched(jnp.int32(t))) for t in range(7)]
    np.testing.assert_allclose(
        lrs, [1, 1, 1, 0.1, 0.1, 0.1, 0.01], rtol=1e-5
    )


def test_adam_hypergrad_finite_at_exactly_zero_grad():
    """Differentiating THROUGH an Adam step must stay finite when an inner
    gradient entry is exactly zero (dead ReLU/pool path; common under bf16).

    Regression test for the 0·inf NaN: with nu = (1−β₂)·g² = 0,
    d√nu/dnu = inf and the chain rule produced NaN hypergradients.
    `_sqrt_safe` takes the 0 dead-path subgradient instead.
    """
    opt = O.adam(1e-3)

    def inner_loss(p, h):
        return jnp.sum(jnp.square(p[1:] - h))  # p[0] gets gradient exactly 0

    def outer(h):
        p = jnp.array([1.0, 2.0, 3.0])
        g = jax.grad(inner_loss)(p, h)
        p2, _ = opt.step(p, g, opt.init(p))
        return jnp.sum(jnp.square(p2))

    val, grad = jax.value_and_grad(outer)(jnp.float32(0.5))
    assert np.isfinite(float(val)) and np.isfinite(float(grad))


# --- round 2: the full DifferentiableOptimizer zoo vs torch.optim ---------
# Reference vendored zoo: robust_higher/optim.py:264-756 registers
# SGD/Adam/AdamW/Adadelta/Adagrad/Adamax/ASGD/RMSprop/Rprop. torch.optim is
# the oracle because the vendored classes reproduce torch update rules.

_ZOO_CASES = [
    ("adamw", dict(lr=0.05), "AdamW", dict(lr=0.05)),
    ("rmsprop", dict(lr=0.05), "RMSprop", dict(lr=0.05)),
    ("rmsprop", dict(lr=0.05, momentum=0.9, centered=True),
     "RMSprop", dict(lr=0.05, momentum=0.9, centered=True)),
    ("adagrad", dict(lr=0.1, lr_decay=0.01), "Adagrad",
     dict(lr=0.1, lr_decay=0.01)),
    ("adadelta", dict(lr=1.0), "Adadelta", dict(lr=1.0)),
    ("adamax", dict(lr=0.02), "Adamax", dict(lr=0.02)),
    ("asgd", dict(lr=0.05), "ASGD", dict(lr=0.05)),
    ("rprop", dict(lr=0.01), "Rprop", dict(lr=0.01)),
]


@pytest.mark.parametrize("name,jkw,tname,tkw", _ZOO_CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(_ZOO_CASES)])
def test_zoo_matches_torch(name, jkw, tname, tkw):
    if not reference_available:
        pytest.skip("torch oracle unavailable")
    import torch

    p0 = np.array([1.0, -2.0, 0.5, 3.0], np.float32)
    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = getattr(torch.optim, tname)([tp], **tkw)
    jopt = O.make(name, **jkw)
    jp = jnp.asarray(p0)
    state = jopt.init(jp)
    rng = np.random.default_rng(3)
    for _ in range(9):
        g = rng.standard_normal(4).astype(np.float32)
        tp.grad = torch.tensor(g)
        topt.step()
        jp, state = jopt.step(jp, jnp.asarray(g), state)
    np.testing.assert_allclose(
        np.asarray(jp), tp.detach().numpy(), rtol=2e-5, atol=1e-6
    )


def test_zoo_differentiable_and_registry():
    """Every zoo member is scan-differentiable (the property that replaces
    robust_higher's create_graph machinery) and reachable via O.make."""
    for name in sorted(O.REGISTRY):
        opt = O.make(name, 0.01)

        def run(p0):
            state = opt.init(p0)

            def body(carry, _):
                p, s = carry
                p, s = opt.step(p, 2.0 * p, s)
                return (p, s), None

            (p, _), _ = jax.lax.scan(body, (p0, state), None, length=3)
            return jnp.sum(p**2)

        g = jax.grad(run)(jnp.array([1.0, 2.0]))
        assert np.all(np.isfinite(np.asarray(g))), name

    with pytest.raises(ValueError):
        O.make("nadam", 0.01)


def test_engine_accepts_inner_optimizer(halfmoon_bundle=None):
    """PSVI(inner_optimizer=...) validates and threads to the inner loop."""
    from psvi_tpu.inference.psvi import PSVI
    from psvi_tpu.data.datasets import DataBundle

    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 2)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int32)
    data = DataBundle(x, y, x, y, 64, 2, 2)
    with pytest.raises(ValueError):
        PSVI(data, num_pseudo=4, inner_optimizer="nadam")
    eng = PSVI(data, num_pseudo=4, inner_optimizer="rmsprop",
               num_epochs=1, inner_it=2, mc_samples=3, log_every=1)
    assert eng.inner_optimizer == "rmsprop"

"""Fused conv-family (LeNet) bilevel inner unroll — ops/fused_lenet.py.

Oracle strategy: the module's own XLA fallback (`backend='xla'`) runs the
IDENTICAL pure one-iteration body (`_make_body`) as a plain unrolled jit
program, so the custom_vjp'd kernel path can be checked for (a) forward
equality, (b) hypergradient equality w.r.t. (params0, patches, v, alpha)
through the custom_vjp, and (c) engine-level step equality against the
plain `_nested_step` scan — all on CPU with `eps_mode='input'` (explicit
noise; the in-kernel Mosaic PRNG has no CPU twin). Interpret-mode Pallas
runs (kernel A/B actually executed through the Pallas machinery) are in
the slow tier; compiled-TPU equality lives in the scratch-free probe runs
recorded in BENCHMARKS.md ("conv-family fused kernel").

Reference semantics under test: ``psvi/inference/psvi_classes.py:541-600``
(nested_step) at the production LeNet config of ``second_vi_run.ipynb``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psvi_tpu.ops import fused_lenet as FL

# tiny config: full LeNet topology, toy widths kept the real ones (the
# layout math depends on them); T/S/M shrunk for CPU speed
T, S, M = 3, 3, 4


def _toy_engine(**kw):
    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("synth_mnist")
    kw.setdefault("method", "psvi_learn_v")
    return PSVI(
        data, num_pseudo=M, mc_samples=S, architecture="lenet",
        inner_it=T, num_epochs=1, data_minibatch=16, log_every=1000,
        init_sd=1e-3, seed=0, **kw,
    )


def _kernel_inputs(eng, cfg, k_inner=7):
    """Engine state → flat kernel inputs, eps stacks bit-matched to the
    plain path's per-iteration stream."""
    state = eng.state
    didx = list(eng.net.variational_layers)
    p_flat = FL.pack_params(tuple(state.params[i] for i in didx), cfg)
    patches = FL.lenet_patches(state.u, cfg)
    keys = jax.random.split(jax.random.PRNGKey(k_inner), T)
    eps_ts = jax.vmap(lambda k: eng.net.sample_eps(k, S))(keys)
    stacks = FL.eps_stacks_from_tree(eps_ts, didx, cfg)
    v = state.v.reshape(1, M)
    alpha = state.alpha.reshape(1, 1)
    ypse = jax.nn.one_hot(state.z.astype(jnp.int32), cfg.nc).T
    lr = jnp.full((1, 1), 1e-3, jnp.float32)
    seed = jnp.zeros((1, 2), jnp.float32)
    return state, didx, p_flat, patches, stacks, v, alpha, ypse, lr, seed


def test_pack_unpack_roundtrip():
    eng = _toy_engine()
    cfg = FL.cfg_from_engine(eng)
    didx = list(eng.net.variational_layers)
    layer_params = tuple(eng.state.params[i] for i in didx)
    flat = FL.pack_params(layer_params, cfg)
    assert [tuple(x.shape) for x in flat] == [
        tuple(s) for s in cfg.param_shapes()
    ]
    back = FL.unpack_params(flat, cfg)
    for orig, rt in zip(layer_params, back):
        for k in orig:
            np.testing.assert_array_equal(orig[k], rt[k])


def test_supports_gating():
    eng = _toy_engine()
    assert FL.supports(eng)
    cfg = FL.cfg_from_engine(eng)
    assert (cfg.T, cfg.S, cfg.M, cfg.H) == (T, S, M, 28)
    assert cfg.fc == (400, 120, 84, 10)
    assert cfg.parameterised and not cfg.use_alpha
    # trial-vmap excluded (untested Mosaic path under jax.vmap)
    eng._in_trial_vmap = True
    assert not FL.supports(eng)
    eng._in_trial_vmap = False
    # learn_z soft labels: the kernel emits no d/ypse cotangent — must be
    # gated out, not silently zero (round-4 advisor finding)
    eng2 = _toy_engine(method="psvi", learn_z=True)
    assert eng2.spec.learn_z and not FL.supports(eng2)
    # non-LeNet architectures
    eng3 = _toy_engine(truncated=True)
    assert not FL.supports(eng3)
    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    mlp = PSVI(
        read_dataset("halfmoon"), method="psvi_learn_v", num_pseudo=4,
        mc_samples=3, architecture="fn", inner_it=2, num_epochs=1,
        data_minibatch=8, log_every=1000, seed=0,
    )
    assert not FL.supports(mlp)
    # alpha variant maps into the config
    enga = _toy_engine(method="psvi_alpha_v")
    if FL.supports(enga):
        assert FL.cfg_from_engine(enga).use_alpha


def test_xla_unroll_matches_plain_engine_inner():
    """The module's XLA fallback (same body as the kernels) must
    reproduce the ENGINE's plain `_run_inner` scan: same inner-loss
    trajectory and same paramsT, given the same noise stream."""
    eng = _toy_engine(fused_inner=False)
    cfg = FL.cfg_from_engine(eng).__class__(**{
        **FL.cfg_from_engine(eng).__dict__, "eps_mode": "input",
    })
    state, didx, p_flat, patches, stacks, v, alpha, ypse, lr, seed = (
        _kernel_inputs(eng, cfg)
    )
    fn = FL.make_fused_unroll(cfg, backend="xla")
    pT_flat, losses = fn(p_flat, patches, v, alpha, ypse, stacks, lr, seed)

    paramsT, _, inner_losses = eng._run_inner(
        state.params, eng.net.prep_input(state.u), state.z, state.v,
        state.alpha, jax.random.PRNGKey(7), jnp.float32(1e-3),
    )
    np.testing.assert_allclose(
        np.asarray(losses).ravel(), np.asarray(inner_losses), rtol=2e-5
    )
    back = FL.unpack_params(pT_flat, cfg)
    for j, i in enumerate(didx):
        for k in back[j]:
            np.testing.assert_allclose(
                back[j][k], paramsT[i][k], atol=2e-5,
                err_msg=f"layer {i} {k}",
            )


def test_xla_unroll_hypergrad_matches_plain_engine():
    """Outer hypergradients (u, v) THROUGH the unroll: module fallback
    (patches chain rule included) vs the engine's jax.grad-through-scan."""
    eng = _toy_engine(fused_inner=False)
    base = FL.cfg_from_engine(eng)
    cfg = base.__class__(**{**base.__dict__, "eps_mode": "input"})
    state, didx, p_flat, patches, stacks, v, alpha, ypse, lr, seed = (
        _kernel_inputs(eng, cfg)
    )
    fn = FL.make_fused_unroll(cfg, backend="xla")
    proj = [
        jax.random.normal(jax.random.PRNGKey(100 + i), tuple(s))
        for i, s in enumerate(cfg.param_shapes())
    ]

    def outer_fused(u, v_raw):
        pats = FL.lenet_patches(u, cfg)
        pT, losses = fn(
            p_flat, pats, v_raw.reshape(1, M), alpha, ypse, stacks, lr,
            seed,
        )
        return (
            sum(jnp.sum(a * w) for a, w in zip(pT, proj))
            + jnp.sum(losses)
        )

    def outer_plain(u, v_raw):
        paramsT, _, il = eng._run_inner(
            state.params, eng.net.prep_input(u), state.z, v_raw,
            state.alpha, jax.random.PRNGKey(7), jnp.float32(1e-3),
        )
        flat = FL.pack_params(tuple(paramsT[i] for i in didx), cfg)
        return (
            sum(jnp.sum(a * w) for a, w in zip(flat, proj))
            + jnp.sum(il)
        )

    gu_f, gv_f = jax.grad(outer_fused, argnums=(0, 1))(state.u, state.v)
    gu_p, gv_p = jax.grad(outer_plain, argnums=(0, 1))(state.u, state.v)
    for a, b, nm in ((gu_f, gu_p, "u"), (gv_f, gv_p, "v")):
        cos = float(
            jnp.sum(a * b)
            / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-30)
        )
        assert cos > 0.9999, f"hypergrad {nm} cos={cos}"
        np.testing.assert_allclose(a, b, atol=5e-4 * float(
            jnp.max(jnp.abs(b)) + 1e-30
        ), err_msg=nm)


def test_engine_fused_lenet_step_matches_plain():
    """Full engine step: `_nested_step_fused_lenet` (XLA fallback path,
    bit-matched 'stream' noise) vs `_nested_step` — same loss, same
    updated hyperparameters, same updated params."""
    eng_p = _toy_engine(fused_inner=False)
    eng_f = _toy_engine(fused_inner=False, fused_eps="stream")
    key = jax.random.PRNGKey(3)
    s_p, aux_p = eng_p._nested_step(eng_p.state, key)
    s_f, aux_f = eng_f._nested_step_fused_lenet(eng_f.state, key)
    np.testing.assert_allclose(
        float(aux_f["outer_loss"]), float(aux_p["outer_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_f["inner_losses"]),
        np.asarray(aux_p["inner_losses"]), rtol=2e-5,
    )
    # u/v are post-Adam-update: near-zero hypergradient entries amplify
    # reassociation noise through the sqrt-normalized step, so compare
    # at the update's own scale (lr ~1e-3, observed max diff ~2e-4)
    np.testing.assert_allclose(s_f.u, s_p.u, atol=1e-3)
    np.testing.assert_allclose(s_f.v, s_p.v, atol=1e-3)
    for pf, pp in zip(s_f.params, s_p.params):
        for k in pf:
            np.testing.assert_allclose(
                pf[k], pp[k], atol=3e-5, err_msg=k
            )


@pytest.mark.slow
def test_interpret_kernels_match_oracle():
    """Kernels A and B executed through the Pallas machinery (interpret
    mode, CPU) vs the XLA oracle: forward paramsT/losses and the
    custom_vjp hypergradients w.r.t. (patches, v)."""
    eng = _toy_engine(fused_inner=False)
    base = FL.cfg_from_engine(eng)
    cfg = base.__class__(**{**base.__dict__, "eps_mode": "input"})
    state, didx, p_flat, patches, stacks, v, alpha, ypse, lr, seed = (
        _kernel_inputs(eng, cfg)
    )
    fx = FL.make_fused_unroll(cfg, backend="xla")
    fi = FL.make_fused_unroll(cfg, backend="interpret")
    pT_x, ls_x = fx(p_flat, patches, v, alpha, ypse, stacks, lr, seed)
    pT_i, ls_i = fi(p_flat, patches, v, alpha, ypse, stacks, lr, seed)
    np.testing.assert_allclose(
        np.asarray(ls_i), np.asarray(ls_x), rtol=1e-4
    )
    for i, (a, b) in enumerate(zip(pT_i, pT_x)):
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=f"tensor {i}")

    proj = [
        jax.random.normal(jax.random.PRNGKey(100 + i), x.shape)
        for i, x in enumerate(pT_x)
    ]

    def loss(fn, pats, v_):
        pT, ls = fn(p_flat, pats, v_, alpha, ypse, stacks, lr, seed)
        return sum(jnp.sum(a * w) for a, w in zip(pT, proj)) + jnp.sum(ls)

    gx = jax.grad(lambda pa, v_: loss(fx, pa, v_), argnums=(0, 1))(
        patches, v
    )
    gi = jax.grad(lambda pa, v_: loss(fi, pa, v_), argnums=(0, 1))(
        patches, v
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gi), jax.tree_util.tree_leaves(gx)
    ):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(a, b, atol=2e-3 * scale)


_on_tpu = jax.devices()[0].platform in ("tpu", "axon")


@pytest.mark.skipif(not _on_tpu, reason="compiled Mosaic kernels need TPU")
def test_compiled_kernels_match_oracle_tpu():
    """Compiled (Mosaic) kernels A and B vs the XLA fallback on real TPU
    (run with PSVI_TPU_TESTS=1). Kernel A must match to bf16-pass noise;
    kernel B hypergradients to high cosine (the compiled precision
    policy runs the tuned default per-site exactness —
    fused_lenet._site_precision)."""
    eng = _toy_engine(fused_inner=False)
    base = FL.cfg_from_engine(eng)
    cfg = base.__class__(**{**base.__dict__, "eps_mode": "input"})
    state, didx, p_flat, patches, stacks, v, alpha, ypse, lr, seed = (
        _kernel_inputs(eng, cfg)
    )
    fx = FL.make_fused_unroll(cfg, backend="xla")
    fp = FL.make_fused_unroll(cfg, backend="pallas")
    pT_x, ls_x = fx(p_flat, patches, v, alpha, ypse, stacks, lr, seed)
    pT_p, ls_p = fp(p_flat, patches, v, alpha, ypse, stacks, lr, seed)
    np.testing.assert_allclose(
        np.asarray(ls_p), np.asarray(ls_x), rtol=1e-4
    )
    for i, (a, b) in enumerate(zip(pT_p, pT_x)):
        np.testing.assert_allclose(a, b, atol=7e-3, err_msg=f"tensor {i}")

    proj = [
        jax.random.normal(jax.random.PRNGKey(100 + i), x.shape)
        for i, x in enumerate(pT_x)
    ]

    def loss(fn, pats, v_):
        pT, ls = fn(p_flat, pats, v_, alpha, ypse, stacks, lr, seed)
        return sum(jnp.sum(a * w) for a, w in zip(pT, proj)) + jnp.sum(ls)

    gx = jax.grad(lambda pa, v_: loss(fx, pa, v_), argnums=(0, 1))(
        patches, v
    )
    gp = jax.grad(lambda pa, v_: loss(fp, pa, v_), argnums=(0, 1))(
        patches, v
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)
    ):
        cos = float(
            jnp.sum(a * b)
            / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-30)
        )
        assert cos > 0.99, f"compiled hypergrad cos={cos}"

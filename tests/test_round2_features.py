"""Round-2 feature coverage: pallas dense-backend plumbing, the
loaded-from-PSVI selection path, distance_fn threading, and the debug
guardrail flags (VERDICT round-1 items 5, 7, 8)."""

import numpy as np
import pandas as pd
import pytest

import jax

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI
from psvi_tpu.inference.selection import (
    CoresetSelect,
    load_embeddings_csv,
    load_scores_csv,
)


# ----------------------------------------------------------------------
# pallas dense backend (engine plumbing; off-TPU the op falls back to the
# identical-math XLA formulation, so numerics must match on CPU)
# ----------------------------------------------------------------------


def test_with_dense_backend_rewrites_vilinear():
    from psvi_tpu.models.layers import VILinear
    from psvi_tpu.models.networks import set_up_model
    from psvi_tpu.models.layers import with_dense_backend

    net = set_up_model(architecture="fn", D=2, n_hidden=8, nc=2,
                       init_sd=1e-3)
    net2 = with_dense_backend(net, "pallas")
    dense = [l for l in net2.layers if isinstance(l, VILinear)]
    assert dense and all(l.backend == "pallas" for l in dense)
    # original untouched (pure rewrite)
    assert all(
        l.backend == "xla" for l in net.layers if isinstance(l, VILinear)
    )
    with pytest.raises(ValueError, match="backend"):
        with_dense_backend(net, "cuda")


def test_pallas_backend_engine_matches_xla():
    """PSVI(backend='pallas') runs the same joint step as backend='xla';
    on CPU the fused op falls back to the reference XLA math, so the two
    engines must agree to float tolerance."""
    data = read_dataset("halfmoon")
    kw = dict(
        method="psvi_learn_v", num_pseudo=8, mc_samples=4,
        architecture="fn", n_hidden=16, inner_it=2, num_epochs=2,
        data_minibatch=64, log_every=10, init_sd=1e-3, trainer="joint",
        seed=0,
    )
    eng_x = PSVI(data, backend="xla", **kw)
    eng_p = PSVI(data, backend="pallas", **kw)
    k = jax.random.PRNGKey(3)
    sx, ax = eng_x._step(eng_x.state, k)
    sp, ap = eng_p._step(eng_p.state, k)
    np.testing.assert_allclose(
        float(ax["outer_loss"]), float(ap["outer_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sx.v), np.asarray(sp.v), rtol=1e-5, atol=1e-7
    )
    for px, pp in zip(
        jax.tree_util.tree_leaves(sx.params),
        jax.tree_util.tree_leaves(sp.params),
    ):
        np.testing.assert_allclose(
            np.asarray(px), np.asarray(pp), rtol=1e-4, atol=1e-6
        )


@pytest.mark.parametrize("trainer", ["nested", "hyper"])
def test_pallas_backend_rejects_higher_order_trainers(trainer):
    """nested needs double-backward, hyper's AID solvers need jvp — the
    fused kernel's custom_vjp provides neither (verified empirically:
    hyper+pallas raises 'can't apply forward-mode autodiff (jvp) to a
    custom_vjp function' at trace time)."""
    data = read_dataset("halfmoon")
    with pytest.raises(ValueError, match="pallas"):
        PSVI(data, method="psvi_learn_v", num_pseudo=8,
             architecture="fn", trainer=trainer, backend="pallas")


def test_pallas_backend_alternating_trainer_runs():
    data = read_dataset("halfmoon")
    eng = PSVI(data, method="psvi_learn_v", num_pseudo=8, mc_samples=4,
               architecture="fn", n_hidden=16, inner_it=2, num_epochs=2,
               data_minibatch=64, log_every=10, init_sd=1e-3,
               trainer="alternating", seed=0, backend="pallas")
    _, aux = eng._step(eng.state, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["outer_loss"]))


# ----------------------------------------------------------------------
# loaded-from-PSVI selection path (ref _run_kmeans_loaded /
# _get_uncertainty_score_loaded, inference/utils.py:856-876, 1025-1034)
# ----------------------------------------------------------------------


def _toy_data(n=40, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = np.arange(n) % 2
    return x, y.astype(np.float32)


def _write_artifacts(folder, dnm, seed, n, d_emb=4, rng_seed=7):
    rng = np.random.default_rng(rng_seed)
    emb = rng.standard_normal((n, d_emb)).astype(np.float32)
    np.savetxt(folder / f"embedding_{dnm}_{seed}.csv", emb, delimiter=",")
    scores = pd.DataFrame({
        "el2n": rng.random(n),
        "forgetting": rng.random(n),
        "entropy": rng.random(n),
        "least_confidence": rng.random(n),
    })
    scores.to_csv(folder / f"score_psvi_{dnm}_{seed}.csv", index=False)
    return emb, scores


def test_load_csv_roundtrip(tmp_path):
    emb, scores = _write_artifacts(tmp_path, "toy", 0, n=12)
    got_e = load_embeddings_csv(str(tmp_path), "toy", 0)
    np.testing.assert_allclose(got_e, emb, rtol=1e-5)
    got_s = load_scores_csv(str(tmp_path), "toy", 0, "entropy")
    np.testing.assert_allclose(got_s, scores["entropy"].values, rtol=1e-6)


def test_loaded_scores_drive_selection(tmp_path):
    """With loaded_from_psvi=True, ScoreSelection reads the saved CSV and
    never pretrains — the deterministic top-n-per-class pick must follow
    the fabricated scores exactly."""
    n = 40
    x, y = _toy_data(n)
    dnm, seed = "toy", 0
    _write_artifacts(tmp_path, dnm, seed, n)
    # overwrite entropy with a spike on known indices
    scores = pd.read_csv(tmp_path / f"score_psvi_{dnm}_{seed}.csv")
    scores["entropy"] = 0.0
    want = [0, 2, 4, 6, 1, 3, 5, 7]  # 4 per class (classes alternate)
    scores.loc[want, "entropy"] = 10.0
    scores.to_csv(tmp_path / f"score_psvi_{dnm}_{seed}.csv", index=False)

    sel = CoresetSelect(
        x, y, x, y, num_pseudo=8, nc=2, score_method="entropy",
        architecture="logistic_regression", D=x.shape[1],
        loaded_from_psvi=True, data_folder=str(tmp_path), dnm=dnm, seed=seed,
    )
    idx, xs, zs, _w = sel.select_data()
    assert sorted(int(i) for i in idx) == sorted(want)
    # the loaded path must not have trained anything
    assert sel.method.pretrained_vi is None


def test_loaded_embeddings_change_kmeans_selection(tmp_path):
    """loaded_from_psvi=True makes KmeansSelection cluster the saved
    embeddings instead of raw inputs — with shuffled-feature embeddings the
    selected coreset differs from the raw-space run at the same seed."""
    n = 60
    x, y = _toy_data(n, d=2, seed=1)
    dnm, seed = "toy2", 0
    # embeddings = raw features of OTHER points (a fixed permutation) so the
    # cluster structure genuinely differs from raw space
    perm = np.roll(np.arange(n), n // 2)
    np.savetxt(tmp_path / f"embedding_{dnm}_{seed}.csv", x[perm],
               delimiter=",")

    common = dict(
        num_pseudo=10, nc=2, score_method="kmeans",
        architecture="logistic_regression", D=2, seed=seed, dnm=dnm,
    )
    sel_raw = CoresetSelect(x, y, x, y, **common)
    sel_loaded = CoresetSelect(
        x, y, x, y, loaded_from_psvi=True, data_folder=str(tmp_path),
        **common,
    )
    idx_raw, *_ = sel_raw.select_data()
    idx_loaded, *_ = sel_loaded.select_data()
    assert len(idx_loaded) == 10
    assert sorted(idx_raw) != sorted(idx_loaded)


def test_distance_fn_threads_into_selection():
    """A non-default distance_fn must change the kmeans selection
    (VERDICT round-1 weak #7: the flag used to silently no-op)."""
    rng = np.random.default_rng(3)
    # points on two rays at very different radii: cosine clusters by angle,
    # euclidean by radius — selections must differ
    n = 80
    ang = np.where(np.arange(n) % 2 == 0, 0.2, 1.4)
    rad = np.where(np.arange(n) < n // 2, 1.0, 20.0)
    x = np.stack([rad * np.cos(ang), rad * np.sin(ang)], 1).astype(np.float32)
    x += 0.05 * rng.standard_normal(x.shape).astype(np.float32)
    y = (np.arange(n) % 2).astype(np.float32)

    common = dict(num_pseudo=8, nc=2, score_method="kmeans",
                  architecture="logistic_regression", D=2, seed=0)
    idx_e, *_ = CoresetSelect(x, y, x, y, distance_fn="euclidean",
                              **common).select_data()
    idx_c, *_ = CoresetSelect(x, y, x, y, distance_fn="cosine",
                              **common).select_data()
    assert len(idx_e) == len(idx_c) == 8
    assert sorted(idx_e) != sorted(idx_c)


def test_engine_threads_selection_kwargs():
    """PSVI passes distance_fn / last_layer_only / loaded_from_psvi through
    to CoresetSelect on the init_at='custom' path (psvi.py custom-init)."""
    import inspect

    import psvi_tpu.inference.psvi as P

    src = inspect.getsource(P.PSVI._init_pseudodata if hasattr(
        P.PSVI, "_init_pseudodata") else P.PSVI)
    for kw in ("distance_fn", "last_layer_only", "loaded_from_psvi"):
        assert f"{kw}=self.{kw}" in src


# ----------------------------------------------------------------------
# CLI flags: --hypergrad_approx / --debug_nans / --fp64 / --backend
# ----------------------------------------------------------------------


def test_cli_parses_round2_flags():
    from psvi_tpu.experiments import build_parser

    args = build_parser().parse_args([
        "--datasets", "halfmoon", "--methods", "psvi",
        "--hypergrad_approx", "fixed_point", "--backend", "pallas",
        "--debug_nans", "--fp64",
    ])
    assert args.hypergrad_approx == "fixed_point"
    assert args.backend == "pallas"
    assert args.debug_nans and args.fp64


def test_cli_hyper_trainer_fixed_point(tmp_path):
    """VERDICT item 5 done-criterion: --hypergrad_approx fixed_point runs
    the halfmoon hyper trainer green end-to-end."""
    from psvi_tpu.experiments import main

    res = main([
        "--datasets", "halfmoon", "--methods", "psvi_learn_v",
        "--coreset_sizes", "8", "--num_trials", "1", "--num_epochs", "4",
        "--inner_it", "3", "--mc_samples", "4", "--log_every", "2",
        "--init_sd", "1e-3", "--trainer", "hyper", "--hyper_K", "5",
        "--hypergrad_approx", "fixed_point",
        "--results_folder", str(tmp_path),
    ])
    r = res["halfmoon"]["psvi_learn_v"][8][0]
    assert all(np.isfinite(r["accs"]))

"""Checkpoint/resume, scoring runs, results persistence."""

import os

import numpy as np

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI
from psvi_tpu.utils.results import save_results, load_results, retrieve_results


def _engine(data, **kw):
    base = dict(
        method="psvi_alpha_v", num_pseudo=8, mc_samples=4,
        architecture="logistic_regression", inner_it=3, num_epochs=4,
        data_minibatch=64, log_every=2, init_sd=1e-3, seed=0,
    )
    base.update(kw)
    return PSVI(data, **base)


def test_checkpoint_roundtrip(tmp_path):
    data = read_dataset("halfmoon")
    import jax

    eng = _engine(data)
    # advance a couple of steps
    for i in range(2):
        eng.state, _ = eng._step(eng.state, jax.random.PRNGKey(i))
    path = str(tmp_path / "ckpt.npz")
    eng.save_checkpoint(path)

    eng2 = _engine(data)
    eng2.load_checkpoint(path)
    # states identical
    l1 = jax.tree_util.tree_leaves(eng.state)
    l2 = jax.tree_util.tree_leaves(eng2.state)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed steps identical
    k = jax.random.PRNGKey(99)
    s1, a1 = eng._step(eng.state, k)
    s2, a2 = eng2._step(eng2.state, k)
    np.testing.assert_allclose(
        float(a1["outer_loss"]), float(a2["outer_loss"]), rtol=1e-6
    )


def test_scoring_run_writes_csvs(tmp_path):
    data = read_dataset("halfmoon")
    eng = _engine(
        data, method="psvi_learn_v", architecture="fn", n_hidden=8,
        scoring_run=True, data_folder=str(tmp_path), dnm="halfmoon",
    )
    eng.run_psvi()
    score_path = tmp_path / "score_psvi_halfmoon_0.csv"
    emb_path = tmp_path / "embedding_halfmoon_0.csv"
    assert score_path.exists() and emb_path.exists()
    import pandas as pd

    df = pd.read_csv(score_path)
    assert set(df.columns) == {
        "el2n", "forgetting", "entropy", "least_confidence"
    }
    assert len(df) == data.N
    emb = np.loadtxt(emb_path, delimiter=",")
    assert emb.shape == (data.N, 8)  # penultimate width = n_hidden


def test_results_roundtrip_and_retrieve(tmp_path):
    data = read_dataset("halfmoon")
    eng = _engine(data, log_pseudodata=True)
    res = eng.run_psvi()
    results = {"halfmoon": {"psvi_alpha_v": {8: {0: res}}}}
    folder = str(tmp_path / "run1")
    save_results(results, folder, config={"num_epochs": 4})
    loaded = load_results(folder)
    assert loaded["halfmoon"]["psvi_alpha_v"][8][0]["accs"] == res["accs"]

    d = retrieve_results(str(tmp_path), "run1", "halfmoon", "psvi_alpha_v", 8)
    assert d["weights"] is not None
    assert d["us"] is not None


def test_saved_coreset_warm_start(tmp_path):
    data = read_dataset("halfmoon")
    eng = _engine(data, log_pseudodata=True)
    res = eng.run_psvi()
    results = {"halfmoon": {"psvi_alpha_v": {8: {0: res}}}}
    save_results(results, str(tmp_path / "run1"), config={})

    eng2 = _engine(data, results_folder=str(tmp_path))
    eng2.load_saved_coreset(
        "run1", "halfmoon", "psvi_alpha_v", 8,
        ablated_weights=False, ablated_alpha=False, ablated_labels=False,
    )
    np.testing.assert_allclose(
        np.asarray(eng2.state.v), res["vs"][-1], rtol=1e-5
    )

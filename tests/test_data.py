"""Data layer tests: registry, split semantics, shapes, normalization."""

import numpy as np
import pytest

from psvi_tpu.data import read_dataset, read_regression_dataset
from psvi_tpu.data.datasets import split_data, hyperparams_for_regression


def test_halfmoon_split_semantics():
    d = read_dataset("halfmoon", test_ratio=0.2)
    assert d.N == 800 and d.xt.shape[0] == 200
    assert d.D == 2 and d.nc == 2
    assert set(np.unique(d.y)) == {0.0, 1.0}


def test_four_blobs():
    d = read_dataset("four_blobs")
    assert d.nc == 4
    assert d.N + len(d.xt) == 1000


def test_synth_lr_dimension_parsing():
    d = read_dataset("synth_lr_7")
    assert d.D == 7
    assert set(np.unique(d.y)) <= {0.0, 1.0}  # −1 labels mapped to 0


def test_normal_mvn():
    d = read_dataset("normal_mvn")
    assert d.D == 2 and d.nc == 2


def test_synth_mnist_shapes():
    d = read_dataset("synth_mnist")
    assert d.x.shape[1:] == (1, 28, 28)
    assert d.channels == 1 and d.nc == 10 and d.D == 784


def test_vision_gating_error():
    with pytest.raises(FileNotFoundError):
        read_dataset("MNIST", data_folder="/tmp/definitely-missing")


def test_split_data_fractions():
    idx = split_data(100, p_split=(0.6, 0.2, 0.2), seed=0)
    assert len(idx["train"]) == 60
    assert len(idx["val"]) == 20
    assert len(idx["test"]) == 20
    all_idx = np.concatenate([idx["train"], idx["val"], idx["test"]])
    assert sorted(all_idx) == list(range(100))


def test_split_data_counts():
    idx = split_data(50, n_split=(30, 10, 10), seed=0)
    assert len(idx["train"]) == 30 and len(idx["test"]) == 10


def test_regression_dataset_normalization():
    d = read_regression_dataset("sinus", seed=0, num_test=100)
    # train inputs/targets standardized; test targets unnormalized
    np.testing.assert_allclose(d.x.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(d.y.std(), 1.0, atol=1e-4)
    assert abs(float(d.yt.mean())) < 1.0  # sin values, not standardized
    assert d.xt.shape[0] == 100
    assert d.taus == tuple(hyperparams_for_regression()["sinus"])


def test_unknown_dataset():
    with pytest.raises(ValueError):
        read_dataset("nope")


def test_synth_mnist_hard_shapes_and_ceiling():
    """The non-saturating benchmark family: MNIST-shaped, deterministic per
    seed, with a measured Bayes ceiling strictly inside (0.8, 0.98) — the
    property the wall-clock-to-accuracy study depends on."""
    from psvi_tpu.data import synthetic

    d = read_dataset("synth_mnist_hard")
    assert d.x.shape == (6000, 1, 28, 28)
    assert d.xt.shape == (1000, 1, 28, 28)
    assert d.nc == 10 and d.channels == 1
    d2 = read_dataset("synth_mnist_hard")
    np.testing.assert_array_equal(d.x[:16], d2.x[:16])  # deterministic

    rng = np.random.default_rng(0)
    x, y, xt, yt, templates = synthetic.make_synth_images_hard(
        n_per_class=40, n_test_per_class=40, rng=rng
    )
    ceiling = synthetic.nearest_template_accuracy(xt, yt, templates)
    assert 0.8 < ceiling < 0.98, ceiling
    # label noise really present: some train labels differ from the
    # nearest-template MAP assignment even at zero pixel noise distance
    assert ceiling < 1.0


def test_real_sklearn_datasets():
    """digits / digits28 / breast_cancer are REAL data bundled with
    scikit-learn — shapes, standardization, class coverage, determinism."""
    d = read_dataset("digits")
    assert d.x.shape[1] == 64 and d.nc == 10 and d.channels == 0
    assert d.x.shape[0] + d.xt.shape[0] == 1797
    assert set(np.unique(d.y)) == set(range(10))
    np.testing.assert_allclose(d.x.mean(), 0.0, atol=5e-2)

    d28 = read_dataset("digits28")
    assert d28.x.shape[1:] == (1, 28, 28) and d28.channels == 1
    # same seeded shuffle: labels line up between the two variants
    np.testing.assert_array_equal(d.y, d28.y)
    # upsampling is label-preserving and deterministic
    d28b = read_dataset("digits28")
    np.testing.assert_array_equal(d28.x[:8], d28b.x[:8])

    bc = read_dataset("breast_cancer")
    assert bc.x.shape[1] == 30 and bc.nc == 2
    assert bc.x.shape[0] + bc.xt.shape[0] == 569
    # train-statistic standardization
    np.testing.assert_allclose(bc.x.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(bc.x.std(0), 1.0, atol=1e-4)
    assert set(np.unique(bc.yt)) == {0.0, 1.0}


def test_real_diabetes_regression():
    """UCI diabetes via sklearn: real regression bundle with a tau grid."""
    d = read_regression_dataset("diabetes", seed=0, num_test=100)
    assert d.x.shape[1] == 10 and d.nc == 1
    assert d.xt.shape[0] == 100 and d.xv is not None
    np.testing.assert_allclose(d.x.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(d.y.std(), 1.0, atol=1e-6)
    assert d.taus == tuple(hyperparams_for_regression()["diabetes"])
    assert 70.0 < d.y_std < 90.0  # raw-target scale preserved for de-norm eval

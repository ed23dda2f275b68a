"""Synthetic dataset generators (host-side NumPy).

Re-implementations of the reference generators
(``psvi/experiments/experiments_utils.py``):
- ``make_four_class_dataset``  (ref :299-343) — four 2-D blobs
- ``make_synthetic``           (ref :666-677) — D-dim logistic regression
- ``make_synthetic_normal``    (ref :679-701) — two correlated Gaussians
- ``halfmoon``                 (ref :759-767) — sklearn two moons
- ``sinus``                    (ref :265-268) — 1-D sine regression
- ``make_synth_images``       — NEW: class-structured image set standing in
  for MNIST-shaped benchmarks when no vision data is on disk (zero-egress
  environments); same (N, 1, 28, 28) tensor layout and 10 classes.
"""

from __future__ import annotations

import numpy as np


def make_four_class_dataset(N_K: int = 250, rng=None):
    rng = rng or np.random.default_rng(0)
    X1 = np.stack(
        [0.8 + 0.4 * rng.standard_normal(N_K), 1.5 + 0.4 * rng.standard_normal(N_K)],
        axis=-1,
    )
    X2 = np.stack(
        [0.5 + 0.6 * rng.standard_normal(N_K), -0.2 - 0.1 * rng.standard_normal(N_K)],
        axis=-1,
    )
    X3 = np.stack(
        [2.5 - 0.1 * rng.standard_normal(N_K), 1.0 + 0.6 * rng.standard_normal(N_K)],
        axis=-1,
    )
    cov = np.array([[0.2, 0.1], [0.1, 0.1]])
    X4 = rng.multivariate_normal([-0.5, 1.5], cov, size=N_K)
    X = np.concatenate([X1, X2, X3, X4]).astype(np.float32)
    Y = np.concatenate([np.full(N_K, c) for c in range(4)]).astype(np.float32)
    X[:, 1] -= 1
    X[:, 0] -= 0.5
    perm = rng.permutation(len(X))
    return X[perm], Y[perm]


def make_synthetic(num_datapoints: int = 1000, D: int = 2, rng=None):
    """D-dimensional synthetic logistic regression (ref :666-677)."""
    rng = rng or np.random.default_rng(0)
    th = np.full(D, 5.0)
    X = rng.multivariate_normal(np.zeros(D), np.eye(D), num_datapoints)
    ps = 1.0 / (1.0 + np.exp(-(X * th).sum(axis=1)))
    y = (rng.random(num_datapoints) <= ps).astype(np.float32)
    return X.astype(np.float32), y


def make_synthetic_normal(num_datapoints: int = 1000, rng=None):
    rng = rng or np.random.default_rng(43)
    cov = 8.0 * np.eye(2)
    cov[0, 1] = cov[1, 0] = 2.5
    p1 = rng.multivariate_normal([-1, 1], cov, num_datapoints)
    p2 = rng.multivariate_normal([1, -1], cov, num_datapoints)
    X = np.vstack([p1, p2]).astype(np.float32)
    y = np.concatenate(
        [np.zeros(num_datapoints), np.ones(num_datapoints)]
    ).astype(np.float32)
    perm = rng.permutation(len(X))
    return X[perm], y[perm]


def make_halfmoon(n_samples: int = 1000, noise: float = 0.1, random_state: int = 42):
    from sklearn.datasets import make_moons

    X, Y = make_moons(n_samples=n_samples, noise=noise, random_state=random_state)
    return X.astype(np.float32), Y.astype(np.float32)


def make_sinus(n: int = 1000, rng=None):
    rng = rng or np.random.default_rng(111)
    X = rng.random(n) * 2 * np.pi
    Y = np.sin(X)
    return X[:, None].astype(np.float32), Y[:, None].astype(np.float32)


def make_synth_images_hard(
    n_per_class: int = 600,
    n_test_per_class: int = 100,
    nc: int = 10,
    side: int = 28,
    channels: int = 1,
    sep: float = 0.55,
    noise_sd: float = 1.0,
    max_shift: int = 2,
    label_noise: float = 0.08,
    rng=None,
):
    """Non-saturating MNIST-shaped benchmark with a CONTROLLED Bayes
    ceiling (round-1 VERDICT item 1: ``make_synth_images`` saturates to
    acc 1.0 by epoch 10, so 'wall-clock to reference accuracy' was never a
    meaningful number).

    Generative model: class template = shared low-frequency base +
    ``sep``·class-unique component (4×-upsampled 7×7, so 49 effective
    dims); each sample is a random ±``max_shift``-pixel toroidal shift of
    its template plus N(0, ``noise_sd``²) pixel noise; finally each label
    (train AND test) is replaced with a uniform OTHER class with
    probability ``label_noise``. Two difficulty knobs with separable
    roles: sep/noise_sd control how hard the x-task is (how slowly the
    curve climbs), label_noise caps the ceiling EXACTLY (the Bayes rule
    predicts the true class, which the observed test label matches with
    probability 1−η). The ceiling is measured, not assumed:
    :func:`nearest_template_accuracy` scores the
    nearest-template-over-shifts MAP rule against the noisy labels. At
    the defaults it is ≈ 0.92, so curves plateau well below 1.0 and
    convergence speed is informative (measured on the production PSVI
    LeNet config: M=30 climbs from chance to a ≈0.7 plateau over ~40
    outer epochs).

    Returns (x_train, y_train, x_test, y_test, templates).
    """
    rng = rng or np.random.default_rng(7)
    f = side // 4
    base = rng.standard_normal((1, channels, f, f)).astype(np.float32)
    uniq = rng.standard_normal((nc, channels, f, f)).astype(np.float32)
    templates = (base + sep * uniq).repeat(4, axis=2).repeat(4, axis=3)

    def gen(n_pc):
        xs, ys = [], []
        for c in range(nc):
            dys = rng.integers(-max_shift, max_shift + 1, n_pc)
            dxs = rng.integers(-max_shift, max_shift + 1, n_pc)
            shifted = np.stack([
                np.roll(templates[c], (dy, dx), axis=(1, 2))
                for dy, dx in zip(dys, dxs)
            ])
            noise = noise_sd * rng.standard_normal(
                (n_pc, channels, side, side)
            ).astype(np.float32)
            xs.append(shifted + noise)
            ys.append(np.full(n_pc, c, dtype=np.float32))
        X = np.concatenate(xs)
        Y = np.concatenate(ys)
        # symmetric label noise: flip to a uniform OTHER class w.p. η
        flip = rng.random(len(Y)) < label_noise
        offsets = rng.integers(1, nc, len(Y))
        Y = np.where(flip, (Y + offsets) % nc, Y).astype(np.float32)
        perm = rng.permutation(len(X))
        return X[perm], Y[perm]

    xtr, ytr = gen(n_per_class)
    xte, yte = gen(n_test_per_class)
    return xtr, ytr, xte, yte, templates


def nearest_template_accuracy(x, y, templates, max_shift: int = 2,
                              batch: int = 512):
    """Bayes-optimal accuracy for :func:`make_synth_images_hard` data:
    classify by the nearest template over all generative shifts (the MAP
    rule under the known isotropic-Gaussian noise and uniform shift
    prior — the ceiling no learner can beat in expectation)."""
    nc = templates.shape[0]
    shifts = [
        (dy, dx)
        for dy in range(-max_shift, max_shift + 1)
        for dx in range(-max_shift, max_shift + 1)
    ]
    cand = np.stack([
        np.roll(templates, (dy, dx), axis=(2, 3)) for dy, dx in shifts
    ])  # (n_shifts, nc, C, H, W)
    cand = cand.reshape(len(shifts) * nc, -1)
    labels = np.tile(np.arange(nc), len(shifts))
    X = x.reshape(len(x), -1)
    correct = 0
    for i in range(0, len(X), batch):
        xb = X[i:i + batch]
        d = ((xb[:, None, :] - cand[None, :, :]) ** 2).sum(-1)
        correct += int((labels[np.argmin(d, axis=1)] == y[i:i + batch]).sum())
    return correct / len(X)


def make_synth_images(
    n_per_class: int = 600,
    n_test_per_class: int = 100,
    nc: int = 10,
    side: int = 28,
    channels: int = 1,
    rng=None,
):
    """Class-structured images: each class is a fixed random low-frequency
    template plus pixel noise, normalized like MNIST. Keeps LeNet/AlexNet
    pipelines and benchmarks runnable with zero network egress."""
    rng = rng or np.random.default_rng(7)
    f = side // 4
    templates = rng.standard_normal((nc, channels, f, f)).astype(np.float32)
    templates = templates.repeat(4, axis=2).repeat(4, axis=3)  # upsample

    def gen(n_pc):
        xs, ys = [], []
        for c in range(nc):
            noise = 0.6 * rng.standard_normal(
                (n_pc, channels, side, side)
            ).astype(np.float32)
            xs.append(templates[c][None] + noise)
            ys.append(np.full(n_pc, c, dtype=np.float32))
        X = np.concatenate(xs)
        Y = np.concatenate(ys)
        perm = rng.permutation(len(X))
        return X[perm], Y[perm]

    xtr, ytr = gen(n_per_class)
    xte, yte = gen(n_test_per_class)
    return xtr, ytr, xte, yte

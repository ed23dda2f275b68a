"""On-device k-means (Lloyd iterations as matmuls).

Replaces the reference's sklearn/faiss C++ k-means
(``psvi/inference/utils.py:455-612``: ``KmeansCluster``/``KmeansFaiss``)
with a jitted, MXU-friendly implementation: the pairwise-distance step is
``‖x‖² − 2 x·cᵀ + ‖c‖²`` (one matmul), the centroid update is a one-hot
matmul — both map onto the TPU systolic array. k-means++ seeding matches
sklearn's algorithm in expectation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sq_dists(X, C):
    """(N, K) squared euclidean distances via matmul."""
    xn = jnp.sum(jnp.square(X), axis=1, keepdims=True)
    cn = jnp.sum(jnp.square(C), axis=1)[None, :]
    return jnp.maximum(xn - 2.0 * (X @ C.T) + cn, 0.0)


@partial(jax.jit, static_argnames=("k",))
def _kmeans_pp_init(key, X, k: int):
    """k-means++ seeding."""
    n = X.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    cents0 = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[first])

    def body(carry, i):
        cents, key = carry
        d = pairwise_sq_dists(X, cents)
        # distance to nearest chosen centroid; unchosen slots are zero rows —
        # mask them by only considering the first i centroids
        mask = (jnp.arange(k) < i)[None, :]
        dmin = jnp.min(jnp.where(mask, d, jnp.inf), axis=1)
        key, kc = jax.random.split(key)
        p = dmin / jnp.maximum(jnp.sum(dmin), 1e-30)
        nxt = jax.random.choice(kc, n, p=p)
        cents = cents.at[i].set(X[nxt])
        return (cents, key), None

    (cents, _), _ = jax.lax.scan(body, (cents0, key), jnp.arange(1, k))
    return cents


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(key, X, k: int, iters: int = 25):
    """Lloyd iterations; returns (centroids (k, D), labels (N,))."""
    cents = _kmeans_pp_init(key, X, k)

    def body(_, cents):
        d = pairwise_sq_dists(X, cents)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=X.dtype)  # (N, k)
        counts = jnp.sum(onehot, axis=0)  # (k,)
        sums = onehot.T @ X  # (k, D)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep old centroid for empty clusters
        return jnp.where((counts > 0)[:, None], new, cents)

    cents = jax.lax.fori_loop(0, iters, body, cents)
    labels = jnp.argmin(pairwise_sq_dists(X, cents), axis=1)
    return cents, labels


def nearest_index(X, C):
    """Index of the nearest row of X for each centroid (faiss IndexFlatL2
    search analog, ref utils.py:576-607)."""
    d = pairwise_sq_dists(C, X)  # (K, N)
    return jnp.argmin(d, axis=1)


def _l2_normalize(X):
    return X / jnp.maximum(jnp.linalg.norm(X, axis=1, keepdims=True), 1e-12)


class KmeansCluster:
    """Per-class (balanced) or global k-means clustering with random
    per-cluster point sampling (ref ``KmeansCluster``, utils.py:455-560)."""

    def __init__(self, x, y, num_classes=2, balance=True, seed=0,
                 dist="euclidean", iters=25, backend="jax"):
        if dist not in ("euclidean", "cosine"):
            raise ValueError(f"invalid dist {dist!r}")
        self.x = np.asarray(x, np.float32).reshape(len(x), -1)
        self.y = np.asarray(y)
        self.num_classes = num_classes
        self.balance = balance
        self.seed = seed
        self.dist = dist
        self.iters = iters
        self.backend = backend  # 'jax' (on-device) or 'native' (C++ host)
        self.cluster_members: list = []  # list of lists of global indices
        self.cluster_centers: list = []

    def _fit(self, key, X, k):
        """Dispatch one k-means fit to the configured backend."""
        if self.backend == "native":
            from psvi_tpu import native

            C, labels, _ = native.kmeans_fit(
                np.asarray(X), k, iters=self.iters, seed=self.seed
            )
            return jnp.asarray(C), jnp.asarray(labels)
        return kmeans_fit(key, jnp.asarray(X), k, self.iters)

    def set_num_clusters(self, num_clusters):
        self.num_clusters = num_clusters
        self.pts_per_class = max(int(np.floor(num_clusters / self.num_classes)), 2)

    def run_kmeans(self):
        self.cluster_members, self.cluster_centers = [], []
        X = self.x
        if self.dist == "cosine":
            X = np.asarray(_l2_normalize(jnp.asarray(X)))
        key = jax.random.PRNGKey(self.seed)
        if self.balance:
            for c in range(self.num_classes):
                idx = np.where(self.y.astype(int) == c)[0]
                k = min(self.pts_per_class, len(idx))
                if k == 0:
                    continue
                key, kc = jax.random.split(key)
                cents, labels = self._fit(kc, X[idx], k)
                labels = np.asarray(labels)
                for j in range(k):
                    members = idx[labels == j]
                    if len(members):
                        self.cluster_members.append(members)
                self.cluster_centers.append(np.asarray(cents))
        else:
            k = self.num_clusters
            cents, labels = self._fit(key, X, k)
            labels = np.asarray(labels)
            for j in range(k):
                members = np.where(labels == j)[0]
                if len(members):
                    self.cluster_members.append(members)
            self.cluster_centers.append(np.asarray(cents))

    def get_arbitrary_pts(self, total_pts=None):
        ncl = len(self.cluster_members)
        if ncl == 0:
            return []
        total = total_pts if total_pts is not None else ncl
        per = [total // ncl] * ncl
        per[-1] = total - sum(per[:-1])
        rng = np.random.default_rng(self.seed)
        out = []
        shortfall = 0
        for members, n in zip(self.cluster_members, per):
            n_take = min(max(n, 0), len(members))
            shortfall += max(n, 0) - n_take
            if n_take:
                out += list(rng.choice(members, n_take, replace=False))
        if shortfall:
            # a cluster smaller than its quota: redistribute the deficit
            # over the remaining unchosen points so the requested count is
            # honored (the reference CRASHES here — np.random.choice with
            # replace=False on an undersized cluster, utils.py:598-607)
            chosen = set(out)
            pool = np.asarray([
                m for members in self.cluster_members for m in members
                if m not in chosen
            ])
            extra = min(shortfall, len(pool))
            if extra:
                out += list(rng.choice(pool, extra, replace=False))
        return out


class KmeansOnDevice(KmeansCluster):
    """Faiss-analog: returns the nearest REAL datapoint to each centroid
    (ref ``KmeansFaiss``, utils.py:556-612)."""

    def run_kmeans(self):
        self.cluster_members, self.cluster_centers = [], []
        X = self.x
        if self.dist == "cosine":
            X = np.asarray(_l2_normalize(jnp.asarray(X)))
        key = jax.random.PRNGKey(self.seed)
        centers = []
        if self.balance:
            for c in range(self.num_classes):
                idx = np.where(self.y.astype(int) == c)[0]
                k = min(self.pts_per_class, len(idx))
                if k == 0:
                    continue
                key, kc = jax.random.split(key)
                Xi = jnp.asarray(X[idx])
                cents, _ = self._fit(kc, np.asarray(Xi), k)
                nearest = np.asarray(nearest_index(Xi, cents))
                centers += list(idx[nearest])
        else:
            # unbalanced: one global clustering with num_clusters centroids
            # (the balanced branch uses pts_per_class PER CLASS)
            k = self.num_clusters
            cents, _ = self._fit(key, X, k)
            centers = list(np.asarray(nearest_index(jnp.asarray(X), cents)))
        self.cluster_centers = centers

    def get_arbitrary_pts(self, total_pts=None):
        return list(self.cluster_centers)

"""Coreset selection / scoring subsystem.

TPU-native re-design of the Selection stack in
``psvi/inference/utils.py:221-1750``:

- ``MeanFieldVI``        (ref :221-450)  — MFVI pretraining engine with
  forgetting-event tracking and parameter save/load (npz checkpoints
  replacing torch ``state_dict`` files).
- ``Selection`` hierarchy (ref :629-1416) — random / k-means (raw or
  penultimate-embedding space) / score-based (least-confidence, entropy,
  EL2N, forgetting) / k-means+score multinomial sampling / gradient-space
  k-means / submodular facility-location.
- ``ScoreCalculator``    (ref :1088-1113) — batch uncertainty scores.
- ``CoresetSelect``      (ref :1419-1606) — method-name dispatcher.

All numeric passes (forwards, scores, embeddings, distance matrices,
k-means) are jitted JAX; greedy/multinomial picks stay host NumPy.
Datasets are (x, y) NumPy arrays rather than torch Datasets.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.models.networks import set_up_model
from psvi_tpu.ops import elbo as E
from psvi_tpu.ops import optim as O
from psvi_tpu.ops.kmeans import KmeansCluster
from psvi_tpu.inference import submodular as SM


# ----------------------------------------------------------------------
# pretraining engine
# ----------------------------------------------------------------------


class MeanFieldVI:
    """MFVI pretrainer with forgetting-event tracking (ref :221-450).

    One "iteration" = a full ordered sweep over the training set
    (``shuffle=False`` matters for forgetting indices, ref :313-316),
    followed by a per-example train-accuracy pass updating
    forgetting/never-learnt counters (ref ``after_epoch`` :359-387).
    """

    def __init__(self, x, y, xt, yt, architecture, D, n_hidden, nc,
                 mc_samples=4, init_sd=1e-3, data_minibatch=128,
                 num_epochs=5, lr0net=1e-3, mul_fact=2, seed=0,
                 forgetting_score_flag=False, data_path=None,
                 load_from_saved=False, dnm="data", n_channels=1,
                 log_every=10):
        self.x = jnp.asarray(np.asarray(x, np.float32))
        self.y = jnp.asarray(np.asarray(y, np.float32))
        self.xt = jnp.asarray(np.asarray(xt, np.float32))
        self.yt = jnp.asarray(np.asarray(yt, np.float32))
        self.nc = nc
        self.mc_samples = mc_samples
        self.B = min(data_minibatch, len(x))
        self.total_iterations = mul_fact * num_epochs
        self.num_epochs = num_epochs
        self.seed = seed
        self.forgetting_score_flag = forgetting_score_flag
        self.data_path = data_path
        self.load_from_saved = load_from_saved
        self.dnm = dnm
        self.architecture = architecture

        self.net = set_up_model(architecture, D, n_hidden, nc, init_sd,
                                n_channels=n_channels)
        self.key = jax.random.PRNGKey(seed)
        self.key, k = jax.random.split(self.key)
        self.params = self.net.init(k)
        self.opt = O.adam(lr0net)
        self.opt_state = self.opt.init(self.params)
        self.n_train = len(x)
        self.forgetting_events = np.zeros(self.n_train, np.float32)
        self.last_acc = np.zeros(self.n_train, np.float32)
        self.never_learnt = np.ones(self.n_train, np.float32)

        n_batches = -(-self.n_train // self.B)
        pad = n_batches * self.B - self.n_train
        self._pad = pad
        self._n_batches = n_batches

        @jax.jit
        def train_sweep(params, opt_state, key):
            xp = jnp.concatenate([self.x, self.x[:1].repeat(pad, 0)]) if pad else self.x
            yp = jnp.concatenate([self.y, self.y[:1].repeat(pad, 0)]) if pad else self.y
            mask = jnp.concatenate(
                [jnp.ones(self.n_train), jnp.zeros(pad)]
            ).reshape(n_batches, self.B)
            xbs = xp.reshape((n_batches, self.B) + xp.shape[1:])
            ybs = yp.reshape(n_batches, self.B)
            keys = jax.random.split(key, n_batches)

            def body(carry, inp):
                params, opt_state = carry
                xb, yb, m, k = inp
                eps = self.net.sample_eps(k, mc_samples)

                def loss_fn(p):
                    out = self.net.apply(p, eps, xb)
                    nll = E.categorical_nll(out, yb) * m[None, :]
                    # ref scales by n_train/len(batch) per ACTUAL batch
                    # size (inference/utils.py:300-320) — the padded final
                    # batch must use its real row count, not B
                    scaling = self.n_train / jnp.sum(m)
                    return scaling * jnp.sum(nll) + self.net.kl(p)

                loss, g = jax.value_and_grad(loss_fn)(params)
                params, opt_state = self.opt.step(params, g, opt_state)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (xbs, ybs, mask, keys)
            )
            return params, opt_state, losses

        @jax.jit
        def train_accuracy(params, key):
            eps = self.net.sample_eps(key, mc_samples)
            logits = self.net.apply(params, eps, self.x).mean(axis=0)
            pred = jnp.argmax(logits, -1).astype(jnp.float32)
            return (pred == self.y).astype(jnp.float32)

        self._train_sweep = train_sweep
        self._train_accuracy = train_accuracy

    def run(self):
        if self.load_from_saved and self.load():
            return
        for i in range(self.total_iterations):
            self.key, ks, ka = jax.random.split(self.key, 3)
            self.params, self.opt_state, _ = self._train_sweep(
                self.params, self.opt_state, ks
            )
            if self.forgetting_score_flag:
                curr_acc = np.asarray(self._train_accuracy(self.params, ka))
                forgotten = self.last_acc > curr_acc
                self.forgetting_events[forgotten] += 1
                self.last_acc = curr_acc
                self.never_learnt = np.minimum(self.never_learnt, 1.0 - curr_acc)
        if self.forgetting_score_flag:
            # never-learnt examples get the max score (ref :405-409)
            self.forgetting_events = np.maximum(
                self.total_iterations * self.never_learnt, self.forgetting_events
            )
        if self.data_path:
            self.save()

    # --- persistence (ref save/load :416-450) ---

    def _fname(self, kind):
        return os.path.join(
            self.data_path,
            f"{kind}_{self.dnm}_{self.architecture}_{self.num_epochs}_{self.seed}.npz",
        )

    def save(self):
        os.makedirs(self.data_path, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        np.savez(
            self._fname("net_state"),
            *[np.asarray(l) for l in leaves],
        )
        np.savez(self._fname("forgetting"), forgetting=self.forgetting_events)

    def load(self) -> bool:
        try:
            d = np.load(self._fname("net_state"))
            leaves, treedef = jax.tree_util.tree_flatten(self.params)
            new_leaves = [jnp.asarray(d[f"arr_{i}"]) for i in range(len(leaves))]
            self.params = jax.tree_util.tree_unflatten(treedef, new_leaves)
            f = np.load(self._fname("forgetting"))
            self.forgetting_events = f["forgetting"]
            return True
        except Exception:
            return False


# ----------------------------------------------------------------------
# scores
# ----------------------------------------------------------------------


class ScoreCalculator:
    """Batch uncertainty scores (ref :1088-1113)."""

    def __init__(self, outputs_prob, target, nc=10):
        self.p = jnp.asarray(outputs_prob)
        self.target = jnp.asarray(target)
        self.nc = nc

    def least_confidence_score(self):
        return 1.0 - jnp.max(self.p, axis=1)

    def entropy_score(self):
        p_eps = self.p + 1e-20
        return -jnp.sum(self.p * jnp.log(p_eps), axis=1)

    def el2n_score(self):
        onehot = jax.nn.one_hot(self.target.astype(jnp.int32), self.nc)
        return jnp.linalg.norm(self.p - onehot, axis=1)


def load_embeddings_csv(data_folder, dnm, seed):
    """Penultimate-layer embeddings saved by a PSVI scoring run
    (``PSVI._save_embeddings`` writes ``embedding_{dnm}_{seed}.csv``; ref
    ``_run_kmeans_loaded``, ``inference/utils.py:856-876``)."""
    import pandas as pd

    fname = os.path.join(data_folder or ".", f"embedding_{dnm}_{seed}.csv")
    return pd.read_csv(fname, sep=",", header=None).values.astype(np.float32)


def load_scores_csv(data_folder, dnm, seed, score_type):
    """Difficulty scores saved by a PSVI scoring run (``PSVI._do_scoring``
    writes ``score_psvi_{dnm}_{seed}.csv``; ref
    ``_get_uncertainty_score_loaded``, ``inference/utils.py:1025-1034``)."""
    import pandas as pd

    fname = os.path.join(data_folder or ".", f"score_psvi_{dnm}_{seed}.csv")
    return pd.read_csv(fname)[score_type].values.astype(np.float32)


def sample_multinomial(pval, k, rng=None):
    """Over-dispersed multinomial top-k pick (ref :733-744)."""
    rng = rng or np.random.default_rng()
    pval = np.asarray(pval, np.float64)
    N = pval.shape[0]
    k = min(k, N)
    try:
        pval = pval / pval.sum()
        samples = rng.multinomial(2 * N, pval)
        return np.argsort(samples)[-k:]
    except Exception:
        return rng.choice(N, size=k, replace=False)


# ----------------------------------------------------------------------
# selection hierarchy
# ----------------------------------------------------------------------


class Selection:
    """Base (ref :629-729): select indices, expose weighted subset."""

    def __init__(self, x, y, num_pseudo, nc, seed, forgetting_flag=False):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.num_pseudo = num_pseudo
        self.nc = nc
        self.seed = seed
        self.forgetting_flag = forgetting_flag
        self.core_idc: List[int] = []
        self.wt_vec = None
        self.rng = np.random.default_rng(seed)
        self.pretrained_vi: Optional[MeanFieldVI] = None

    def select(self) -> List[int]:
        raise NotImplementedError

    def get_subset(self):
        self.core_idc = self.select()
        return self.x[self.core_idc], self.y[self.core_idc]

    def get_weighted_subset(self):
        if not self.core_idc:
            self.core_idc = list(self.rng.permutation(self.select()))
        if self.wt_vec is None:
            scale = len(self.x) / len(self.core_idc)
            self.wt_vec = scale * np.ones(len(self.core_idc), np.float32)
        idx = [int(i) for i in self.core_idc]
        return idx, self.x[idx], self.y[idx], self.wt_vec

    def pretrain(self, xt, yt, architecture, D, n_hidden, mc_samples,
                 init_sd, data_minibatch, pretrain_epochs, lr0net,
                 data_folder, load_from_saved, dnm, n_channels=1):
        self.pretrained_vi = MeanFieldVI(
            self.x, self.y, xt, yt, architecture, D, n_hidden, self.nc,
            mc_samples=mc_samples, init_sd=init_sd,
            data_minibatch=data_minibatch, num_epochs=pretrain_epochs,
            lr0net=lr0net, seed=self.seed,
            forgetting_score_flag=self.forgetting_flag,
            data_path=data_folder, load_from_saved=load_from_saved,
            dnm=dnm, n_channels=n_channels,
        )
        self.pretrained_vi.run()

    # --- shared helpers ---

    def _balanced_pick(self, picker):
        """num_pseudo split over classes, remainder to the last
        (ref :757-771)."""
        n_train = len(self.x)
        ppc = self.num_pseudo // self.nc
        last = self.num_pseudo - (self.nc - 1) * ppc
        out = []
        for c in range(self.nc):
            idx_c = np.arange(n_train)[self.y.astype(int) == c]
            n_pts = last if c == self.nc - 1 else ppc
            out += picker(idx_c, n_pts)
        return out

    def _mean_probs(self, x=None):
        """MC-mean softmax probabilities from the pretrained net."""
        vi = self.pretrained_vi
        x = self.x if x is None else x
        eps = vi.net.sample_eps(jax.random.PRNGKey(self.seed + 7), vi.mc_samples)
        logits = vi.net.apply(vi.params, eps, jnp.asarray(x, jnp.float32))
        return jax.nn.softmax(logits.mean(axis=0), axis=-1)

    def _penultimate_embeddings(self):
        """Input activations of the final dense layer, summed over the S
        axis (ref ``_get_embeddings``: ``last_layer.sum(0)``,
        psvi_classes.py:1308-1339)."""
        vi = self.pretrained_vi
        net, params = vi.net, vi.params
        eps = net.sample_eps(jax.random.PRNGKey(self.seed + 11), vi.mc_samples)
        x = jnp.asarray(self.x, jnp.float32)
        h = jnp.broadcast_to(x[None], (vi.mc_samples,) + x.shape)
        for layer, p, e in zip(net.layers[:-1], params[:-1], eps[:-1]):
            h = layer.apply(p, e, h)
        return np.asarray(h.sum(axis=0))


class RandomSelection(Selection):
    """Class-balanced random subset (ref :749-786)."""

    def select(self):
        return self._balanced_pick(
            lambda idx_c, n: list(
                self.rng.choice(idx_c, min(n, len(idx_c)), replace=False)
            )
        )

    def pretrain(self, *a, **k):
        pass


def _num_clusters_heuristic(num_pseudo, multiple_pts):
    """Cluster-count table (ref :889-899 / :1213-1223): 30→30, 50→50,
    80→20, 100→20; otherwise one cluster per pseudo point."""
    if not multiple_pts:
        return num_pseudo
    return {30: 30, 50: 50, 80: 20, 100: 20}.get(num_pseudo, num_pseudo)


class KmeansSelection(Selection):
    """k-means in raw or embedding space, random points per cluster
    (ref :789-938)."""

    def __init__(self, x, y, num_pseudo, nc, seed, forgetting_flag=False,
                 embedding_flag=False, dist="euclidean", multiple_pts=True,
                 loaded=False, data_folder=None, dnm=None, **kw):
        super().__init__(x, y, num_pseudo, nc, seed, forgetting_flag)
        self.embedding_flag = embedding_flag
        self.dist = dist
        self.multiple_pts = multiple_pts
        self.loaded = loaded
        self.data_folder = data_folder
        self.dnm = dnm

    def _features(self):
        if self.loaded:
            # embeddings persisted by a PSVI scoring run (ref
            # _run_kmeans_loaded, inference/utils.py:856-876)
            return load_embeddings_csv(self.data_folder, self.dnm, self.seed)
        if self.embedding_flag:
            return self._penultimate_embeddings()
        return self.x.reshape(len(self.x), -1)

    def select(self):
        cluster = KmeansCluster(
            self._features(), self.y, num_classes=self.nc, seed=self.seed,
            dist=self.dist,
        )
        cluster.set_num_clusters(
            _num_clusters_heuristic(self.num_pseudo, self.multiple_pts)
        )
        cluster.run_kmeans()
        return cluster.get_arbitrary_pts(self.num_pseudo)

    def pretrain(self, *a, **k):
        # no pretraining needed on the loaded path (ref :915-918)
        if self.embedding_flag and not self.loaded:
            super().pretrain(*a, **k)


class ScoreSelection(Selection):
    """Top-scored points per class (ref :941-1084)."""

    ALLOWED = ("least_confidence", "entropy", "el2n", "forgetting")

    def __init__(self, x, y, num_pseudo, nc, seed, forgetting_flag=False,
                 score_type="least_confidence", loaded=False,
                 data_folder=None, dnm=None, **kw):
        if score_type == "forgetting":
            forgetting_flag = True
        if score_type not in self.ALLOWED:
            raise ValueError(f"{score_type} not in {self.ALLOWED}")
        super().__init__(x, y, num_pseudo, nc, seed, forgetting_flag)
        self.score_type = score_type
        self.loaded = loaded
        self.data_folder = data_folder
        self.dnm = dnm

    def pretrain(self, *a, **k):
        # scores come from the saved CSV on the loaded path (ref :963-964)
        if not self.loaded:
            super().pretrain(*a, **k)

    def _get_uncertainty_score(self) -> np.ndarray:
        if self.loaded:
            return load_scores_csv(
                self.data_folder, self.dnm, self.seed, self.score_type
            )
        if self.score_type == "forgetting":
            return np.asarray(self.pretrained_vi.forgetting_events)
        probs = self._mean_probs()
        calc = ScoreCalculator(probs, self.y, nc=self.nc)
        fn = {
            "least_confidence": calc.least_confidence_score,
            "entropy": calc.entropy_score,
            "el2n": calc.el2n_score,
        }[self.score_type]
        return np.asarray(fn())

    def select(self):
        score_arr = self._get_uncertainty_score()

        def picker(idx_c, n):
            sub = score_arr[idx_c]
            top = np.argsort(-sub)[: min(n, len(idx_c))]
            return list(idx_c[top])

        return self._balanced_pick(picker)


class KmeansScoreSelection(ScoreSelection):
    """Cluster + score-weighted multinomial sampling (ref :1116-1265)."""

    def __init__(self, x, y, num_pseudo, nc, seed, forgetting_flag=False,
                 score_type="least_confidence", embedding_flag=False,
                 dist="euclidean", multiple_pts=True, alpha=0.0,
                 choose_difficult=True, loaded=False, data_folder=None,
                 dnm=None, **kw):
        super().__init__(x, y, num_pseudo, nc, seed, forgetting_flag,
                         score_type, loaded=loaded, data_folder=data_folder,
                         dnm=dnm)
        self.embedding_flag = embedding_flag
        self.dist = dist
        self.multiple_pts = multiple_pts
        self.alpha = alpha
        self.choose_difficult = choose_difficult

    def _cluster_features(self):
        if self.loaded:
            # loaded path clusters saved embeddings (ref :1139-1140)
            return load_embeddings_csv(self.data_folder, self.dnm, self.seed)
        if self.embedding_flag:
            return self._penultimate_embeddings()
        return self.x.reshape(len(self.x), -1)

    def select(self):
        score_arr = self._get_uncertainty_score()
        feats = self._cluster_features()
        cluster = KmeansCluster(feats, self.y, num_classes=self.nc,
                                seed=self.seed, dist=self.dist)
        num_clusters = _num_clusters_heuristic(self.num_pseudo, self.multiple_pts)
        cluster.set_num_clusters(num_clusters)
        cluster.run_kmeans()
        pts_per_cluster = max(int(self.num_pseudo / num_clusters), 1)
        core = []
        for members in cluster.cluster_members:
            sub = score_arr[members]
            if self.choose_difficult:
                weights = sub + self.alpha
            else:
                weights = 1.0 / (sub + self.alpha + 1e-20)
            s = weights.sum()
            pvals = weights / s if s > 0 else np.full(len(sub), 1 / len(sub))
            chosen = sample_multinomial(pvals, pts_per_cluster, self.rng)
            core += [int(members[i]) for i in chosen]
        return core


class RandomScoreSelection(ScoreSelection):
    """Half random, half top-scored (ref :1268-1330)."""

    def select(self):
        n_train = len(self.x)
        ppc = max(self.num_pseudo // (2 * self.nc), 1)
        last = max(self.num_pseudo // 2 - (self.nc - 1) * ppc, 1)
        rand_idc = []
        for c in range(self.nc):
            idx_c = np.arange(n_train)[self.y.astype(int) == c]
            n = last if c == self.nc - 1 else ppc
            rand_idc += list(self.rng.choice(idx_c, min(n, len(idx_c)), replace=False))
        n_scored = self.num_pseudo - len(rand_idc)
        score_arr = self._get_uncertainty_score()
        ppc2 = n_scored // self.nc
        last2 = n_scored - (self.nc - 1) * ppc2
        scored = []
        for c in range(self.nc):
            idx_c = np.arange(n_train)[self.y.astype(int) == c]
            n = last2 if c == self.nc - 1 else ppc2
            sub = score_arr[idx_c]
            top = np.argsort(-sub)[: max(min(n, len(idx_c)), 0)]
            scored += list(idx_c[top])
        return rand_idc + scored


class RandomIncrementalSelection(ScoreSelection):
    """Adds the single highest-scored unseen point (ref :1332-1379)."""

    def __init__(self, x, y, num_pseudo, nc, seed, score_type="entropy", **kw):
        super().__init__(x, y, num_pseudo, nc, seed, score_type=score_type)
        self.current_core_idc: List[int] = []

    def update_current_state(self, current_core_idc, pretrained_vi):
        self.current_core_idc = list(current_core_idc)
        self.pretrained_vi = pretrained_vi

    def select(self):
        score_arr = self._get_uncertainty_score()
        order = np.argsort(-score_arr)
        for new_index in order:
            if int(new_index) not in self.current_core_idc:
                return self.current_core_idc + [int(new_index)]
        return list(self.current_core_idc)

    def get_weighted_subset(self):
        self.core_idc = self.select()
        scale = len(self.x) / len(self.core_idc)
        self.wt_vec = scale * np.ones(len(self.core_idc), np.float32)
        idx = [int(i) for i in self.core_idc]
        return idx, self.x[idx], self.y[idx], self.wt_vec


class WeightedKmeansSelection(KmeansScoreSelection):
    """k-means points with score-proportional weights (ref :1381-1416)."""

    def select(self):
        feats = self._cluster_features()
        self._cluster = KmeansCluster(feats, self.y, num_classes=self.nc,
                                      seed=self.seed, dist=self.dist)
        self._cluster.set_num_clusters(
            _num_clusters_heuristic(self.num_pseudo, self.multiple_pts)
        )
        self._cluster.run_kmeans()
        return self._cluster.get_arbitrary_pts(self.num_pseudo)

    def get_weighted_subset(self):
        if not self.core_idc:
            self.core_idc = self.select()
        score_arr = self._get_uncertainty_score()
        scale = len(self.x) / len(self.core_idc)
        w0 = score_arr[self.core_idc]
        self.wt_vec = (scale / max(w0.sum(), 1e-20)) * w0
        idx = [int(i) for i in self.core_idc]
        return idx, self.x[idx], self.y[idx], self.wt_vec.astype(np.float32)


class KmeansGradientSelection(KmeansSelection):
    """k-means in last-layer-gradient space (ref :1609-1701)."""

    def __init__(self, x, y, num_pseudo, nc, seed, forgetting_flag=False,
                 embedding_flag=True, dist="euclidean",
                 last_layer_only=False, **kw):
        super().__init__(x, y, num_pseudo, nc, seed, forgetting_flag,
                         embedding_flag=True, dist=dist)
        self.last_layer_only = last_layer_only

    def _gradient_embeddings(self):
        """∂L/∂(mean logits) per example, optionally ⊗ penultimate
        activations (ref :1645-1697)."""
        probs = np.asarray(self._mean_probs())  # (N, nc)
        onehot = np.asarray(
            jax.nn.one_hot(jnp.asarray(self.y, jnp.int32), self.nc)
        )
        # d(NLL)/d(logits) of softmax-CE on the mean logits = p − onehot
        bias_grads = probs - onehot  # (N, nc)
        if self.last_layer_only:
            return bias_grads
        emb = self._penultimate_embeddings()  # (N, E)
        outer = emb[:, None, :] * bias_grads[:, :, None]  # (N, nc, E)
        return np.concatenate(
            [bias_grads, outer.reshape(len(emb), -1)], axis=1
        )

    def select(self):
        grads = self._gradient_embeddings()
        cluster = KmeansCluster(grads, self.y, num_classes=self.nc,
                                seed=self.seed, dist=self.dist)
        cluster.set_num_clusters(self.num_pseudo)
        cluster.run_kmeans()
        return cluster.get_arbitrary_pts(self.num_pseudo)

    def pretrain(self, *a, **k):
        Selection.pretrain(self, *a, **k)


class SubmodularSelection(KmeansGradientSelection):
    """Facility-location lazy greedy in gradient space, per class
    (ref :1703-1750)."""

    def select(self):
        grads = self._gradient_embeddings()
        n_train = len(self.x)
        ppc = self.num_pseudo // self.nc
        last = self.num_pseudo - (self.nc - 1) * ppc
        core = []
        for c in range(self.nc):
            idx_c = np.arange(n_train)[self.y.astype(int) == c]
            n_pts = last if c == self.nc - 1 else ppc
            sel = grads[idx_c]
            if self.dist == "euclidean":
                matrix = -1.0 * SM.euclidean_dist_pair(sel)
            else:
                matrix = -1.0 * SM.cossim_pair(sel)
            matrix -= np.min(matrix) - 1e-3
            fn = SM.FacilityLocation(index=idx_c, similarity_matrix=matrix)
            opt = SM.LazyGreedy(index=idx_c, budget=min(n_pts, len(idx_c)))
            core += list(opt.select(gain_function=fn.calc_gain,
                                    update_state=fn.update_state))
        return [int(i) for i in core]


class CoresetSelect:
    """Score-method dispatcher (ref :1419-1606)."""

    def __init__(self, x, y, xt, yt, num_pseudo=100, nc=2,
                 architecture="logistic_regression", D=None, n_hidden=100,
                 mc_samples=4, init_sd=1e-3, data_minibatch=128,
                 pretrain_epochs=5, lr0net=1e-3, seed=0,
                 score_method="random", data_folder=None,
                 load_from_saved=False, dnm=None, distance_fn="euclidean",
                 last_layer_only=False, multiple_pts_per_cluster=True,
                 loaded_from_psvi=False, alpha_dirichlet=0.0,
                 choose_difficult=True, n_channels=1, **kw):
        self.x, self.y, self.xt, self.yt = x, y, xt, yt
        self.num_pseudo, self.nc = num_pseudo, nc
        self.architecture = architecture
        self.D, self.n_hidden = D, n_hidden
        self.mc_samples, self.init_sd = mc_samples, init_sd
        self.data_minibatch = data_minibatch
        self.pretrain_epochs, self.lr0net = pretrain_epochs, lr0net
        self.seed = seed
        self.score_method = score_method
        self.data_folder = data_folder
        self.load_from_saved = load_from_saved
        self.dnm = dnm
        self.distance_fn = distance_fn
        self.last_layer_only = last_layer_only
        self.loaded_from_psvi = loaded_from_psvi
        self.multiple_pts = multiple_pts_per_cluster
        self.alpha_dirichlet = alpha_dirichlet
        self.choose_difficult = choose_difficult
        self.n_channels = n_channels
        self.wt_index = {}

    def select_data(self):
        embedding_flag = self.architecture == "lenet"
        common = dict(x=self.x, y=self.y, num_pseudo=self.num_pseudo,
                      nc=self.nc, seed=self.seed)
        sm = self.score_method
        loaded_kw = dict(loaded=self.loaded_from_psvi,
                         data_folder=self.data_folder, dnm=self.dnm)
        if sm == "kmeans":
            method = KmeansSelection(
                **common, embedding_flag=embedding_flag,
                dist=self.distance_fn, multiple_pts=self.multiple_pts,
                **loaded_kw,
            )
        elif sm == "kmeans_gradient":
            method = KmeansGradientSelection(
                **common, dist=self.distance_fn,
                last_layer_only=self.last_layer_only,
            )
        elif sm == "submodular":
            method = SubmodularSelection(
                **common, dist=self.distance_fn,
                last_layer_only=self.last_layer_only,
            )
        elif sm == "random":
            method = RandomSelection(**common)
        elif sm in ScoreSelection.ALLOWED:
            method = ScoreSelection(**common, score_type=sm, **loaded_kw)
        elif sm.startswith("scored_kmeans_"):
            method = KmeansScoreSelection(
                **common,
                score_type=re.sub(r"^scored_kmeans_", "", sm),
                embedding_flag=embedding_flag, dist=self.distance_fn,
                multiple_pts=self.multiple_pts, alpha=self.alpha_dirichlet,
                choose_difficult=self.choose_difficult, **loaded_kw,
            )
        elif sm.startswith("scored_random_"):
            method = RandomScoreSelection(
                **common, score_type=re.sub(r"^scored_random_", "", sm),
            )
        elif sm == "weighted_kmeans":
            method = WeightedKmeansSelection(
                **common, score_type="entropy",
                embedding_flag=embedding_flag, dist=self.distance_fn,
            )
        else:
            raise ValueError(f"{sm} is not implemented")

        self.method = method
        method.pretrain(
            self.xt, self.yt, self.architecture, self.D, self.n_hidden,
            self.mc_samples, self.init_sd, self.data_minibatch,
            self.pretrain_epochs, self.lr0net, self.data_folder,
            self.load_from_saved, self.dnm, n_channels=self.n_channels,
        )
        idx, xs, ys, wts = method.get_weighted_subset()
        self.chosen = (idx, xs, ys, wts)
        self.wt_index = {str(k): float(v) for k, v in zip(idx, wts)}
        return idx, xs, ys, wts

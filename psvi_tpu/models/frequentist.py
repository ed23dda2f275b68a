"""Frequentist (non-Bayesian) models for coreset scoring.

JAX re-design of ``psvi/models/frequentist_models.py``: a plain logistic
regression / one-hidden-layer net trained by jitted Adam steps, used to
compute EL2N scores (Paul et al. 2021) for selection baselines
(``get_el2n_scores``, ref :148-181) and pretrain-based selection.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from psvi_tpu.ops import optim as O


def _init_linear(key, din, dout):
    bound = 1.0 / np.sqrt(din)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (dout, din), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (dout,), minval=-bound, maxval=bound),
    }


class RunFrequentistModel:
    """Train/test/score driver (ref ``RunFrequentistModel``, :34-181).

    ``is_logreg=True``: binary logistic regression with BCE loss;
    otherwise a single linear layer D→num_classes with cross-entropy
    (ref ``FreqOneLayer``, frequentist_models.py:8-16 — one nn.Linear,
    no hidden layer).
    """

    def __init__(self, x, y, xt, yt, num_classes=2, n_hidden=100,
                 is_logreg=True, data_minibatch=128, num_epochs=20,
                 lr=1e-3, seed=0):
        self.x = jnp.asarray(np.asarray(x, np.float32).reshape(len(x), -1))
        self.y = jnp.asarray(np.asarray(y, np.float32))
        self.xt = jnp.asarray(np.asarray(xt, np.float32).reshape(len(xt), -1))
        self.yt = jnp.asarray(np.asarray(yt, np.float32))
        self.nc = num_classes
        self.is_logreg = is_logreg
        self.B = min(data_minibatch, len(x))
        self.num_epochs = num_epochs
        self.key = jax.random.PRNGKey(seed)
        D = self.x.shape[1]
        self.key, k1, k2 = jax.random.split(self.key, 3)
        if is_logreg:
            self.params = {"out": _init_linear(k1, D, 1)}
        else:
            # FreqOneLayer = one linear layer (ref :14-16)
            self.params = {"out": _init_linear(k1, D, num_classes)}
        self.opt = O.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self._step = jax.jit(self._train_step)

    def _forward(self, params, x):
        return x @ params["out"]["w"].T + params["out"]["b"]

    def _loss(self, params, xb, yb):
        out = self._forward(params, xb)
        if self.is_logreg:
            logits = out[:, 0]
            return -jnp.mean(
                yb * jax.nn.log_sigmoid(logits)
                + (1 - yb) * jax.nn.log_sigmoid(-logits)
            )
        logp = jax.nn.log_softmax(out, axis=-1)
        picked = jnp.take_along_axis(logp, yb.astype(jnp.int32)[:, None], axis=1)
        return -jnp.mean(picked)

    def _train_step(self, params, opt_state, key):
        idx = jax.random.choice(key, self.x.shape[0], (self.B,), replace=False)
        loss, g = jax.value_and_grad(self._loss)(params, self.x[idx], self.y[idx])
        params, opt_state = self.opt.step(params, g, opt_state)
        return params, opt_state, loss

    def train(self):
        steps_per_epoch = max(1, self.x.shape[0] // self.B)
        for _ in range(self.num_epochs * steps_per_epoch):
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, _ = self._step(
                self.params, self.opt_state, k
            )

    def test(self):
        out = self._forward(self.params, self.xt)
        if self.is_logreg:
            p = jax.nn.sigmoid(out[:, 0])
            acc = jnp.mean((p > 0.5).astype(jnp.float32) == self.yt)
            pc = jnp.clip(jnp.where(self.yt > 0.5, p, 1 - p), 1e-38)
            nll = -jnp.mean(jnp.log(pc))
        else:
            pred = jnp.argmax(out, axis=-1).astype(jnp.float32)
            acc = jnp.mean(pred == self.yt)
            logp = jax.nn.log_softmax(out, axis=-1)
            nll = -jnp.mean(
                jnp.take_along_axis(logp, self.yt.astype(jnp.int32)[:, None], 1)
            )
        return float(acc), float(nll)

    def get_el2n_scores(self) -> np.ndarray:
        """‖p(x) − onehot(y)‖₂ per training point (ref :148-181)."""
        out = self._forward(self.params, self.x)
        if self.is_logreg:
            p1 = jax.nn.sigmoid(out)  # (N, 1)
            probs = jnp.concatenate([1 - p1, p1], axis=1)
        else:
            probs = jax.nn.softmax(out, axis=-1)
        onehot = jax.nn.one_hot(self.y.astype(jnp.int32), self.nc)
        return np.asarray(jnp.linalg.norm(probs - onehot, axis=1))

    def get_largest_el2n_indices(self, coreset_size: int):
        scores = self.get_el2n_scores()
        if coreset_size <= 0:
            return []
        return list(np.argsort(-scores)[:coreset_size])

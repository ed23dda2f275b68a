"""Predictive-posterior visualization demo.

The reference README shows GIFs of the predictive posterior evolving on
halfmoon/four_blobs with the coreset points overlaid (README.md:64-68,
built from ``pred_on_grid`` snapshots). This produces the same artifact as
PNG panels: posterior probability field + training data + learned
pseudocoreset (size ∝ weight).

Usage: python scripts/demo_predictive_grid.py  (writes docs/img/*.png)
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI


def run(dnm, method, arch, n_hidden, epochs=401):
    data = read_dataset(dnm)
    eng = PSVI(
        data, method=method, num_pseudo=12, mc_samples=10,
        architecture=arch, n_hidden=n_hidden, inner_it=20,
        num_epochs=epochs, data_minibatch=128, log_every=100, init_sd=1e-3,
        lr0u=1e-3, lr0v=1e-2, seed=0,
    )
    eng.run_psvi()
    n = 120
    probs = eng.pred_on_grid(n_test_per_dim=n)  # (nc, n*n)
    x0 = np.linspace(-3, 4, n)
    x1 = np.linspace(-2, 3, n)
    field = probs.reshape(eng.nc, n, n)
    return data, eng, x0, x1, field


def plot(dnm, method, arch, n_hidden):
    data, eng, x0, x1, field = run(dnm, method, arch, n_hidden)
    fig, ax = plt.subplots(figsize=(6, 5))
    if eng.nc == 2:
        z = field[1].T  # P(class 1)
        im = ax.contourf(x0, x1, z, levels=21, cmap="RdBu_r", alpha=0.8)
        fig.colorbar(im, ax=ax, label="P(class 1)")
    else:
        z = field.argmax(0).T
        ax.contourf(x0, x1, z, levels=eng.nc, cmap="tab10", alpha=0.35)
    ax.scatter(data.x[:, 0], data.x[:, 1], c=data.y, cmap="tab10", s=6,
               alpha=0.5, linewidths=0)
    u = np.asarray(eng.state.u)
    _, fv = eng._core_weights(eng.state.v, eng.state.alpha)
    w = np.asarray(fv)
    ax.scatter(u[:, 0], u[:, 1], s=40 + 3000 * w / w.sum(), marker="*",
               c="black", edgecolors="yellow", linewidths=0.8,
               label="pseudocoreset")
    ax.set_title(f"{method} on {dnm} — predictive posterior + coreset")
    ax.legend(loc="lower right")
    os.makedirs("/root/repo/docs/img", exist_ok=True)
    out = f"/root/repo/docs/img/{dnm}_{method}.png"
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    plot("halfmoon", "psvi_learn_v", "fn", 40)
    plot("four_blobs", "psvi_alpha_v", "fn", 40)

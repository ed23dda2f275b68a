"""Predictive-posterior evolution GIF (reference README.md:64-68 analog).

Trains psvi_learn_v on halfmoon with grid logging enabled and renders the
logged `grid_preds` snapshots (plus the moving pseudocoreset) into an
animated GIF at docs/img/halfmoon_evolution.gif.
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
from matplotlib.animation import FuncAnimation, PillowWriter
import numpy as np

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI


def main():
    data = read_dataset("halfmoon")
    eng = PSVI(
        data, method="psvi_learn_v", num_pseudo=12, mc_samples=10,
        architecture="fn", n_hidden=40, inner_it=20, num_epochs=401,
        data_minibatch=128, log_every=40, init_sd=1e-3,
        lr0u=1e-3, lr0v=1e-2, seed=0, log_pseudodata=True,
    )
    res = eng.run_psvi()
    grids = res["grid_preds"]  # list of (nc, n*n) arrays
    us = res["us"]
    n = int(np.sqrt(grids[0].shape[1]))
    x0 = np.linspace(-3, 4, n)
    x1 = np.linspace(-2, 3, n)

    fig, ax = plt.subplots(figsize=(6, 5))

    def draw(i):
        ax.clear()
        z = grids[i][1].reshape(n, n).T
        ax.contourf(x0, x1, z, levels=21, cmap="RdBu_r", alpha=0.8)
        ax.scatter(data.x[:, 0], data.x[:, 1], c=data.y, cmap="coolwarm",
                   s=6, alpha=0.5, linewidths=0)
        ax.scatter(us[i][:, 0], us[i][:, 1], s=90, marker="*", c="black",
                   edgecolors="yellow", linewidths=0.8)
        ax.set_xlim(-3, 4), ax.set_ylim(-2, 3)
        ax.set_title(f"psvi_learn_v on halfmoon — epoch {i * 40}")

    anim = FuncAnimation(fig, draw, frames=len(grids), interval=400)
    os.makedirs("/root/repo/docs/img", exist_ok=True)
    out = "/root/repo/docs/img/halfmoon_evolution.gif"
    anim.save(out, writer=PillowWriter(fps=2))
    print("wrote", out, f"({len(grids)} frames)")


if __name__ == "__main__":
    main()

"""Multi-method coreset comparison (the paper's headline experiment shape).

Runs the full method surface — PSVI family + classic baselines — on
halfmoon over a grid of coreset sizes × trials and writes BENCHMARKS.md
with mean±sd final accuracy per (method, size), plus a PNG curve.

Usage: python scripts/method_comparison.py [--trials 3] [--epochs 101]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from psvi_tpu.data import read_dataset
from psvi_tpu.inference import baselines as B
from psvi_tpu.inference.psvi import run_psvi
from psvi_tpu.inference.sparsebbvi import run_sparsevi_with_bb_elbo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=101)
    ap.add_argument("--sizes", nargs="+", type=int, default=[10, 30, 100])
    args = ap.parse_args()

    data = read_dataset("halfmoon")
    common = dict(mc_samples=10, data_minibatch=128, log_every=50)
    base_kw = dict(
        x=data.x, y=data.y, xt=data.xt, yt=data.yt, N=data.N, D=data.D,
        mc_samples=10, log_every=50,
    )

    def psvi_method(name):
        def run(M, seed):
            r = run_psvi(
                data, method=name, num_pseudo=M, seed=seed,
                architecture="logistic_regression", inner_it=10,
                num_epochs=args.epochs, init_sd=1e-3, lr0net=1e-3,
                lr0u=1e-2, lr0v=1e-1, **common,
            )
            return r["accs"][-1]
        return run

    def sized_baseline(fn, **extra):
        def run(M, seed):
            # growth baselines: run M epochs so the coreset reaches size M;
            # log cadence must land on the final iteration
            kw = dict(base_kw)
            kw["log_every"] = M
            r = fn(num_epochs=M + 1, seed=seed, **kw, **extra)
            return r["accs"][-1]
        return run

    def mfvi_subset(M, seed):
        r = B.run_mfvi_subset(
            train=data, architecture="logistic_regression", nc=2,
            num_pseudo=M, num_epochs=args.epochs, mc_samples=10,
            log_every=50, init_sd=1e-3, seed=seed, data_minibatch=128,
        )
        return r["accs"][-1]

    def opsvi(M, seed):
        r = B.run_opsvi(num_pseudo=M, num_epochs=args.epochs, inner_it=20,
                        seed=seed, data_minibatch=128, **base_kw)
        return r["accs"][-1]

    def giga(M, seed):
        # giga picks one point per log step (ref :382-398 inside the
        # log_every block): M selections need M log boundaries
        r = B.run_giga(num_epochs=10 * M + 1, log_every=10, seed=seed,
                       data_minibatch=128, **{k: v for k, v in base_kw.items()
                                              if k != "log_every"})
        return r["accs"][-1]

    def sbb(M, seed):
        r = run_sparsevi_with_bb_elbo(
            x=data.x, y=data.y, xt=data.xt, yt=data.yt, mc_samples=10,
            data_minibatch=128, num_epochs=M + 1, inner_it=10, outer_it=20,
            log_every=M, seed=seed,
        )
        return r["accs"][-1]

    methods = {
        "psvi": psvi_method("psvi"),
        "psvi_learn_v": psvi_method("psvi_learn_v"),
        "psvi_alpha_v": psvi_method("psvi_alpha_v"),
        "mfvi_subset": mfvi_subset,
        "opsvi": opsvi,
        "random": sized_baseline(B.run_random),
        "sparsevi": sized_baseline(B.run_sparsevi, inner_it=20, outer_it=100,
                                   data_minibatch=128),
        "giga": giga,
        "sparsebbvi": sbb,
    }

    results = {}
    for name, fn in methods.items():
        for M in args.sizes:
            accs = []
            for t in range(args.trials):
                t0 = time.time()
                try:
                    accs.append(fn(M, t))
                except Exception as e:
                    print(f"{name} M={M} t={t} FAILED: {e}")
                    accs.append(float("nan"))
                print(f"{name:>14} M={M:>3} t={t}: acc={accs[-1]:.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            results[(name, M)] = accs

    lines = [
        "# BENCHMARKS — method comparison (halfmoon, Bayesian logreg)",
        "",
        f"Final predictive accuracy, mean ± sd over {args.trials} trials "
        f"(seed = trial). PSVI-family: {args.epochs} outer epochs, nested "
        "trainer, inner_it 10, S=10. Growth baselines (random/sparsevi/giga/"
        "sparsebbvi) run until the coreset reaches the target size.",
        "",
        "| method | " + " | ".join(f"M={M}" for M in args.sizes) + " |",
        "|---|" + "---|" * len(args.sizes),
    ]
    for name in methods:
        row = [name]
        for M in args.sizes:
            a = np.asarray(results[(name, M)], float)
            row.append(f"{np.nanmean(a):.3f} ± {np.nanstd(a):.3f}")
        lines.append("| " + " | ".join(row) + " |")
    # preserve hand-maintained sections (## four_blobs onward) across
    # regenerations of the comparison table
    extra = ""
    try:
        with open("/root/repo/BENCHMARKS.md") as f:
            old = f.read()
        for marker in ("## four_blobs", "## Flagship step anatomy",
                       "## Per-trainer", "## Shape scaling"):
            i = old.find(marker)
            if i >= 0:
                extra = "\n" + old[i:]
                break
    except FileNotFoundError:
        pass
    with open("/root/repo/BENCHMARKS.md", "w") as f:
        f.write("\n".join(lines) + "\n" + extra)
    print("\n".join(lines))


if __name__ == "__main__":
    main()

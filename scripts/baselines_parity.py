"""Coreset-baseline parity: psvi_tpu vs the reference implementation.

Head-to-head of the four classic logreg coreset baselines — random, GIGA,
SparseVI, OPSVI — on the same synthetic logistic-regression arrays, same
hyperparameters, multiple seeds. Final predictive accuracy / NLL from the
Laplace coreset posterior, side by side. Appends a section to PARITY.md.

Usage: python scripts/baselines_parity.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

CFG = dict(mc_samples=10, log_every=50, lr0net=1e-2, lr0v=1e-1,
           inner_it=20, outer_it=20, data_minibatch=256, diagonal=True)
METHODS = ("random", "giga", "sparsevi", "opsvi")


def stub_reference_deps():
    import types

    for name in ["torchvision", "torchvision.transforms",
                 "torchvision.datasets", "arff", "requests", "faiss"]:
        if name not in sys.modules:
            try:
                __import__(name)
            except Exception:
                mod = types.ModuleType(name)
                sys.modules[name] = mod
                if "." in name:
                    parent, child = name.rsplit(".", 1)
                    setattr(sys.modules[parent], child, mod)


def run_reference(data, method, seeds, num_epochs):
    import torch

    stub_reference_deps()
    from psvi.inference import baselines as RB

    fn = {"random": RB.run_random, "giga": RB.run_giga,
          "sparsevi": RB.run_sparsevi, "opsvi": RB.run_opsvi}[method]
    tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))

    # The reference's run_opsvi writes `w.grad.data` assuming `.grad` is a
    # tensor (baselines.py:799). On torch >= 2.0, Optimizer.zero_grad
    # defaults to set_to_none=True, so `.grad` is None there —
    # AttributeError as shipped. Scope zero_grad back to the legacy
    # zero-fill behavior so the method can run at all. (psvi_tpu's
    # run_opsvi has no such defect.)
    orig_zg = torch.optim.Optimizer.zero_grad
    orig_rg = torch.Tensor.requires_grad_
    if method == "opsvi":
        def patched_zg(self, set_to_none=True):
            return orig_zg(self, set_to_none=False)

        def patched_rg(self, requires_grad=True):
            out = orig_rg(self, requires_grad)
            if requires_grad and self.is_leaf and self.grad is None:
                self.grad = torch.zeros_like(self)
            return out

        torch.optim.Optimizer.zero_grad = patched_zg
        torch.Tensor.requires_grad_ = patched_rg
    out = []
    try:
        for seed in seeds:
            t0 = time.time()
            kw = dict(CFG)
            if method == "opsvi":
                kw["num_pseudo"] = 30
            res = fn(
                x=tt(data.x), y=tt(data.y), xt=tt(data.xt), yt=tt(data.yt),
                N=data.N, D=data.D, seed=seed, num_epochs=num_epochs, **kw,
            )
            out.append({
                "acc": float(res["accs"][-1]), "nll": float(res["nlls"][-1]),
                "csize": int(res["csizes"][-1]), "time": time.time() - t0,
            })
    finally:
        torch.optim.Optimizer.zero_grad = orig_zg
        torch.Tensor.requires_grad_ = orig_rg
    return out


def run_ours(data, method, seeds, num_epochs):
    from psvi_tpu.inference import baselines as B

    fn = {"random": B.run_random, "giga": B.run_giga,
          "sparsevi": B.run_sparsevi, "opsvi": B.run_opsvi}[method]
    out = []
    for seed in seeds:
        t0 = time.time()
        kw = dict(CFG)
        if method == "opsvi":
            kw["num_pseudo"] = 30
        res = fn(
            x=data.x, y=data.y, xt=data.xt, yt=data.yt,
            N=data.N, D=data.D, seed=seed, num_epochs=num_epochs, **kw,
        )
        out.append({
            "acc": float(res["accs"][-1]), "nll": float(res["nlls"][-1]),
            "csize": int(res["csizes"][-1]), "time": time.time() - t0,
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from psvi_tpu.data import read_dataset

    seeds = [0, 1] if args.quick else [0, 1, 2]
    num_epochs = 31 if args.quick else 101
    data = read_dataset("synth_lr_10")

    lines = [
        "",
        "## Coreset-baseline parity (synth_lr_10 logreg, "
        f"{num_epochs} epochs, seeds {seeds})",
        "",
        "Same arrays, same hyperparameters; final accuracy/NLL from the "
        "Laplace coreset posterior (the baselines' evaluation protocol).",
        "",
        "| method | impl | final acc (per seed) | final NLL (per seed) | coreset | s/run |",
        "|---|---|---|---|---|---|",
    ]
    for method in METHODS:
        ref = run_reference(data, method, seeds, num_epochs)
        ours = run_ours(data, method, seeds, num_epochs)
        fa = lambda rs, k: ", ".join(f"{r[k]:.3f}" for r in rs)
        ft = lambda rs: f"{np.mean([r['time'] for r in rs]):.1f}"
        for tag, rs in (("reference", ref), ("psvi_tpu", ours)):
            lines.append(
                f"| {method} | {tag} | {fa(rs, 'acc')} | {fa(rs, 'nll')} | "
                f"{rs[-1]['csize']} | {ft(rs)} |"
            )
        print("\n".join(lines[-2:]), flush=True)
    lines.append("")
    with open("/root/repo/PARITY.md", "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()

"""Head-to-head accuracy parity: psvi_tpu vs the reference implementation.

Runs the SAME configuration (same data arrays, same hyperparameters) through
the reference PyTorch engine (imported read-only from /root/reference) and
through psvi_tpu, over several seeds, and reports final predictive
accuracy / NLL side by side. Writes PARITY.md at the repo root.

Usage: python scripts/parity_vs_reference.py [--quick]
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


def run_reference(data, method, seeds, cfg):
    import torch

    stub_reference_deps()
    from psvi.experiments.experiments_utils import SynthDataset
    from psvi.inference.psvi_classes import PSVILearnV, PSVIAV

    cls = {"psvi_learn_v": PSVILearnV, "psvi_alpha_v": PSVIAV}[method]
    out = []
    for seed in seeds:
        torch.manual_seed(seed)
        train = SynthDataset(torch.from_numpy(data.x), torch.from_numpy(data.y))
        test = SynthDataset(torch.from_numpy(data.xt), torch.from_numpy(data.yt))
        t0 = time.time()
        obj = cls(
            train_dataset=train, test_dataset=test, N=data.N, D=data.D,
            nc=data.nc, num_pseudo=cfg["num_pseudo"],
            mc_samples=cfg["mc_samples"], seed=seed, dnm="halfmoon",
            register_elbos=False, compute_weights_entropy=True,
            lr0alpha=cfg["lr0alpha"],
        )
        res = obj.run_psvi(
            init_args="subsample", trainer="nested",
            architecture=cfg["architecture"],
            logistic_regression=cfg["architecture"] == "logistic_regression",
            n_hidden=cfg["n_hidden"], n_layers=1,
            log_every=cfg["log_every"], inner_it=cfg["inner_it"],
            data_minibatch=cfg["data_minibatch"], lr0net=cfg["lr0net"],
            lr0u=cfg["lr0u"], lr0v=cfg["lr0v"], init_sd=cfg["init_sd"],
            num_epochs=cfg["num_epochs"],
        )
        out.append({
            "acc": res["accs"][-1], "nll": res["nlls"][-1],
            "time": time.time() - t0,
        })
    return out


def run_ours(data, method, seeds, cfg):
    from psvi_tpu.inference import run_psvi

    out = []
    for seed in seeds:
        t0 = time.time()
        res = run_psvi(
            data, method=method, num_pseudo=cfg["num_pseudo"],
            mc_samples=cfg["mc_samples"], seed=seed,
            architecture=cfg["architecture"], n_hidden=cfg["n_hidden"],
            inner_it=cfg["inner_it"], num_epochs=cfg["num_epochs"],
            data_minibatch=cfg["data_minibatch"], log_every=cfg["log_every"],
            init_sd=cfg["init_sd"], lr0net=cfg["lr0net"], lr0u=cfg["lr0u"],
            lr0v=cfg["lr0v"], lr0alpha=cfg["lr0alpha"],
        )
        out.append({
            "acc": res["accs"][-1], "nll": res["nlls"][-1],
            "time": time.time() - t0,
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from psvi_tpu.data import read_dataset

    seeds = [0, 1] if args.quick else [0, 1, 2]
    rows = []
    configs = [
        ("halfmoon", "psvi_learn_v", dict(
            num_pseudo=10, mc_samples=10, architecture="logistic_regression",
            n_hidden=None, inner_it=10, num_epochs=51 if args.quick else 101,
            data_minibatch=64, log_every=25, init_sd=1e-3, lr0net=1e-3,
            lr0u=1e-2, lr0v=1e-1, lr0alpha=1e-3,
        )),
        ("four_blobs", "psvi_alpha_v", dict(
            num_pseudo=12, mc_samples=10, architecture="fn", n_hidden=40,
            inner_it=10, num_epochs=51 if args.quick else 101,
            data_minibatch=64, log_every=25, init_sd=1e-3, lr0net=1e-3,
            lr0u=1e-2, lr0v=1e-1, lr0alpha=1e-3,
        )),
    ]
    for dnm, method, cfg in configs:
        data = read_dataset(dnm)
        ref = run_reference(data, method, seeds, cfg)
        ours = run_ours(data, method, seeds, cfg)
        rows.append((dnm, method, cfg, ref, ours))

    lines = [
        "# PARITY — psvi_tpu vs reference implementation",
        "",
        "Same data arrays, same hyperparameters, nested trainer, seeds "
        f"{seeds}. Reference = torch CPU (as shipped); ours = JAX (CPU here; "
        "same code path as TPU). Accuracy differences within the across-seed "
        "spread indicate statistical parity (the two stacks use different "
        "RNGs, so trajectories are not bitwise comparable).",
        "",
        "| dataset | method | impl | final acc (per seed) | final NLL (per seed) | s/run |",
        "|---|---|---|---|---|---|",
    ]
    for dnm, method, cfg, ref, ours in rows:
        fa = lambda rs: ", ".join(f"{r['acc']:.3f}" for r in rs)
        fn = lambda rs: ", ".join(f"{r['nll']:.3f}" for r in rs)
        ft = lambda rs: f"{np.mean([r['time'] for r in rs]):.1f}"
        lines.append(
            f"| {dnm} | {method} | reference | {fa(ref)} | {fn(ref)} | {ft(ref)} |"
        )
        lines.append(
            f"| {dnm} | {method} | psvi_tpu | {fa(ours)} | {fn(ours)} | {ft(ours)} |"
        )
    lines.append("")
    with open("/root/repo/PARITY.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()

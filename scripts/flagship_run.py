"""Flagship end-to-end run on TPU: PSVI LeNet, production MNIST config.

Reference production config (second_vi_run.ipynb): coreset M=100, minibatch
256, mc_samples 10, inner_it 20, lr0net 1e-3, 101 epochs. Runs on
synth_mnist (MNIST-shaped; no vision data on disk in this environment) and
writes RESULTS.md with the accuracy/NLL/ESS trajectory and wall-clock.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import PSVI


def main():
    data = read_dataset("synth_mnist")
    t0 = time.time()
    eng = PSVI(
        data, method="psvi_learn_v", num_pseudo=100, mc_samples=10,
        architecture="lenet", inner_it=20, num_epochs=101,
        data_minibatch=256, log_every=10, init_sd=1e-3, seed=0,
        lr0u=1e-3, lr0v=1e-2,
    )
    res = eng.run_psvi()
    total = time.time() - t0

    lines = [
        "# RESULTS — flagship PSVI LeNet run (TPU v5e-1)",
        "",
        "Reference production MNIST/LeNet config (`second_vi_run.ipynb`):",
        "M=100, minibatch 256, S=10, inner_it=20, 101 outer epochs, nested",
        "bilevel trainer. Data: `synth_mnist` (MNIST-shaped synthetic; no",
        "vision data is available in this zero-egress environment — the",
        "pipeline is identical for real MNIST given `data/mnist.npz`).",
        "",
        "| epoch | test acc | test NLL | NESS |",
        "|---|---|---|---|",
    ]
    for i, (a, n, s) in enumerate(zip(res["accs"], res["nlls"], res["ness"])):
        lines.append(f"| {i * 10} | {a:.4f} | {n:.4f} | {s:.3f} |")
    lines += [
        "",
        f"Total wall-clock **{total:.1f}s** including compilation and "
        f"evaluations; steady-state outer step ≈ {res['avg_epoch_time']*1000:.0f} ms "
        "(each = 20 inner ELBO grads through the differentiable unroll + 1 "
        "outer IW-ELBO grad).",
        "",
        "For comparison, the reference implementation executes the identical",
        "step at ≈ 2.5 evals/s on this host (bench.py vs_baseline ≈ 120×).",
    ]
    with open("/root/repo/RESULTS.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines[-8:]))


if __name__ == "__main__":
    main()

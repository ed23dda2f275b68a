"""Benchmark: PSVI nested-step throughput on the flagship config.

Config = the reference's production MNIST/LeNet setup
(``second_vi_run.ipynb``: coreset M=100, minibatch 256, mc_samples 10,
inner_it 20). Metric = **ELBO-gradient evaluations per second per chip**:
each outer step performs ``inner_it`` inner-ELBO grad evals (through the
differentiable unroll) plus one outer IW-ELBO grad eval.

``vs_baseline`` = our evals/sec divided by the reference PyTorch
implementation's evals/sec for the SAME step on this host (the reference
is imported read-only from /root/reference and timed over a few steps;
no GPU reference numbers are published — BASELINE.md). If the reference
can't run here, vs_baseline is null.

Prints ONE json line:
  {"metric": "elbo_grad_evals_per_sec_per_chip", "value": N,
   "unit": "evals/s/chip", "vs_baseline": R}
"""

import json
import os
import sys
import time

import numpy as np

M, S, B, INNER_IT, N_TRAIN = 100, 10, 256, 20, 60000
WARMUP, STEPS = 2, 10


def bench_jax():
    import jax

    from psvi_tpu.data import read_dataset
    from psvi_tpu.inference.psvi import PSVI

    data = read_dataset("synth_mnist")
    eng = PSVI(
        data, method="psvi_learn_v", num_pseudo=M, mc_samples=S,
        architecture="lenet", inner_it=INNER_IT, num_epochs=1,
        data_minibatch=B, log_every=1000, init_sd=1e-3, seed=0,
        # TPU mixed precision: bf16 activations through the conv/dense stack,
        # f32 parameters/loss math. Convergence parity with f32 validated
        # (tests/test_mixed_precision.py; PARITY.md) — +17% step throughput.
        compute_dtype="bfloat16",
        # full inner unroll: the measured steady-state throughput ceiling
        # (21.4 vs 26.9 ms/step on v5e; numerics identical, tested). The
        # metric here is steady-state evals/s (compile excluded since
        # round 1); the engine DEFAULT stays scan-2 because full unroll
        # breaks even only past ~7k outer steps (BENCHMARKS.md round-5
        # section) — reachable via --inner_unroll.
        inner_unroll=INNER_IT,
    )
    # the PSVI N rescaling uses the real MNIST N for comparability
    eng.N = N_TRAIN
    key = jax.random.PRNGKey(0)
    state = eng.state
    # Honest timing on the (possibly tunneled) TPU: chain STEPS outer steps
    # in ONE dispatch via the engine's multi-step scan and force completion
    # with a host transfer. jax.block_until_ready can return before device
    # completion on the axon platform, and per-dispatch RTT is ~30 ms — a
    # per-step dispatch loop under-reports throughput by up to 2x.
    state, losses = eng._multi_step(state, key, STEPS)  # compile + warmup
    _ = float(losses[-1])
    t0 = time.perf_counter()
    state, losses = eng._multi_step(state, jax.random.fold_in(key, 1), STEPS)
    _ = float(losses[-1])  # forces completion
    dt = time.perf_counter() - t0
    evals_per_sec = STEPS * (INNER_IT + 1) / dt
    return evals_per_sec, dt / STEPS


def bench_reference_torch(max_steps=3):
    """Time the reference's nested_step on the same shapes (CPU torch)."""
    sys.path.insert(0, "/root/reference")
    _stub_missing()
    import torch

    torch.manual_seed(0)
    from psvi.inference.psvi_classes import PSVI as RefPSVI
    from psvi.models.neural_net import make_lenet, VILinear, set_mc_samples
    import torch.nn as nn

    obj = RefPSVI.__new__(RefPSVI)
    obj.device = torch.device("cpu")
    obj.u = torch.randn(M, 1, 28, 28, requires_grad=True)
    obj.z = torch.tensor(np.arange(M) % 10).float()
    obj.v = torch.zeros(M, requires_grad=True)
    obj.N = N_TRAIN
    obj.nc = 10
    obj.mc_samples = S
    obj.learn_v, obj.learn_z, obj.parameterised = True, False, True
    obj.f = torch.softmax
    from psvi.models.neural_net import categorical_fn

    obj.distr_fn = categorical_fn
    obj.model = make_lenet(linear_class=VILinear, nonl_class=nn.ReLU,
                           mc_samples=S, init_sd=1e-3)
    set_mc_samples(obj.model, S)
    obj.optim_net = torch.optim.Adam(obj.model.parameters(), 1e-3)
    obj.optim_u = torch.optim.Adam([obj.u], 1e-4)
    obj.optim_v = torch.optim.Adam([obj.v], 1e-3)
    obj.scheduler_optim_net = None
    obj.register_elbos = False
    obj.elbos = []
    obj.inner_it = INNER_IT
    obj.log_every = 1000

    xb = torch.randn(B, 1, 28, 28)
    yb = torch.tensor(np.arange(B) % 10).float()

    obj.nested_step(xb, yb)  # warmup
    t0 = time.perf_counter()
    for _ in range(max_steps):
        obj.nested_step(xb, yb)
    dt = time.perf_counter() - t0
    return max_steps * (INNER_IT + 1) / dt, dt / max_steps


def _stub_missing():
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


def main():
    value, step_time = bench_jax()
    vs = None
    if os.environ.get("BENCH_COMPARE_TORCH", "1") == "1":
        try:
            ref_evals, ref_step = bench_reference_torch()
            vs = value / ref_evals
        except Exception as e:
            print(f"# reference torch bench unavailable: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": "elbo_grad_evals_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "evals/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()

import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/reference")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo/scripts")
from parity_vs_reference import stub_reference_deps, run_reference

from psvi_tpu.data import read_dataset
from psvi_tpu.inference.psvi import make_psvi_engine

cfg = dict(num_pseudo=10, mc_samples=10, architecture="logistic_regression",
           n_hidden=None, inner_it=10, num_epochs=101,
           data_minibatch=64, log_every=25, init_sd=1e-3, lr0net=1e-3,
           lr0u=1e-2, lr0v=1e-1, lr0alpha=1e-3)
data = read_dataset("halfmoon")
SEEDS = list(range(20))

# ours with engine reuse
t0=time.time()
eng = None
ours = []
for s in SEEDS:
    if eng is None:
        eng = make_psvi_engine(data, method="psvi_learn_v", seed=s,
            num_pseudo=cfg["num_pseudo"], mc_samples=cfg["mc_samples"],
            architecture=cfg["architecture"], inner_it=cfg["inner_it"],
            num_epochs=cfg["num_epochs"], data_minibatch=cfg["data_minibatch"],
            log_every=cfg["log_every"], init_sd=cfg["init_sd"],
            lr0net=cfg["lr0net"], lr0u=cfg["lr0u"], lr0v=cfg["lr0v"],
            lr0alpha=cfg["lr0alpha"])
    else:
        eng.reseed(s)
    r = eng.run_psvi()
    ours.append(r["accs"][-1])
print(f"ours   ({time.time()-t0:.0f}s): {np.mean(ours):.4f} ± {np.std(ours):.4f}  {sorted(np.round(ours,3))}")

t0=time.time()
ref = run_reference(data, "psvi_learn_v", SEEDS, cfg)
refa = [r["acc"] for r in ref]
print(f"ref    ({time.time()-t0:.0f}s): {np.mean(refa):.4f} ± {np.std(refa):.4f}  {sorted(np.round(refa,3))}")

from scipy import stats
u = stats.mannwhitneyu(ours, refa)
print("Mann-Whitney U p-value:", u.pvalue)

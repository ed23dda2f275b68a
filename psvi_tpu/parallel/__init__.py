from psvi_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from psvi_tpu.parallel.trials import TrialParallelPSVI, run_trials

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "TrialParallelPSVI",
    "run_trials",
]

from psvi_tpu.inference.psvi import PSVI, PSVIRegressor, run_psvi

__all__ = ["PSVI", "PSVIRegressor", "run_psvi"]

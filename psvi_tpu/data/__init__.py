from psvi_tpu.data.datasets import read_dataset, read_regression_dataset, DataBundle
from psvi_tpu.data import synthetic

__all__ = ["read_dataset", "read_regression_dataset", "DataBundle", "synthetic"]

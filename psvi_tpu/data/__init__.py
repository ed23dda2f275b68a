from psvi_tpu.data.datasets import (
    DataBundle,
    hyperparams_for_regression,
    read_dataset,
    read_regression_dataset,
    split_data,
)
from psvi_tpu.data import synthetic

__all__ = [
    "read_dataset", "read_regression_dataset", "DataBundle", "split_data",
    "hyperparams_for_regression", "synthetic",
]

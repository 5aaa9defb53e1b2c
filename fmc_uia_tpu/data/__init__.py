from fmc_uia_tpu.data.dataset import MultiTaskDataset
from fmc_uia_tpu.data.sampler import MultiTaskUniformSampler
from fmc_uia_tpu.data.pipeline import (
    DataEngine,
    build_data_engines,
    split_train_val,
)

__all__ = [
    "MultiTaskDataset",
    "MultiTaskUniformSampler",
    "DataEngine",
    "build_data_engines",
    "split_train_val",
]

from fmc_uia_tpu.utils.common import (
    set_seed,
    count_parameters,
    tree_size_bytes,
)

__all__ = ["set_seed", "count_parameters", "tree_size_bytes"]

from fmc_uia_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)
from fmc_uia_tpu.parallel.sharding import (
    apply_param_sharding,
    make_param_specs,
    tp_spec_for_path,
)
from fmc_uia_tpu.parallel.distributed import (
    init_distributed,
    make_hybrid_mesh,
    mesh_from_config,
)
from fmc_uia_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_loss_fn,
    shard_stage_params,
    stack_stage_params,
)
from fmc_uia_tpu.parallel.expert import (
    default_capacity,
    ragged_moe_apply,
)
from fmc_uia_tpu.parallel.zero import (
    shard_opt_state,
    zero_sharded_fraction,
    zero_spec_for_leaf,
)
from fmc_uia_tpu.parallel.activation import (
    activation_mesh,
    activation_mesh_scope,
    set_activation_mesh,
    shard_activation,
    shard_batch_activation,
)

__all__ = [
    "activation_mesh",
    "activation_mesh_scope",
    "set_activation_mesh",
    "shard_activation",
    "shard_batch_activation",
    "pipeline_apply",
    "pipeline_loss_fn",
    "shard_stage_params",
    "stack_stage_params",
    "default_capacity",
    "ragged_moe_apply",
    "make_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
    "apply_param_sharding",
    "make_param_specs",
    "tp_spec_for_path",
    "init_distributed",
    "make_hybrid_mesh",
    "mesh_from_config",
    "shard_opt_state",
    "zero_sharded_fraction",
    "zero_spec_for_leaf",
]

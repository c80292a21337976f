from .mesh import (make_mesh, data_sharding, replicate_sharding,  # noqa: F401
                   shard_batch, shard_params, pipeline_param_spec,
                   vqgan_param_spec, moe_cond_transformer_param_spec)
from .context import set_active_mesh, active_mesh, use_mesh  # noqa: F401
from .pipeline_parallel import (pp_stack_apply, pp_stack_spec,  # noqa: F401
                                pp_cond_transformer_apply,
                                pp_cond_transformer_param_spec, shard_for_pp)

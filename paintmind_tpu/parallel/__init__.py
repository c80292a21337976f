from .mesh import (make_mesh, data_sharding, replicate_sharding,  # noqa: F401
                   shard_batch, shard_params, pipeline_param_spec,
                   vqgan_param_spec)
from .context import set_active_mesh, active_mesh, use_mesh  # noqa: F401

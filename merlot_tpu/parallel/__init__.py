from merlot_tpu.parallel.mesh import (make_mesh, param_partition_spec,  # noqa: F401
                                      shard_params, batch_sharding,
                                      shard_opt_state, zero1_partition_spec)
from merlot_tpu.parallel.pipeline import (microbatch, pipeline_apply,  # noqa: F401
                                          shard_stage_params,
                                          stack_stage_params)

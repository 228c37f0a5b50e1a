from merlot_tpu.parallel.mesh import (make_mesh, param_partition_spec,  # noqa: F401
                                      shard_params, batch_sharding)

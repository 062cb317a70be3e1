from .mesh import (make_mesh, shard_params_tp, shard_batch_dp, replicate,
                   data_parallel_map)

__all__ = ["make_mesh", "shard_params_tp", "shard_batch_dp", "replicate",
           "data_parallel_map"]

from .mesh import (make_mesh, batch_sharding, replicated, shard_batch,
                   replicate, tp_shard_params,
                   initialize_distributed, sync_hosts)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate", "tp_shard_params", "initialize_distributed",
           "sync_hosts"]

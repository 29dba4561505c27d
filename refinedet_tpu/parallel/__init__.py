from refinedet_tpu.parallel import distributed
from refinedet_tpu.parallel.mesh import (batch_sharding, image_sharding,
                                         make_mesh, replicate,
                                         replicated_sharding, shard_batch)

__all__ = ["batch_sharding", "distributed", "image_sharding", "make_mesh",
           "replicate", "replicated_sharding", "shard_batch"]

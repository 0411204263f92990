from timetuning_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]

# tp / sp / pp are imported lazily by their callers (each pulls in ops/
# model modules); see parallel/tp.py, parallel/sp.py, parallel/pp.py.

from lt_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from lt_tpu.parallel.spatial import (  # noqa: F401
    constrain_volume,
    volume_sharding,
)

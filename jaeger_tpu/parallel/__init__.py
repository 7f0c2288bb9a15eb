from jaeger_tpu.parallel.mesh import (
    data_mesh,
    replicate,
    shard_along,
)

from dissc_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicate,
    shard_batch,
)
from dissc_tpu.parallel.collectives import pmean_if, psum_if

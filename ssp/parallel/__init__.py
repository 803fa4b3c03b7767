"""Device-mesh utilities: data-parallel SPMD over ICI."""

from ssp.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

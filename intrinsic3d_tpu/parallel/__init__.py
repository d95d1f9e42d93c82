from intrinsic3d_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    replicate,
    shard_assembly,
)

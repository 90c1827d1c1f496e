from .mesh import (  # noqa: F401
    candidate_sharding,
    make_mesh,
    replicate_params,
    shard_batch,
)

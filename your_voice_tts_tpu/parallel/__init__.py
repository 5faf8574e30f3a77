"""Parallelism: device mesh + sharding for data-parallel training over ICI."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

"""Mesh/collectives scaling layer (SURVEY.md sections 2.2, 5.8)."""

from .mesh import (  # noqa: F401
    batch_sharding, make_mesh, shard_params, sharded_inference_fn,
)

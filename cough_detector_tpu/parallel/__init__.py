"""Mesh/sharding utilities: DP training + stream-parallel serving."""

from .mesh import (
    batch_sharding,
    corpus_sharding,
    make_routed_gather,
    make_mesh,
    maybe_initialize_distributed,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
    shard_streams,
    stream_sharding,
)

__all__ = [
    "batch_sharding",
    "corpus_sharding",
    "make_routed_gather",
    "make_mesh",
    "maybe_initialize_distributed",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_streams",
    "stream_sharding",
]

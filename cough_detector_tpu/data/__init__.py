"""Data layer: audio I/O, datasets, loaders, acquisition, synthesis."""

from . import acquire, audio_io, synth
from .datasets import (
    BatchLoader,
    ClipDataset,
    CombinedDataset,
    CoughDataset,
    ESC50Dataset,
    prepare_dataset_split,
)
from .shards import ShardLoader, write_shards

__all__ = [
    "acquire",
    "audio_io",
    "synth",
    "BatchLoader",
    "ClipDataset",
    "CombinedDataset",
    "CoughDataset",
    "ESC50Dataset",
    "prepare_dataset_split",
    "ShardLoader",
    "write_shards",
]

"""Data pipeline: audio IO, manifest + packed-shard datasets, numpy waveform
transforms, sharded loaders — capability parity with reference
utilities/data/ (~920 LoC)."""

from leaf_tpu.data.audio import load_audio, load_audio_bytes
from leaf_tpu.data.dataset import (
    PackedDataset,
    RawWaveformDataset,
    deflate_packed_batch,
    normalize_waveform,
    parse_labels,
)
from leaf_tpu.data.loader import (
    DataLoader,
    ShardedSampler,
    collate_fixed,
    prefetch_to_device,
    setup_dataloaders,
)
from leaf_tpu.data.transforms import (
    leaf_supervised_transforms,
    get_raw_transforms_v2,
    simple_supervised_transforms,
)

__all__ = [
    "load_audio",
    "load_audio_bytes",
    "RawWaveformDataset",
    "PackedDataset",
    "deflate_packed_batch",
    "normalize_waveform",
    "parse_labels",
    "DataLoader",
    "ShardedSampler",
    "collate_fixed",
    "prefetch_to_device",
    "setup_dataloaders",
    "leaf_supervised_transforms",
    "get_raw_transforms_v2",
    "simple_supervised_transforms",
]

"""Map-style waveform datasets: CSV manifests and packed msgpack shards.

Capability parity with reference utilities/data/raw_dataset.py:23-113
(`RawWaveformDataset`) and packed_dataset.py:37-176 (`PackedDataset`), in
framework-free numpy:

- CSV manifest with ``files``/``labels`` (+ optional ``durations`` for
  cropped reads), JSON label map;
- label parsing: multilabel → k-hot float vector from delimited label
  strings, multiclass → int id (raw_dataset.py:93-102);
- optional waveform normalization (RawAudioParser's N(0,1),
  raw_waveform_parser.py:6-23), per-item transform, mixer hook;
- packed shards: each "file" is a msgpack block of N records
  {audio: bytes, label, duration}; one __getitem__ returns the whole
  shard, shuffled in-train (packed_dataset.py:135-160); GCS paths
  (gs://…) supported when google-cloud-storage is installed, with the
  reference's lazy per-worker client init (packed_dataset.py:129-146).
"""

from __future__ import annotations

import json
import os
import random
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from leaf_tpu.data.audio import load_audio, load_audio_bytes

__all__ = ["RawWaveformDataset", "PackedDataset", "parse_labels",
           "normalize_waveform"]


def normalize_waveform(x: np.ndarray) -> np.ndarray:
    """Zero-mean unit-variance (RawAudioParser.normalize_waveform,
    reference: raw_waveform_parser.py:14-18)."""
    mean = x.mean()
    std = x.std()
    return ((x - mean) / (std + 1e-8)).astype(np.float32)


def parse_labels(lbls: Union[str, int], labels_map: dict, mode: str,
                 delimiter: str = ",") -> Union[int, np.ndarray]:
    if mode == "multilabel":
        out = np.zeros(len(labels_map), dtype=np.float32)
        for lbl in str(lbls).split(delimiter):
            out[labels_map[lbl]] = 1.0
        return out
    if mode == "multiclass":
        return labels_map[lbls]
    raise ValueError(f"unknown label mode {mode}")


class _AudioConfigMixin:
    def _parse_audio_config(self, audio_config: dict, cropped_read: bool,
                            delimiter: str) -> None:
        self.sr = int(audio_config.get("sample_rate", 22050))
        self.normalize = bool(audio_config.get("normalize", False))
        self.min_duration = float(audio_config.get("min_duration", 2.5))
        self.background_noise_path = audio_config.get("bg_files", None)
        if cropped_read:
            self.num_frames = int(
                float(audio_config["random_clip_size"]) * self.sr)
        else:
            self.num_frames = -1
        self.labels_delim = audio_config.get("delimiter", delimiter)

    def _load_labels_map(self, labels_map: str) -> None:
        assert os.path.isfile(labels_map), labels_map
        assert os.path.splitext(labels_map)[-1] == ".json"
        with open(labels_map) as fd:
            self.labels_map = json.load(fd)


class RawWaveformDataset(_AudioConfigMixin):
    """One item = one audio file → (waveform (T,), label)."""

    def __init__(self, manifest_path: str, labels_map: str,
                 audio_config: dict, augment: bool = False,
                 mode: str = "multilabel", delimiter: str = ",",
                 mixer: Optional[Callable] = None,
                 transform: Optional[Callable] = None,
                 is_val: bool = False, cropped_read: bool = False,
                 in_memory: bool = False, wire_dtype: str = "float32"):
        import pandas as pd
        assert audio_config is not None
        self.mode = mode
        self.transform = transform
        self.mixer = mixer
        self.cropped_read = cropped_read
        self.is_val = is_val
        self._load_labels_map(labels_map)
        self._parse_audio_config(audio_config, cropped_read, delimiter)
        # wire_dtype='int16' keeps waveforms as raw PCM on the host (4×
        # smaller cache + host→device transfers; the jitted steps upscale
        # with waveform_from_wire, bit-identical for 16-bit sources). Only
        # valid when host-side processing is scale-equivariant: crop/pad
        # transforms are, per-clip N(0,1) normalization is not.
        assert wire_dtype in ("float32", "int16"), wire_dtype
        if wire_dtype == "int16" and self.normalize:
            raise ValueError(
                "wire_dtype='int16' is incompatible with "
                "audio_config.normalize=True (per-clip normalization needs "
                "float waveforms on the host)")
        self.wire_dtype = wire_dtype
        df = pd.read_csv(manifest_path)
        self.files: List[str] = df["files"].values.tolist()
        self.labels = df["labels"].values.tolist()
        self.durations = (df["durations"].values.tolist()
                          if cropped_read else None)
        self.length = len(self.files)
        # data.in_memory (the reference carries the flag through its config,
        # config_parser.py:19-25, but never uses it — implemented here):
        # cache decoded waveforms after first read. Incompatible with
        # cropped reads (those decode a random slice per access).
        self.in_memory = bool(in_memory) and not cropped_read
        self._cache: dict = {}

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int):
        dur = (self.durations[index]
               if self.cropped_read and not self.is_val else None)
        if self.in_memory and index in self._cache:
            audio = self._cache[index]
            label = parse_labels(self.labels[index], self.labels_map,
                                 self.mode, self.labels_delim)
            if self.transform is not None:
                audio = self.transform(audio)
            if self.mixer is not None:
                audio, final_label = self.mixer(self, audio, label)
                if self.mode != "multiclass":
                    label = final_label
            return audio, label
        audio = load_audio(self.files[index], self.sr, self.min_duration,
                           read_cropped=self.cropped_read and not self.is_val,
                           frames_to_read=self.num_frames, audio_size=dur,
                           dtype=self.wire_dtype)
        if self.normalize:
            audio = normalize_waveform(audio)
        # Cache AFTER normalization so cache hits see the exact same
        # waveform as the first epoch (normalization is deterministic;
        # transforms/mixer stay per-access below).
        if self.in_memory:
            self._cache[index] = audio
        label = parse_labels(self.labels[index], self.labels_map, self.mode,
                             self.labels_delim)
        if self.transform is not None:
            audio = self.transform(audio)
        if self.mixer is not None:
            audio, final_label = self.mixer(self, audio, label)
            if self.mode != "multiclass":
                label = final_label
        return audio, label


def _unpack_block(path: str):
    import msgpack
    try:
        import msgpack_numpy as msgnp
        object_hook = msgnp.decode
    except ImportError:
        object_hook = None
    with open(path, "rb") as f:
        return msgpack.unpackb(f.read(), object_hook=object_hook, raw=False)


class PackedDataset(_AudioConfigMixin):
    """One item = one shard file → (list of waveforms, list of labels).

    Use with ``deflate_packed_batch`` to flatten shard lists into a batch
    (reference: packed_collate_fn_raw_*, packed_dataset.py:163-176).
    """

    def __init__(self, manifest_path: str, labels_map: str,
                 audio_config: dict, augment: bool = False,
                 mode: str = "multilabel", delimiter: str = ",",
                 mixer: Optional[Callable] = None,
                 transform: Optional[Callable] = None,
                 is_val: bool = False, cropped_read: bool = False,
                 gcs_bucket_path: Optional[str] = None):
        import pandas as pd
        self.mode = mode
        self.transform = transform
        self.mixer = mixer
        self.cropped_read = cropped_read
        self.is_val = is_val
        self.gcs_bucket_path = gcs_bucket_path
        self._client = None  # lazy per-worker GCS client
        self._load_labels_map(labels_map)
        self._parse_audio_config(audio_config, cropped_read, delimiter)
        df = pd.read_csv(manifest_path)
        self.files: List[str] = df["files"].values.tolist()
        self.length = len(self.files)

    def __len__(self) -> int:
        return self.length

    def _init_gcs(self):
        from google.cloud import storage  # optional dep, gated
        self._client = storage.Client()
        self._bucket = self._client.get_bucket(self.gcs_bucket_path)

    def _read_block(self, filepath: str):
        if self.gcs_bucket_path:
            import msgpack
            try:
                import msgpack_numpy as msgnp
                hook = msgnp.decode
            except ImportError:
                hook = None
            if self._client is None:
                self._init_gcs()
            blob = self._bucket.blob(filepath)
            with blob.open("rb") as fp:
                return msgpack.unpackb(fp.read(), object_hook=hook, raw=False)
        return _unpack_block(filepath)

    def _item_from_record(self, record: dict):
        dur = record.get("duration") if (self.cropped_read
                                         and not self.is_val) else None
        audio = load_audio_bytes(
            record["audio"], self.sr, self.min_duration,
            read_cropped=self.cropped_read and not self.is_val,
            frames_to_read=self.num_frames, audio_size=dur)
        if audio is None:
            return None, None
        if self.normalize:
            audio = normalize_waveform(audio)
        label = parse_labels(record["label"], self.labels_map, self.mode,
                             self.labels_delim)
        if self.transform is not None:
            audio = self.transform(audio)
        return audio, label

    def __getitem__(self, item: int):
        block = self._read_block(self.files[item])
        idxs = (np.arange(len(block)) if self.is_val
                else np.random.permutation(len(block)))
        waves, labels = [], []
        for idx in idxs:
            audio, label = self._item_from_record(block[idx])
            if audio is None:
                continue
            if self.mixer is not None:
                audio, final_label = self.mixer(self, audio, label)
                if self.mode != "multiclass":
                    label = final_label
            waves.append(audio)
            labels.append(label)
        return waves, labels


def deflate_packed_batch(batches):
    """Flatten a list of shard outputs into (waves, labels) lists
    (reference: packed_dataset.py:163-176)."""
    waves, labels = [], []
    for shard_waves, shard_labels in batches:
        waves.extend(shard_waves)
        labels.extend(shard_labels)
    return waves, labels

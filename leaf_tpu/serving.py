"""Serving: AOT-exported, weight-embedded inference artifacts.

The reference has no serving story — deployment means "load the training
checkpoint into torch and call forward" (reference README.md:94-114).
Production TPU serving wants the opposite: a self-contained artifact that
(a) embeds the weights, (b) is compiled ahead of time for fixed batch
shapes so the serving process never traces Python, and (c) survives
process/framework-version boundaries. This module provides that via
``jax.export`` (serialized StableHLO):

    save_exported(dir, cfg, variables)      # writes model_b{N}.jaxexport
    model = ServingModel.load(dir)          # no Flax/model code needed
    logits = model(waveforms)               # (B, T) → (B, num_classes)

Batching: artifacts are exported per batch-size bucket; ``__call__`` pads
the request up to the smallest bucket ≥ B and slices the result back —
the same static-shape discipline the training stack uses (variable-length
eval uses 1 s windows upstream, evaluate.py).

Note: exporting ON a TPU embeds the fused Pallas frontend kernel (it is a
TPU custom call); exporting on CPU (or with ``platforms=['cpu', 'tpu']``
for a portable artifact) traces the pure-XLA path — identical numerics,
see leaf_tpu/ops/fused_frontend.py parity tests.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from leaf_tpu.frontend.streaming import LeafStreamer as _LeafStreamer

__all__ = ["save_exported", "ServingModel", "DEFAULT_BATCH_SIZES",
           "save_exported_streaming", "StreamingServingModel"]

# No b=1 bucket by default: measured on the v5e (scripts/serving_latency.py)
# a single clip costs MORE device time than a padded batch of 8 (1.28 vs
# 0.97 ms — the fused frontend's batch tile is sublane-padded at B=1), so
# padding singles up to 8 strictly dominates. Pass batch_sizes=(1, ...)
# explicitly to export a b=1 artifact anyway.
DEFAULT_BATCH_SIZES = (8, 64)
_MANIFEST = "serving.json"


def _build_forward(cfg: dict, variables: dict):
    import jax
    import jax.numpy as jnp

    from leaf_tpu.models import Classifier

    model = Classifier(cfg=cfg)

    def forward(waveforms):
        return model.apply(variables, waveforms, train=False)

    return jax.jit(forward)


def save_exported(out_dir: str, cfg: dict, variables: dict,
                  batch_sizes: Sequence[int] = DEFAULT_BATCH_SIZES,
                  clip_samples: Optional[int] = None,
                  platforms: Optional[Sequence[str]] = None) -> dict:
    """Export weight-embedded inference artifacts for each batch bucket.

    Args:
      out_dir: directory to create/populate.
      cfg: the experiment config (as from load_hparams / get_config).
      variables: {'params': ..., 'batch_stats': ...} trained variables.
      batch_sizes: ascending static batch buckets to compile.
      clip_samples: input length (default: 1 s at the cfg sample rate —
        the evaluate.py window size).
      platforms: lowering platforms, e.g. ['cpu', 'tpu'] for a portable
        artifact (default: the current backend only).

    Returns the manifest dict (also written to serving.json).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    sr = int(cfg["audio_config"]["sample_rate"])
    t = int(clip_samples or sr)
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    os.makedirs(out_dir, exist_ok=True)

    fwd = _build_forward(cfg, variables)
    files = {}
    num_classes = None
    for b in batch_sizes:
        spec = jax.ShapeDtypeStruct((b, t), jnp.float32)
        exp = jexport.export(fwd, platforms=list(platforms)
                             if platforms else None)(spec)
        num_classes = exp.out_avals[0].shape[-1]
        name = f"model_b{b}.jaxexport"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        files[str(b)] = name
    manifest = {
        "batch_sizes": batch_sizes,
        "clip_samples": t,
        "sample_rate": sr,
        "num_classes": int(num_classes),
        "files": files,
        "model": {"arch": cfg["model"]["arch"],
                  "model_depth": cfg["model"].get("model_depth")},
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingModel:
    """Loaded serving artifact: pad-to-bucket dispatch over AOT exports."""

    def __init__(self, manifest: dict, exported: dict):
        self.manifest = manifest
        self._exported = exported  # batch_size → jax.export.Exported
        self.batch_sizes = sorted(exported)
        self.clip_samples = int(manifest["clip_samples"])

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        from jax import export as jexport
        with open(os.path.join(path, _MANIFEST)) as f:
            manifest = json.load(f)
        exported = {}
        for b, name in manifest["files"].items():
            with open(os.path.join(path, name), "rb") as f:
                exported[int(b)] = jexport.deserialize(f.read())
        return cls(manifest, exported)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def __call__(self, waveforms) -> np.ndarray:
        """(B, clip_samples) float32 → (B, num_classes) logits."""
        import jax.numpy as jnp

        x = np.asarray(waveforms, dtype=np.float32)
        assert x.ndim == 2 and x.shape[1] == self.clip_samples, x.shape
        n = x.shape[0]
        outs = []
        start = 0
        largest = self.batch_sizes[-1]
        while start < n:
            take = min(largest, n - start)
            b = self._bucket(take)
            chunk = x[start:start + take]
            if take < b:
                chunk = np.pad(chunk, ((0, b - take), (0, 0)))
            logits = self._exported[b].call(jnp.asarray(chunk))
            outs.append(np.asarray(logits)[:take])
            start += take
        return np.concatenate(outs, axis=0)


_STREAM_MANIFEST = "serving_stream.json"
# A live replica always processes ≥ 1 full chunk before flushing, and a
# serving artifact compiles fixed shapes — so only these variants export:
_STREAM_ROLES = ("first", "steady", "flush_0")


def save_exported_streaming(out_dir: str, leaf, variables,
                            chunk_size: int, n_streams: int,
                            platforms: Optional[Sequence[str]] = None) -> dict:
    """Export the streaming-frontend cell as weight-embedded AOT artifacts.

    Three variants of :class:`~leaf_tpu.frontend.streaming.StreamingLeafCell`
    are exported for a fixed (chunk_size, n_streams): the stream-start
    call, the steady-state call, and the no-remainder flush. Load with
    :class:`StreamingServingModel` — same exactness guarantee as
    LeafStreamer (tests/test_streaming.py), no Flax/model code needed in
    the serving process. The reference has neither streaming nor serving
    exports (deployment = torch checkpoint load, reference README.md:94-114).

    Args:
      leaf: the (trained) Leaf module instance — hyperparameters only.
      variables: its trained variables (embedded into the artifacts).
      chunk_size: samples per process() call (multiple of the hop,
        ≥ the geometry's min_chunk; LEAF: 640).
      n_streams: concurrent streams per replica (the fixed batch).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from leaf_tpu.frontend.streaming import LeafStreamer

    st = LeafStreamer(leaf, variables, chunk_size, batch_size=n_streams)
    geo = st.geometry
    os.makedirs(out_dir, exist_ok=True)
    shapes = {
        "first": (n_streams, geo["tail"] + chunk_size),
        "steady": (n_streams, geo["tail"] + chunk_size),
        "flush_0": (n_streams, geo["tail"] + geo["flush_pad"]),
    }
    files = {}
    for role in _STREAM_ROLES:
        cell_fn = st._cell(role)  # jitted (variables, x_work, s) → (frames, s)
        wrapped = jax.jit(
            lambda xw, s, _fn=cell_fn: _fn(variables, xw, s))
        exp = jexport.export(wrapped, platforms=list(platforms)
                             if platforms else None)(
            jax.ShapeDtypeStruct(shapes[role], jnp.float32),
            jax.ShapeDtypeStruct((n_streams, st.n_filters), jnp.float32))
        name = f"stream_{role}.jaxexport"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        files[role] = name
    manifest = {
        "chunk_size": chunk_size,
        "n_streams": n_streams,
        "hop": st.hop,
        "n_filters": st.n_filters,
        "geometry": geo,
        "files": files,
    }
    with open(os.path.join(out_dir, _STREAM_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class StreamingServingModel(_LeafStreamer):
    """Loaded streaming artifact: LeafStreamer bookkeeping over AOT
    exports — process()/flush()/reset() semantics identical, but the
    compiled cells come from ``jax.export`` artifacts (weights embedded),
    and flush() supports no remainder (feed full chunks; pad the source
    to a chunk multiple upstream if needed)."""

    def __init__(self, manifest: dict, exported: dict):
        self.manifest = manifest
        self._exported = exported  # role → jax.export.Exported
        self.leaf = None
        self.variables = None
        self._setup(int(manifest["hop"]), int(manifest["n_filters"]),
                    dict(manifest["geometry"]), int(manifest["chunk_size"]),
                    int(manifest["n_streams"]))

    @classmethod
    def load(cls, path: str) -> "StreamingServingModel":
        from jax import export as jexport
        with open(os.path.join(path, _STREAM_MANIFEST)) as f:
            manifest = json.load(f)
        exported = {}
        for role, name in manifest["files"].items():
            with open(os.path.join(path, name), "rb") as f:
                exported[role] = jexport.deserialize(f.read())
        return cls(manifest, exported)

    def _cell(self, role: str):
        if role not in self._exported:
            raise ValueError(
                f"streaming artifact has no '{role}' variant — feed full "
                f"chunks of {self.chunk_size} and flush() with no "
                f"remainder (available: {sorted(self._exported)})")
        exp = self._exported[role]
        return lambda _v, xw, s: exp.call(xw, s)

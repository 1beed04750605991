"""leaf_tpu — a TPU-native (JAX / XLA / Pallas) LEAF audio-frontend framework.

A from-scratch reimplementation of the capabilities of the reference
``leaf-pytorch`` codebase (LEAF learnable audio frontend, Zeghidour et al.,
ICLR 2021, plus a CNN classifier zoo and training stack), designed TPU-first:

- functional Flax modules + pure jitted train steps (no in-graph Python loops)
- the PCEN exponential moving average is a parallel ``associative_scan``
  (the reference unrolls a Python loop per frame,
  reference: leaf_pytorch/postprocessing.py:17-28)
- Pallas TPU kernels for the hot frontend ops (``leaf_tpu.ops``)
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding (GSPMD) or an
  explicit ``shard_map`` step (``leaf_tpu.parallel``), not per-process
  torch-xla spawns

Canonical array layout is channels-last (B, T, C) — the TPU-friendly layout —
whereas the reference uses (B, C, T). Conversions happen only at API
boundaries.
"""

__version__ = "0.2.0"

from leaf_tpu.frontend import Leaf, get_frontend  # noqa: F401
from leaf_tpu.serving import (  # noqa: F401
    ServingModel,
    StreamingServingModel,
    save_exported,
    save_exported_streaming,
)

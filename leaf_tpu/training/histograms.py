"""On-device parameter/gradient histograms — ``wandb.watch(log="all")``.

The reference attaches wandb's backward hooks which pull every tensor to
host and histogram it in numpy each ``log_freq`` steps (reference:
train_xla.py:243-244). The TPU-native equivalent computes fixed-bin
bucket counts ON DEVICE in one jitted program over the whole pytree and
ships only ``bins`` int32s + 4 scalars per tensor to the host — for
EffNet-b0 that is ~80 kB per snapshot instead of ~16 MB of raw tensors.

Usage (see train.py ``--watch_histograms``): the train step stashes its
grad pytree in ``metrics["_grads"]`` (no extra device compute per step);
at log boundaries only, the host calls :func:`histogram_tree` on params
and grads and hands the result to ``TrainLogger.log_histograms``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["tensor_histogram", "histogram_tree", "DEFAULT_BINS"]

DEFAULT_BINS = 64


def tensor_histogram(x: jnp.ndarray, bins: int = DEFAULT_BINS):
    """Bucket counts + moments for one tensor.

    Returns ``(counts[bins], lo, hi, sum, sum_sq)`` with bucket ``i``
    covering ``[lo + i*w, lo + (i+1)*w)`` for ``w = (hi-lo)/bins`` (the
    top edge is inclusive, matching ``np.histogram``). Constant tensors
    land entirely in bucket 0 with ``hi == lo``.
    """
    x = x.astype(jnp.float32).ravel()
    lo = x.min()
    hi = x.max()
    span = jnp.maximum(hi - lo, jnp.finfo(jnp.float32).tiny)
    idx = jnp.clip(((x - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
    return counts, lo, hi, x.sum(), jnp.sum(x * x)


@partial(jax.jit, static_argnums=(1,))
def _histogram_leaves(leaves: Tuple, bins: int):
    return tuple(tensor_histogram(t, bins) for t in leaves)


def _key_str(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def histogram_tree(tree, bins: int = DEFAULT_BINS,
                   prefix: str = "") -> Dict[str, Tuple]:
    """Histogram every leaf of ``tree`` in ONE jitted device program.

    Returns ``{prefix + "/".join(path): (counts, lo, hi, sum, sum_sq)}``
    with values still on device — callers batch the host transfer by
    iterating the dict (jax fetches lazily per leaf; the compute already
    happened in one program).
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    names = [prefix + "/".join(_key_str(k) for k in path) for path, _ in flat]
    hists = _histogram_leaves(tuple(v for _, v in flat), bins)
    return dict(zip(names, hists))

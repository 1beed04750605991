"""BatchNorm statistics re-estimation.

EfficientNet's torch-parity BN momentum is 0.99 (reference:
models/efficientnet/utils.py:519-521), so running statistics need O(1000)
steps to catch up with the parameters — short fine-tuning runs show
train/eval metric gaps that are pure statistics lag (measured: tr_acc 1.0 at
step 150 while eval sits at chance until ~step 1200). This utility re-walks
data in train mode with FROZEN parameters to refresh the running stats —
the standard "BN re-estimation" recipe.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

__all__ = ["recalibrate_batch_stats"]


def recalibrate_batch_stats(state, batches: Iterable, rng: jax.Array,
                            momentum_passes: int = 1,
                            preprocess: Optional[Callable] = None):
    """Refresh ``state.batch_stats`` from data with frozen params.

    Args:
      state: TrainState (params untouched).
      batches: iterable of (x, y) or x host batches (labels ignored).
      rng: PRNG key for dropout/stochastic-depth during the passes.
      momentum_passes: walk the iterable this many times.
      preprocess: optional jit-traceable ``(key, x) -> x`` run on-device
        before the forward — pass the training pipeline's wire decode +
        device augmentation so the stats are estimated on the SAME input
        distribution the parameters were trained on.

    With EfficientNet's torch-parity momentum 0.99, N batches move the
    stats (1 − 0.99^N) of the way to the fresh estimate: ~100 batches
    recover 63%, ~400 recover 98% — size N (or momentum_passes over a
    short loader) accordingly.

    Returns the state with updated batch_stats.
    """

    @jax.jit
    def one_pass(batch_stats, x, key):
        if preprocess is not None:
            k_pre, key = jax.random.split(key)
            x = preprocess(k_pre, x)
        _, mutated = state.apply_fn(
            {"params": state.params, "batch_stats": batch_stats},
            x, train=True, rngs={"dropout": key},
            mutable=["batch_stats"])
        return mutated["batch_stats"]

    bs = state.batch_stats
    i = 0
    for _ in range(momentum_passes):
        for batch in batches:
            x = batch[0] if isinstance(batch, (tuple, list)) else batch
            bs = one_pass(bs, jnp.asarray(x), jax.random.fold_in(rng, i))
            i += 1
    return state.replace(batch_stats=bs)

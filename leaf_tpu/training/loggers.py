"""Observability: throughput tracking, TensorBoard, wandb (gated), profiler.

Capability parity with the reference's tracing/logging story (SURVEY §5):
``xm.RateTracker`` + per-N-step step closures (reference:
train_xla.py:251,284-288,98-106) → ``RateTracker``; TensorBoard via
torch_xla test_utils (218,351-355) → tensorboardX (gated); wandb runs
(222-225,243-244,349-350) → gated on import+flag; torch-xla compile-counter
dumps → ``jax.profiler`` trace hooks.
"""

from __future__ import annotations

import os
import time
from typing import Optional

__all__ = ["RateTracker", "TrainLogger", "profile_trace"]


class RateTracker:
    """Examples/sec tracker (xm.RateTracker equivalent)."""

    def __init__(self, smooth_factor: float = 0.4):
        self.smooth_factor = smooth_factor
        self.reset()

    def reset(self) -> None:
        self._start = time.time()
        self._partial_time = self._start
        self._partial_count = 0.0
        self._count = 0.0
        self._rate = 0.0

    def add(self, count: float) -> None:
        now = time.time()
        self._count += count
        self._partial_count += count
        dt = now - self._partial_time
        if dt > 0.5:
            partial_rate = self._partial_count / dt
            self._rate = (self._rate * self.smooth_factor
                          + partial_rate * (1.0 - self.smooth_factor)) \
                if self._rate else partial_rate
            self._partial_count = 0.0
            self._partial_time = now

    def rate(self) -> float:
        return self._rate

    def global_rate(self) -> float:
        dt = time.time() - self._start
        return self._count / dt if dt > 0 else 0.0


class TrainLogger:
    """stdout + optional TensorBoard + optional wandb, master-process only."""

    def __init__(self, exp_dir: str, is_master: bool = True,
                 use_tensorboard: bool = True,
                 wandb_config: Optional[dict] = None):
        self.is_master = is_master
        self.tb = None
        self.wandb = None
        if not is_master:
            return
        os.makedirs(exp_dir, exist_ok=True)
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            except ImportError:
                pass
        if wandb_config:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(**wandb_config)
            except ImportError:
                print("wandb not installed; skipping wandb logging")

    def print(self, msg: str) -> None:
        """xm.master_print equivalent."""
        if self.is_master:
            print(msg, flush=True)

    def log_scalars(self, scalars: dict, step: int) -> None:
        if not self.is_master:
            return
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)

    def log_histograms(self, hists: dict, step: int) -> None:
        """Write per-tensor histograms (the ``wandb.watch(log="all")``
        equivalent): ``hists`` maps tag → ``(counts, lo, hi, sum, sum_sq)``
        as produced on device by ``leaf_tpu.training.histograms
        .histogram_tree``; only the bucket counts cross to the host here.
        """
        if not self.is_master or (self.tb is None and self.wandb is None):
            return
        import numpy as np
        for tag, (counts, lo, hi, s, ssq) in hists.items():
            counts = np.asarray(counts)
            lo = float(lo)
            hi = float(hi)
            if not hi > lo:
                # constant tensor: widen by a RELATIVE epsilon — an
                # absolute 1e-12 (or even one ulp) underflows against
                # |lo| >~ 1e4 and linspace then emits identical edges,
                # which tensorboard/wandb reject as malformed buckets
                hi = lo + max(abs(lo), 1.0) * 1e-6
            edges = np.linspace(lo, hi, counts.shape[0] + 1)
            if self.tb is not None:
                self.tb.add_histogram_raw(
                    tag, min=lo, max=hi, num=int(counts.sum()),
                    sum=float(s), sum_squares=float(ssq),
                    bucket_limits=edges[1:].tolist(),
                    bucket_counts=counts.tolist(), global_step=step)
            if self.wandb is not None:
                self.wandb.log(
                    {tag: self.wandb.Histogram(
                        np_histogram=(counts, edges))}, step=step)

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


class profile_trace:
    """Context manager around ``jax.profiler`` for step-range traces —
    the TPU-native replacement for torch-xla's debug metric dumps."""

    def __init__(self, logdir: Optional[str]):
        self.logdir = logdir

    def __enter__(self):
        if self.logdir:
            import jax
            jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        if self.logdir:
            import jax
            jax.profiler.stop_trace()
        return False

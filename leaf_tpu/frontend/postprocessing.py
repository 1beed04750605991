"""sPCEN — per-channel energy normalization with a learnable EMA smoother.

TPU-first design: the exponential moving average is a *linear recurrence*
``s_t = w·x_t + (1-w)·s_{t-1}``, which we evaluate with
``jax.lax.associative_scan`` — O(log T) depth, fully parallel across (B, C)
lanes on the VPU. The reference instead unrolls a Python for-loop over ~100
frames into ~100 sequential XLA ops (reference:
leaf_pytorch/postprocessing.py:17-28) — the single biggest graph pathology in
the reference's hot path.

Parity: reference leaf_pytorch/postprocessing.py (PCENLayer, EMA): smoother
coeff clamped to [0, 1]; EMA initial state is the first frame (so
``ema[0] == x[0]`` exactly); α clamped above by 1, root below by 1; output
``(x / (floor + EMA)^α + δ)^(1/r) − δ^(1/r)``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

__all__ = ["ExponentialMovingAverage", "PCENLayer", "ema_scan"]


def ema_scan(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """EMA along axis 1 of (B, T, C), per-channel coeff ``w`` of shape (C,).

    ``s_0 = x_0``;  ``s_t = w·x_t + (1-w)·s_{t-1}`` for t ≥ 1.

    Implemented as an associative scan over pairs (a, b) representing the
    affine map ``s ↦ a·s + b``, composed left-to-right.
    """
    a = jnp.broadcast_to(1.0 - w, x.shape).astype(x.dtype)
    b = w * x
    # First frame: identity-ish element producing exactly x_0.
    a = a.at[:, 0, :].set(0.0)
    b = b.at[:, 0, :].set(x[:, 0, :])

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, s = lax.associative_scan(combine, (a, b), axis=1)
    return s


class ExponentialMovingAverage(nn.Module):
    in_channels: int
    coeff_init: float
    per_channel: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.in_channels,) if self.per_channel else (1,)
        weights = self.param(
            "weights",
            lambda key, s, dtype: jnp.full(s, self.coeff_init, dtype),
            shape,
            self.param_dtype,
        )
        w = jnp.clip(weights, 0.0, 1.0)
        return ema_scan(x, w)


class PCENLayer(nn.Module):
    in_channels: int
    alpha: float = 0.96
    smooth_coef: float = 0.04
    delta: float = 2.0
    root: float = 2.0
    floor: float = 1e-6
    trainable: bool = True
    learn_smooth_coef: bool = True
    per_channel_smooth_coef: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) → (B, T, C)."""
        if not self.learn_smooth_coef:
            raise ValueError("SimpleRNN-based ema not implemented.")

        def const(v):
            return lambda key, s, dtype: jnp.full(s, v, dtype)

        c = (self.in_channels,)
        alpha = self.param("alpha", const(self.alpha), c, self.param_dtype)
        delta = self.param("delta", const(self.delta), c, self.param_dtype)
        root = self.param("root", const(self.root), c, self.param_dtype)

        alpha = jnp.minimum(alpha, 1.0)
        root = jnp.maximum(root, 1.0)
        ema_smoother = ExponentialMovingAverage(
            self.in_channels,
            coeff_init=self.smooth_coef,
            per_channel=self.per_channel_smooth_coef,
            param_dtype=self.param_dtype,
            name="ema",
        )(x)
        one_over_root = 1.0 / root
        return (x / (self.floor + ema_smoother) ** alpha + delta) ** one_over_root - delta**one_over_root

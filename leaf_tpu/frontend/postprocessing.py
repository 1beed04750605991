"""sPCEN — per-channel energy normalization with a learnable EMA smoother.

TPU-first design: the exponential moving average is a *linear recurrence*
``s_t = w·x_t + (1-w)·s_{t-1}``. Two exact evaluations, picked by length:

- ``ema_matmul`` (T ≤ 256): the recurrence's closed form is a single
  lower-triangular matmul ``s[b,:,c] = L_c @ x[b,:,c]`` with
  ``L_c[t,u] = w·(1−w)^{t−u}`` (u ≥ 1) and ``L_c[t,0] = (1−w)^t`` (initial
  state = first frame). ONE MXU-shaped contraction instead of ~7
  dependent scan levels — at LEAF's ~100 frames this is both the fastest
  and the lowest-latency form, and its backward is also just matmuls.
- ``ema_scan`` (any T): ``jax.lax.associative_scan`` over affine maps,
  O(log T) depth, parallel across (B, C) lanes.

The reference instead unrolls a Python for-loop over ~100 frames into ~100
sequential XLA ops (reference: leaf_pytorch/postprocessing.py:17-28) — the
single biggest graph pathology in its hot path.

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

__all__ = ["ExponentialMovingAverage", "PCENLayer", "ema_scan",
           "ema_matmul"]

# Above this many frames the O(T²) matrix form loses to the O(T log T)
# associative scan (and its (C, T, T) operator no longer fits comfortably).
_EMA_MATMUL_MAX_T = 256


def ema_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact EMA via its closed form, as one triangular contraction.

    s_t = Σ_{u=1..t} w·(1−w)^{t−u}·x_u + (1−w)^t·x_0  (s_0 = x_0).
    """
    t = x.shape[1]
    wf = jnp.broadcast_to(w.reshape(-1), (x.shape[2],)).astype(jnp.float32)
    log1m = jnp.log(jnp.maximum(1.0 - wf, 1e-30))  # (C,)
    ti = jnp.arange(t, dtype=jnp.float32)
    delta = ti[:, None] - ti[None, :]  # (T, T): t - u
    tri = delta >= 0
    # (1-w)^(t-u), masked to the lower triangle
    pow_mat = jnp.exp(jnp.where(tri, delta, 0.0)[None]
                      * log1m[:, None, None])  # (C, T, T)
    l_mat = jnp.where(tri[None], pow_mat * wf[:, None, None], 0.0)
    # column u=0 carries the initial state: L[c, t, 0] = (1-w)^t
    l_mat = l_mat.at[:, :, 0].set(pow_mat[:, :, 0])
    s = jnp.einsum("ctu,buc->btc", l_mat.astype(x.dtype), x)
    return s


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
        if x.shape[1] <= _EMA_MATMUL_MAX_T:
            return ema_matmul(x, w)
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

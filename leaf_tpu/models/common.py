"""Shared building blocks for the classifier zoo.

All backbones run channels-last (NHWC) — the native TPU/XLA layout — and take
LEAF features as a 1-channel image ``(B, n_filters, frames, 1)``. The
reference's zoo is NCHW torch (reference: models/classifier.py:16 unsqueezes
channel dim 1); layout conversion happens once in ``Classifier``.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "kaiming_normal_fan_out",
    "bn_scale_normal",
    "drop_connect",
    "max_pool_same",
    "global_avg_pool",
]


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """He-normal with fan_out mode over an HWIO conv kernel.

    Matches ``nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')``
    used by the reference ResNet (reference: models/resnet.py:104-105):
    std = sqrt(2 / fan_out), fan_out = out_channels * prod(kernel_spatial).
    """
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    fan_out = shape[-1] * receptive
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def bn_scale_normal(mean: float = 1.0, std: float = 0.02) -> Callable:
    """BatchNorm scale init N(mean, std) (reference: models/resnet.py:106-107)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def drop_connect(x: jnp.ndarray, rng, rate: float) -> jnp.ndarray:
    """Stochastic depth: drop the whole residual branch per sample.

    Reference: models/efficientnet/utils.py:129-154 — Bernoulli(keep_prob) per
    batch element, scaled by 1/keep_prob.
    """
    keep_prob = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, mask_shape)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


def max_pool_same(x: jnp.ndarray, window: int = 3, stride: int = 2,
                  pad: int = 1) -> jnp.ndarray:
    """3×3/2 max-pool with torch-style symmetric padding (pad=1)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1,1)) + flatten: (B, H, W, C) → (B, C)."""
    return jnp.mean(x, axis=(1, 2))

"""Initializers for the learnable Gabor filterbank parameters.

Flax-style initializer callables ``(key, shape, dtype) -> array`` so they plug
directly into ``self.param`` inside modules. The supported schemes mirror the
reference's init-sweep experiments (reference: leaf_pytorch/convolution.py:44-54
and cfgs/speechcommands/*_{random,xavier,kaiming}.cfg):

- ``"default"`` — mel-initialized Gabor parameters (the LEAF init)
- ``"random"``  — standard normal
- ``"xavier_normal"`` — Glorot normal on the (F, 2) parameter matrix
- ``"kaiming_normal"`` — He normal (fan-out, as torch's default fan for a
  (F, 2) matrix is fan_in=2 … see note below)
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.frontend.filters import GaborParams

__all__ = ["GaborInit", "make_initializer"]

Initializer = Callable[[jax.Array, tuple, jnp.dtype], jnp.ndarray]


class GaborInit:
    """Mel-scale Gabor parameter initializer (ignores the PRNG key).

    ``shape`` must be (n_filters, 2). Parity: reference
    leaf_pytorch/initializers.py:7-24 (2-D branch; the >2-D branch is
    NotImplemented in the reference as well).
    """

    def __init__(self, default_window_len: int = 401, **kwargs):
        self.def_win_len = default_window_len
        self._kwargs = kwargs

    def __call__(self, key, shape, dtype=jnp.float32):
        if len(shape) != 2:
            raise NotImplementedError("GaborInit only supports (n_filters, 2) shapes")
        n_filters = shape[0]
        params = GaborParams(
            n_filters=n_filters, window_len=self.def_win_len, **self._kwargs
        ).gabor_params_from_mels()
        return jnp.asarray(params, dtype=dtype)


def _xavier_normal(key, shape, dtype=jnp.float32):
    # torch.nn.init.xavier_normal_ on a 2-D (fan_out, fan_in) matrix:
    # std = sqrt(2 / (fan_in + fan_out))  (reference: convolution.py:48-50)
    fan_out, fan_in = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def _kaiming_normal(key, shape, dtype=jnp.float32):
    # torch.nn.init.kaiming_normal_ defaults: a=0, mode='fan_in',
    # nonlinearity='leaky_relu' → gain=sqrt(2), std = gain / sqrt(fan_in),
    # where for a 2-D torch tensor fan_in = shape[1] (= 2 here).
    fan_in = shape[1]
    std = math.sqrt(2.0) / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def make_initializer(
    initializer,
    window_len: int,
    sample_rate: int,
    min_freq: float,
    max_freq: float,
) -> Initializer:
    """Resolve a config string (or callable) to an initializer callable.

    Parity: reference leaf_pytorch/convolution.py:44-54.
    """
    if callable(initializer):
        return initializer
    if initializer == "default":
        return GaborInit(
            default_window_len=window_len,
            sample_rate=sample_rate,
            min_freq=min_freq,
            max_freq=max_freq,
        )
    if initializer == "random":
        return lambda key, shape, dtype=jnp.float32: jax.random.normal(key, shape, dtype)
    if initializer == "xavier_normal":
        return _xavier_normal
    if initializer == "kaiming_normal":
        return _kaiming_normal
    raise ValueError(f"unsupported initializer {initializer!r}")

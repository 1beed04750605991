"""Learnable Gaussian lowpass (the LEAF "pooling" stage).

Depthwise strided conv whose per-channel Gaussian window is regenerated from
a learnable width every forward pass. Channels-last; the depthwise conv is
VPU-bound on TPU (tiny FLOP count: C·T'·K), so XLA's grouped conv is already
near the roofline — a fused Pallas variant lives in
:mod:`leaf_tpu.ops.lowpass`.

Parity: reference leaf_pytorch/pooling.py:8-42 (weight init 0.4 ≈ Hanning,
bias init 1.0, TF-SAME padding, groups=C, stride = hop length).
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from leaf_tpu.frontend.impulse_responses import gaussian_lowpass
from leaf_tpu.frontend.utils import tf_same_padding_1d

__all__ = ["GaussianLowPass"]


class GaussianLowPass(nn.Module):
    in_channels: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, tuple] = "same"
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) → (B, T', C) with T' = ceil(T / strides) under SAME."""
        w = self.param(
            "weights",
            lambda key, shape, dtype: jnp.full(shape, 0.4, dtype),
            (self.in_channels,),
            self.param_dtype,
        )
        windows = gaussian_lowpass(w, self.kernel_size)  # (C, K)
        # Depthwise kernel (K, 1, C) with feature_group_count=C.
        kernel = windows.T[:, None, :]

        if isinstance(self.padding, str) and self.padding.lower() == "same":
            pad = tf_same_padding_1d(self.kernel_size)
        else:
            pad = self.padding
        out = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.strides,),
            padding=(pad,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.in_channels,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.ones, (self.in_channels,), self.param_dtype)
            out = out + bias
        return out

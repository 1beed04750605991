"""Learnable Gaussian lowpass (the LEAF "pooling" stage).

Depthwise strided "conv" whose per-channel Gaussian window is regenerated
from a learnable width every forward pass. Parity: reference
leaf_pytorch/pooling.py:8-42 (weight init 0.4 ≈ Hanning, bias init 1.0,
TF-SAME padding, groups=C, stride = hop length).

TPU-first formulation: instead of ``conv_general_dilated`` with
``feature_group_count=C`` — whose *input gradient* lowers to a transposed
grouped conv that is catastrophically slow in XLA (60 s/step on CPU at the
LEAF shape, and a poor fit for the MXU) — the strided depthwise conv is
expressed as ⌈K/H⌉ overlapping-block contractions: reshape the padded signal
into hop-sized blocks (B, M, H, C) and accumulate
``einsum('bfrc,cr->bfc')`` per kernel segment. Forward AND backward are then
plain reshapes + batched multiply-reduces (~100× faster backward, identical
numerics).
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.frontend.impulse_responses import gaussian_lowpass
from leaf_tpu.frontend.utils import tf_same_padding_1d

__all__ = ["GaussianLowPass", "depthwise_strided_conv"]


def depthwise_strided_conv(x: jnp.ndarray, windows: jnp.ndarray,
                           stride: int, pad: Tuple[int, int]) -> jnp.ndarray:
    """Per-channel 1-D correlation: (B, T, C) ⊛ (C, K) → (B, F, C).

    out[b,f,c] = Σ_k x_pad[b, f·H + k, c] · w[c, k], H = stride.
    Implemented as blocked einsums (see module docstring).
    """
    b, t, c = x.shape
    k = windows.shape[1]
    h = stride
    pl, pr = pad
    f = (t + pl + pr - k) // h + 1
    j_blocks = -(-k // h)  # ceil(K / H): kernel spans this many hop blocks
    m = f - 1 + j_blocks
    total = m * h
    pad_r = pr + (total - (t + pl + pr))
    if pad_r >= 0:
        xp = jnp.pad(x, ((0, 0), (pl, pad_r), (0, 0)))
    else:
        xp = jnp.pad(x, ((0, 0), (pl, 0), (0, 0)))[:, :total]
    y = xp.reshape(b, m, h, c)
    out = None
    for j in range(j_blocks):
        wj = windows[:, j * h:min((j + 1) * h, k)]  # (C, rj)
        rj = wj.shape[1]
        # f32 accumulation even under bf16 compute_dtype: each block partial
        # and the cross-block sum stay f32 (frontend.py's bf16 contract).
        term = jnp.einsum("bfrc,cr->bfc", y[:, j:j + f, :rj, :],
                          wj.astype(x.dtype),
                          preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out


class GaussianLowPass(nn.Module):
    in_channels: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, tuple] = "same"
    use_bias: bool = True
    param_dtype: Any = jnp.float32
    # emit (windows, bias) instead of pooling — used by the fused Pallas
    # path (leaf_tpu.ops); the param tree is identical.
    emit_windows: bool = False

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
        if self.emit_windows:
            bias = (self.param("bias", nn.initializers.ones,
                               (self.in_channels,), self.param_dtype)
                    if self.use_bias else None)
            return windows, bias

        if isinstance(self.padding, str) and self.padding.lower() == "same":
            pad = tf_same_padding_1d(self.kernel_size)
        else:
            pad = self.padding
        out = depthwise_strided_conv(x, windows, self.strides, pad)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.ones, (self.in_channels,), self.param_dtype)
            out = out + bias
        return out

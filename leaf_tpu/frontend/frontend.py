"""The LEAF frontend module: Gabor conv → squared modulus → Gaussian lowpass
→ clamp → sPCEN.

Canonical layout is channels-last: input waveform ``(B, T)`` (or ``(B, T, 1)``),
output ``(B, frames, n_filters)``. The reference operates (B, C, T) and emits
(B, n_filters, frames) (reference: leaf_pytorch/frontend.py:78-89); use
``jnp.swapaxes(out, 1, 2)`` for a bit-identical comparison.

Defaults are the LEAF paper defaults and are identical to the reference
(frontend.py:25-76): 40 filters, 16 kHz, 25 ms window (401 taps),
10 ms hop (stride 160), mel init in [60, 7800] Hz, sPCEN with α=0.96,
smooth=0.04, δ=2.0, r=2.0, floor=1e-12; post-pool clamp at 1e-5.

Unlike the reference, ``preemp`` and ``mean_var_norm`` are actually
implemented here (the reference raises NotImplementedError for both,
frontend.py:40-42,62-63): preemp is a learnable 2-tap filter initialized to
[-0.97, 1] (the original TF LEAF's PreempInit), and mean_var_norm is
per-(clip, channel) instance normalization over time.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from leaf_tpu.frontend import convolution, pooling, postprocessing

__all__ = ["SquaredModulus", "Leaf"]


class SquaredModulus(nn.Module):
    """|real + i·imag|² over [real-bank | imag-bank] channel halves.

    (B, T, 2F) → (B, T, F). Equivalent to the reference's
    ``2·AvgPool1d(k=2, s=2)`` over interleaved channels
    (reference: frontend.py:10-19) — pure adjacent-pair sum of squares.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, two_f = x.shape
        f = two_f // 2
        real, imag = x[..., :f], x[..., f:]
        return real * real + imag * imag


class Preemphasis(nn.Module):
    """Learnable pre-emphasis: 2-tap conv initialized to [-0.97, 1]."""

    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype: jnp.asarray([[[-0.97]], [[1.0]]], dtype),
            (2, 1, 1),
            self.param_dtype,
        )
        return lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=((0, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )


class Leaf(nn.Module):
    n_filters: int = 40
    sample_rate: int = 16000
    window_len: float = 25.0
    window_stride: float = 10.0
    preemp: bool = False
    init_min_freq: float = 60.0
    init_max_freq: float = 7800.0
    mean_var_norm: bool = False
    pcen_compression: bool = True
    use_legacy_complex: bool = False  # config-parity no-op; see impulse_responses.py
    initializer: Union[str, Callable] = "default"
    param_dtype: Any = jnp.float32
    # bfloat16 here halves HBM traffic on the (B, T, 2F)/(B, T, F)
    # intermediates and doubles MXU rate; all contractions still accumulate
    # in f32 (preferred_element_type) and PCEN runs in f32.
    compute_dtype: Any = jnp.float32
    # 'auto' | 'on' | 'off': the fused Pallas conv+sqmod+lowpass kernel
    # (leaf_tpu.ops.fused_frontend, ~2× over the XLA path on v5e). 'auto'
    # enables it on TPU when applicable (no preemp — the kernel produces no
    # waveform gradient — 401 taps, batch tileable). Same params either way.
    use_fused_kernel: str = "auto"

    @property
    def window_size(self) -> int:
        # int(sr * window_len // 1000 + 1), reference frontend.py:38
        return int(self.sample_rate * self.window_len // 1000 + 1)

    @property
    def stride(self) -> int:
        # int(sr * window_stride // 1000), reference frontend.py:39
        return int(self.sample_rate * self.window_stride // 1000)

    def _fused_applicable(self, x: jnp.ndarray) -> bool:
        if self.use_fused_kernel == "off":
            return False
        b = x.shape[0]
        tileable = b <= 128 or b % 128 == 0
        applicable = (not self.preemp and self.window_size == 401
                      and self.stride == 160 and tileable)
        if self.use_fused_kernel == "on":
            if not applicable:
                raise ValueError(
                    "use_fused_kernel='on' requires preemp=False, "
                    "window_size=401, stride=160 and a 128-tileable batch")
            return True
        import jax
        return applicable and jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Waveform (B, T) / (B, T, 1) / (B, 1, T) → features (B, T', n_filters)."""
        if x.ndim == 2:
            x = x[:, :, None]
        elif x.ndim == 3 and x.shape[1] == 1 and x.shape[2] != 1:
            # Accept reference-layout (B, 1, T) for drop-in convenience.
            x = jnp.swapaxes(x, 1, 2)

        if self.preemp:
            x = Preemphasis(param_dtype=self.param_dtype, name="preemp")(x)

        x = x.astype(self.compute_dtype)
        if self._fused_applicable(x):
            from leaf_tpu.ops.fused_frontend import fused_gabor_sqmod_lowpass
            from leaf_tpu.frontend.utils import tf_same_padding_1d
            bank = convolution.GaborConv1d(
                filters=2 * self.n_filters,
                kernel_size=self.window_size,
                initializer=self.initializer,
                use_bias=False,
                sample_rate=self.sample_rate,
                min_freq=self.init_min_freq,
                max_freq=self.init_max_freq,
                param_dtype=self.param_dtype,
                emit_filters=True,
                name="complex_conv",
            )(x)
            windows, bias = pooling.GaussianLowPass(
                in_channels=self.n_filters,
                kernel_size=self.window_size,
                strides=self.stride,
                padding="same",
                param_dtype=self.param_dtype,
                emit_windows=True,
                name="pooling",
            )(x)
            import jax
            out = fused_gabor_sqmod_lowpass(
                x[:, :, 0], bank.astype(x.dtype), windows,
                self.stride, tf_same_padding_1d(self.window_size),
                jax.default_backend() != "tpu")  # interpret off-TPU
            out = out + bias
        else:
            out = convolution.GaborConv1d(
                filters=2 * self.n_filters,
                kernel_size=self.window_size,
                strides=1,
                padding="same",
                initializer=self.initializer,
                use_bias=False,
                sample_rate=self.sample_rate,
                min_freq=self.init_min_freq,
                max_freq=self.init_max_freq,
                param_dtype=self.param_dtype,
                name="complex_conv",
            )(x)
            out = SquaredModulus(name="activation")(out)
            out = out.astype(self.compute_dtype)
            out = pooling.GaussianLowPass(
                in_channels=self.n_filters,
                kernel_size=self.window_size,
                strides=self.stride,
                padding="same",
                param_dtype=self.param_dtype,
                name="pooling",
            )(out)
        out = jnp.maximum(out, 1e-5)
        if self.pcen_compression:
            out = postprocessing.PCENLayer(
                in_channels=self.n_filters,
                alpha=0.96,
                smooth_coef=0.04,
                delta=2.0,
                root=2.0,
                floor=1e-12,
                trainable=True,
                learn_smooth_coef=True,
                per_channel_smooth_coef=True,
                param_dtype=self.param_dtype,
                name="compression",
            )(out)
        if self.mean_var_norm:
            mean = jnp.mean(out, axis=1, keepdims=True)
            var = jnp.var(out, axis=1, keepdims=True)
            out = (out - mean) * lax.rsqrt(var + 1e-6)
        return out

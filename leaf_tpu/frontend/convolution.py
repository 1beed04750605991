"""Learnable complex Gabor filterbank as a real 1-D convolution.

TPU-first design: the module holds only the (F, 2) (μ, σ) parameters; the
(2F, K) real filter bank is regenerated *inside the jitted step* every forward
pass, after clamping by :class:`GaborConstraint` — so the constraint
participates in autodiff exactly like the reference's constraint-in-forward
(reference: leaf_pytorch/convolution.py:73-76). The convolution itself runs
channels-last (NWC) through ``lax.conv_general_dilated``, which XLA maps onto
the MXU; an optional Pallas fused conv+squared-modulus kernel lives in
:mod:`leaf_tpu.ops.gabor_conv`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Union

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from leaf_tpu.frontend import initializers
from leaf_tpu.frontend.impulse_responses import gabor_filters_real_imag
from leaf_tpu.frontend.utils import tf_same_padding_1d

__all__ = ["GaborConstraint", "GaborConv1d", "gabor_constraint"]


def gabor_constraint(kernel_data: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Clamp (F, 2) Gabor params: μ ∈ [0, π], σ ∈ [4√(2ln2)/π, K·√(2ln2)/π].

    Parity: reference leaf_pytorch/convolution.py:10-22.
    """
    sqrt_2log2 = jnp.sqrt(2.0 * jnp.log(jnp.asarray(2.0, kernel_data.dtype)))
    mu = jnp.clip(kernel_data[:, 0], 0.0, math.pi)
    sigma = jnp.clip(
        kernel_data[:, 1],
        4.0 * sqrt_2log2 / math.pi,
        kernel_size * sqrt_2log2 / math.pi,
    )
    return jnp.stack([mu, sigma], axis=1)


class GaborConstraint(nn.Module):
    """Module wrapper around :func:`gabor_constraint` (API parity)."""

    kernel_size: int

    @nn.compact
    def __call__(self, kernel_data):
        return gabor_constraint(kernel_data, self.kernel_size)


class GaborConv1d(nn.Module):
    """Complex Gabor filterbank applied as a real conv1d, channels-last.

    Input ``(B, T, 1)`` → output ``(B, T', 2F)`` where the first F output
    channels are the real parts and the last F the imaginary parts (the
    reference interleaves them instead, reference: convolution.py:88-90 —
    irrelevant after the squared modulus, which pairs them back up).

    Attributes mirror reference ``GaborConv1d`` (convolution.py:25-99);
    ``sort_filters`` is unsupported there too.
    """

    filters: int  # 2 * n_filters
    kernel_size: int
    strides: int = 1
    padding: Union[str, tuple] = "same"
    initializer: Union[str, Callable] = "default"
    use_bias: bool = False
    sample_rate: int = 16000
    min_freq: float = 60.0
    max_freq: float = 7800.0
    param_dtype: Any = jnp.float32
    # emit the generated (K, 2F) filter bank instead of convolving — used by
    # the fused Pallas path (leaf_tpu.ops); the param tree is identical.
    emit_filters: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_filters = self.filters // 2
        init_fn = initializers.make_initializer(
            self.initializer,
            window_len=self.kernel_size,
            sample_rate=self.sample_rate,
            min_freq=self.min_freq,
            max_freq=self.max_freq,
        )
        kernel_params = self.param("kernel", init_fn, (n_filters, 2), self.param_dtype)

        constrained = gabor_constraint(kernel_params, self.kernel_size)
        real_f, imag_f = gabor_filters_real_imag(constrained, self.kernel_size)
        # (K, 1, 2F) kernel: [real bank | imag bank] along the output-channel axis.
        bank = jnp.concatenate([real_f, imag_f], axis=0)  # (2F, K)
        if self.emit_filters:
            return bank.T  # (K, 2F)
        kernel = bank.T[:, None, :]  # (K, 1, 2F)

        if isinstance(self.padding, str) and self.padding.lower() == "same":
            pad = tf_same_padding_1d(self.kernel_size)
        else:
            pad = self.padding
        # Runs in x.dtype (bf16 under Leaf's compute_dtype): the TPU MXU
        # accumulates bf16 dots in f32 internally and only the OUTPUT is
        # rounded, so bf16 here halves HBM traffic at full accumulator
        # precision. (An explicit preferred_element_type=f32 would be
        # cleaner still, but lax.conv's transpose rule rejects the
        # mixed-dtype cotangent it produces.)
        out = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.strides,),
            padding=(pad,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.ones, (self.filters,), self.param_dtype)
            out = out + bias
        return out

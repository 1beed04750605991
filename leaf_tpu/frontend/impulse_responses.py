"""Gabor and Gaussian-lowpass impulse responses, in pure jax.numpy.

TPU-first notes
---------------
- We use native XLA complex arithmetic for the Gabor impulse response. The
  reference carries a hand-rolled "(…, 2) real/imag" duplicate of the same
  math (reference: leaf_pytorch/impulse_responses.py:19-63) purely to dodge a
  2021 torch-xla complex64 bug; inspection shows the two paths are numerically
  identical (the "legacy" path's real exponent is always zero, exactly like
  ``exp(i·μt)``), so one implementation serves both and the
  ``use_legacy_complex`` config flag becomes a no-op kept for config parity.
- Everything here is shape-static and trace-friendly: these functions run
  inside the jitted train step every iteration (filters are re-generated from
  the learnable (μ, σ) parameters each forward pass, like the reference's
  constraint-in-forward design, reference: leaf_pytorch/convolution.py:73-76).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["gabor_impulse_response", "gabor_filters", "gaussian_lowpass"]


def gabor_impulse_response(t: jnp.ndarray, center: jnp.ndarray, fwhm: jnp.ndarray) -> jnp.ndarray:
    """Complex Gabor impulse responses.

    ``h_c(t) = 1/(sqrt(2π)·σ_c) · exp(i·μ_c·t) · exp(-t² / (2σ_c²))``

    Args:
      t: (K,) time support (samples, centred on 0).
      center: (F,) center frequencies μ in radians/sample.
      fwhm: (F,) bandwidth parameters σ (in samples).

    Returns:
      complex64 array of shape (F, K).

    Parity: reference leaf_pytorch/impulse_responses.py:5-16.
    """
    denominator = 1.0 / (jnp.sqrt(2.0 * math.pi) * fwhm)  # (F,)
    gaussian = jnp.exp(jnp.outer(1.0 / (2.0 * fwhm**2), -(t**2)))  # (F, K)
    sinusoid = jnp.exp(1j * jnp.outer(center, t).astype(jnp.complex64))  # (F, K)
    return denominator[:, None].astype(jnp.complex64) * sinusoid * gaussian.astype(jnp.complex64)


def gabor_filters(kernel: jnp.ndarray, size: int = 401) -> jnp.ndarray:
    """Build (F, size) complex Gabor filters from (F, 2) (μ, σ) parameters.

    Time support is ``arange(-(size//2), (size+1)//2)`` — for odd ``size``
    symmetric about 0 (reference: leaf_pytorch/impulse_responses.py:66-71).
    """
    t = jnp.arange(-(size // 2), (size + 1) // 2, dtype=kernel.dtype)
    return gabor_impulse_response(t, center=kernel[:, 0], fwhm=kernel[:, 1])


def gabor_filters_real_imag(kernel: jnp.ndarray, size: int = 401) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imaginary Gabor filter parts without complex dtype round-trips.

    Equivalent to splitting :func:`gabor_filters` into real and imaginary
    parts, but computed directly with cos/sin so the whole filter generation
    stays in float32 — friendlier to XLA fusion on TPU and required inside
    Pallas kernels (no complex support).

    Returns:
      (real, imag), each (F, size), float32.
    """
    t = jnp.arange(-(size // 2), (size + 1) // 2, dtype=kernel.dtype)
    center, fwhm = kernel[:, 0], kernel[:, 1]
    envelope = (1.0 / (jnp.sqrt(2.0 * math.pi) * fwhm))[:, None] * jnp.exp(
        jnp.outer(1.0 / (2.0 * fwhm**2), -(t**2))
    )  # (F, K)
    phase = jnp.outer(center, t)  # (F, K)
    return envelope * jnp.cos(phase), envelope * jnp.sin(phase)


def gaussian_lowpass(sigma: jnp.ndarray, filter_size: int) -> jnp.ndarray:
    """Per-channel Gaussian lowpass windows.

    Args:
      sigma: (C,) learnable widths; clamped to ``[2/filter_size, 0.5]``.
      filter_size: window length K.

    Returns:
      (C, K) float windows ``exp(-0.5·((t - (K-1)/2) / (σ·(K-1)/2))²)``.

    Parity: reference leaf_pytorch/impulse_responses.py:74-80 (which keeps a
    (1, K, C, 1) layout; we use the natural (C, K)).
    """
    sigma = jnp.clip(sigma, 2.0 / filter_size, 0.5)
    t = jnp.arange(filter_size, dtype=sigma.dtype)
    numerator = t[None, :] - 0.5 * (filter_size - 1)
    denominator = sigma[:, None] * 0.5 * (filter_size - 1)
    return jnp.exp(-0.5 * (numerator / denominator) ** 2)

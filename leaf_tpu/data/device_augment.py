"""On-device waveform augmentation — the TPU-native half of the transform
pipeline.

The reference runs every augment per-sample on the host through
torch_audiomentations (reference: raw_transforms.py:299-345), which caps the
input pipeline at O(100s) clips/s/process — far below one TPU chip's ~10k
clips/s train step. Here the elementwise augments (random gain, Gaussian
noise, peak normalization) run INSIDE the jitted train step on the already
fixed-shape batch: same distributions, negligible device cost, and the host
loader only decodes + crops.

Distribution parity with ``leaf_supervised_transforms(train=True)``
(reference: raw_transforms.py:398-416):
  - RandomGain: with p=0.5 per sample, gain_db ~ U[-18, 6]
    (torch_audiomentations.Gain defaults; note the reference wraps
    RandomGain — whose internal Gain already has p=0.5 — in
    UseWithProb(0.5), so the effective apply-probability is 0.25).
  - AddGaussianNoise: with p=0.5 per sample, x + a·N(0,1),
    a ~ U[0.001, 0.015].
  - PeakNormalization(only_too_loud): divide by |x|max iff it exceeds 1.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["leaf_device_augment", "peak_normalize"]


def peak_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T): divide by the per-sample abs peak only when it exceeds 1."""
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return jnp.where(peak > 1.0, x / peak, x)


def leaf_device_augment(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Train-time augments of leaf_supervised_transforms, batched on device.

    x: (B, T) cropped/padded waveforms. Returns same shape.
    """
    b = x.shape[0]
    k_gain_p, k_gain, k_noise_p, k_amp, k_noise = jax.random.split(rng, 5)

    # UseWithProb(0.5) ∘ Gain(p=0.5): effective per-sample probability 0.25
    apply_gain = jax.random.bernoulli(k_gain_p, 0.25, (b, 1))
    gain_db = jax.random.uniform(k_gain, (b, 1), minval=-18.0, maxval=6.0)
    gain = jnp.power(10.0, gain_db / 20.0).astype(x.dtype)
    x = jnp.where(apply_gain, x * gain, x)

    # UseWithProb(0.5) ∘ AddGaussianNoise
    apply_noise = jax.random.bernoulli(k_noise_p, 0.5, (b, 1))
    amp = jax.random.uniform(k_amp, (b, 1), minval=0.001,
                             maxval=0.015).astype(x.dtype)
    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    x = jnp.where(apply_noise, x + amp * noise, x)

    return peak_normalize(x)

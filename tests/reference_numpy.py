"""Independent float64 numpy implementation of the LEAF math, for parity tests.

This is written directly from the LEAF paper / reference behavior description
(SURVEY.md §2.1) as a *separate derivation* — deliberately structured
differently from both the reference and leaf_tpu (e.g. explicit O(T·K) python
convolution loops, float64 throughout) so that agreement is meaningful.
"""

from __future__ import annotations

import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_freqs, f_min, f_max, n_mels, sample_rate):
    """(n_mels, n_freqs) triangular HTK mel filterbank, float64."""
    freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    mel_knots = mel_to_hz(np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2))
    fb = np.zeros((n_mels, n_freqs))
    for m in range(n_mels):
        lo, c, hi = mel_knots[m], mel_knots[m + 1], mel_knots[m + 2]
        for k, f in enumerate(freqs):
            if lo <= f <= c and c > lo:
                fb[m, k] = (f - lo) / (c - lo)
            elif c < f <= hi and hi > c:
                fb[m, k] = (hi - f) / (hi - c)
    return fb


def gabor_params_from_mels(n_filters=40, min_freq=60.0, max_freq=7800.0, sample_rate=16000, n_fft=512):
    fb = np.sqrt(mel_filterbank(n_fft // 2 + 1, min_freq, max_freq, n_filters, sample_rate))
    centers = fb.argmax(axis=1)
    fwhm = np.array(
        [(row >= row.max() / 2.0).sum() for row in fb], dtype=np.float64
    )
    mu = centers * 2.0 * np.pi / n_fft
    sigma = np.sqrt(2.0 * np.log(2.0)) * n_fft / (np.pi * fwhm)
    return np.stack([mu, sigma], axis=1)


def gabor_bank(params, size=401):
    """(F, size) complex Gabor filters, float64/complex128."""
    t = np.arange(-(size // 2), (size + 1) // 2, dtype=np.float64)
    out = np.zeros((params.shape[0], size), dtype=np.complex128)
    for i, (mu, sigma) in enumerate(params):
        env = np.exp(-(t**2) / (2.0 * sigma**2)) / (np.sqrt(2.0 * np.pi) * sigma)
        out[i] = env * np.exp(1j * mu * t)
    return out


def constrain(params, kernel_size):
    c = np.sqrt(2.0 * np.log(2.0))
    mu = np.clip(params[:, 0], 0.0, np.pi)
    sigma = np.clip(params[:, 1], 4.0 * c / np.pi, kernel_size * c / np.pi)
    return np.stack([mu, sigma], axis=1)


def same_pad_conv(x, h, stride):
    """Cross-correlate 1-D ``x`` with taps ``h`` under TF SAME padding.

    x: (T,), h: (K,). Returns (ceil(T/stride),) for stride dividing into T.
    """
    k = len(h)
    half = k // 2
    left = half + (k - 2 * half) - 1
    xp = np.concatenate([np.zeros(left), x, np.zeros(half)])
    n_out = (len(xp) - k) // stride + 1
    return np.array([np.dot(xp[i * stride : i * stride + k], h) for i in range(n_out)])


def leaf_forward(x, gabor_params, lowpass_sigma, pcen, sample_rate=16000, window=401, stride=160):
    """Full LEAF forward for one clip, float64.

    x: (T,) waveform. gabor_params: (F, 2) *unconstrained*. lowpass_sigma: (F,).
    pcen: dict(alpha, delta, root, smooth, floor) arrays of (F,).
    Returns (T', F).
    """
    params = constrain(gabor_params, window)
    bank = gabor_bank(params, window)
    n_f = bank.shape[0]

    # Gabor conv (stride 1) + squared modulus.
    energies = np.zeros((len(x), n_f))
    for f in range(n_f):
        re = same_pad_conv(x, bank[f].real, 1)
        im = same_pad_conv(x, bank[f].imag, 1)
        energies[:, f] = re**2 + im**2

    # Gaussian lowpass, stride = hop.
    sig = np.clip(lowpass_sigma, 2.0 / window, 0.5)
    t = np.arange(window, dtype=np.float64)
    pooled_cols = []
    for f in range(n_f):
        win = np.exp(-0.5 * ((t - 0.5 * (window - 1)) / (sig[f] * 0.5 * (window - 1))) ** 2)
        pooled_cols.append(same_pad_conv(energies[:, f], win, stride) + 1.0)  # bias init 1
    pooled = np.stack(pooled_cols, axis=1)

    pooled = np.maximum(pooled, 1e-5)

    # sPCEN.
    alpha = np.minimum(pcen["alpha"], 1.0)
    root = np.maximum(pcen["root"], 1.0)
    delta, floor = pcen["delta"], pcen["floor"]
    w = np.clip(pcen["smooth"], 0.0, 1.0)
    ema = np.zeros_like(pooled)
    ema[0] = pooled[0]
    for tt in range(1, pooled.shape[0]):
        ema[tt] = w * pooled[tt] + (1.0 - w) * ema[tt - 1]
    one_over_root = 1.0 / root
    return (pooled / (floor + ema) ** alpha + delta) ** one_over_root - delta**one_over_root

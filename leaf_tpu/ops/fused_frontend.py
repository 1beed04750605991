"""Fused Gabor-conv → squared-modulus → Gaussian-lowpass Pallas TPU kernel.

Why: at LEAF shapes (B=256, T=16000, 2F=80) the XLA pipeline materializes
the conv output (B, T, 2F) and the squared modulus (B, T, F) in HBM —
~20 GB of traffic per fwd+bwd, which dominates the step (measured 29 ms
vs a 12.3 ms HLO optimum on v5e). This kernel keeps everything tile-local
in VMEM and writes only per-tile lowpass partial sums, turning the stage
from bandwidth-bound into MXU-bound.

How (forward), per grid step (batch-tile i, position-block m):
  1. Read the unfolded waveform slab X[m] = xp[·, 128m : 128m+528].
  2. Block-Toeplitz conv, real and imaginary banks separately:
     OUT_re[b, r·P + p] = Σ_u X[b,u] · T_re[u, r·P + p]
     with T_re[u, r·P + p] = G_re[u−r, p] (zero outside [0, 401)), built in
     XLA from the (401, P) bank — MXU matmuls (Bt, 528) @ (528, 128·P)
     with f32 accumulation. 528/401 → 1.32× FLOP overhead for perfectly
     MXU-shaped work; T stays VMEM-resident across the whole grid (its
     index_map is pinned to block 0). Keeping the (position r, pair p)
     layout FLAT avoids Mosaic-unsupported lane-splitting reshapes.
  3. Squared modulus in-register: S = OUT_re² + OUT_im² (f32, flat).
  4. For the ≤4 lowpass frames whose 401-tap window intersects this block,
     the windowed reduction over r is a matmul with a masked selector:
     contrib = S @ (onehot_p ⊙ w_flat), emitting partials (Bt, 4, P) —
     combined with one segment_sum in XLA.

Backward (custom VJP) saves nothing but the inputs: per tile it recomputes
OUT/S, folds the output cotangent through the transposed lowpass (d_S),
forms d_OUT = 2·OUT·d_S, and accumulates into VMEM-resident buffers
  dT_re/im += Xᵀ @ d_OUT_re/im   (MXU)
  dW_flat  += Σ_b S·d_out        (VPU, pl.ds accumulation)
after which XLA folds the Toeplitz-structured dT back to dG by diagonal
sums. The waveform gradient is NOT produced (the frontend input is the raw
waveform; with a preceding preemphasis layer use the XLA path instead).

Channel grouping bounds VMEM: the forward runs the F=40 pairs in groups of
16, the backward in groups of 8 (its f32 dT accumulators are 528·128·P) —
both at full 128-row MXU batch tiles thanks to the mod-16 offset alignment
described at ``_WMARGIN``.

Capability parity: this op computes exactly
GaussianLowPass(SquaredModulus(GaborConv1d(x))) of the reference
(leaf_pytorch/frontend.py:78-84) for stride-1 SAME conv + strided SAME
pooling; parity is enforced against the XLA path in tests/test_ops.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_gabor_sqmod_lowpass", "lowpass_frames_out"]

_POS_BLOCK = 128             # conv output positions per grid step
_KMAX = 401                  # kernel taps (static for LEAF: 25 ms @ 16 kHz)
_SLAB = 528                  # _POS_BLOCK + 400, lane-aligned
_FRAMES_PER_BLOCK = 4        # ceil((128 + 401) / 160) + boundary slack
# Window tap-axis padding margin: slot offsets range over
# off = 128m − stride·fr + pad_l for the 4 candidate frames of a block —
# within [−280, 360] for LEAF geometry (asserted in tests). Margin choice:
# off ≡ 8 (mod 16) ALWAYS (128m ≡ 0, 160fr ≡ 0, 200 ≡ 8 mod 16), so a
# margin ≡ 8 (mod 16) makes (off + margin) a multiple of 16 — then the
# flat lane offset (off+margin)·P is 128-aligned for BOTH P=16 (forward
# groups) and P=8 (backward groups, which need small P to fit their f32
# dT accumulators in VMEM at full 128-row MXU batch tiles).
_WMARGIN = 392
_WPAD = _WMARGIN + _SLAB + _WMARGIN  # padded window length (taps axis)


def lowpass_frames_out(t: int, stride: int, k: int,
                       pad: Tuple[int, int]) -> int:
    return (t + pad[0] + pad[1] - k) // stride + 1


def _toeplitz_weights(bank: jnp.ndarray, dtype) -> jnp.ndarray:
    """(K, P) filters → block-Toeplitz (SLAB, 128·P): T[u, r·P+p]=G[u−r, p]."""
    k, p = bank.shape
    u = np.arange(_SLAB)[:, None]
    r = np.arange(_POS_BLOCK)[None, :]
    delta = u - r
    valid = (delta >= 0) & (delta < k)
    idx = np.clip(delta, 0, k - 1)
    t = jnp.where(jnp.asarray(valid)[:, :, None],
                  bank[jnp.asarray(idx)], 0.0)  # (SLAB, 128, P)
    return t.reshape(_SLAB, _POS_BLOCK * p).astype(dtype)


def _fold_toeplitz_grad(d_t: jnp.ndarray, k: int, p: int) -> jnp.ndarray:
    """(SLAB, 128·P) Toeplitz cotangent → (K, P) by summing r-diagonals."""
    d_t = d_t.reshape(_SLAB, _POS_BLOCK, p)
    q = jnp.arange(k)[:, None] + jnp.arange(_POS_BLOCK)[None, :]  # (K, 128)
    gathered = d_t[q, jnp.arange(_POS_BLOCK)[None, :], :]  # (K, 128, P)
    return gathered.sum(axis=1)


def _flat_windows(windows: jnp.ndarray) -> jnp.ndarray:
    """(P, K) lowpass windows → (1, WPAD·P) flat-padded:
    wf[0, (k+_WMARGIN)·P + p] = W[p, k]."""
    p, k = windows.shape
    wf = jnp.zeros((_WPAD, p), jnp.float32)
    wf = jax.lax.dynamic_update_slice(
        wf, windows.T.astype(jnp.float32), (_WMARGIN, 0))
    return wf.reshape(1, _WPAD * p)


def _unfold(xp: jnp.ndarray, m_blocks: int) -> jnp.ndarray:
    """(B, Tp) → (M, B, SLAB) overlapping slabs at stride 128 (XLA gather;
    ~4× the waveform bytes, still ≪ the intermediates this kernel kills).
    M leads so Pallas blocks keep (B, SLAB) as the last two dims."""
    idx = (np.arange(m_blocks)[:, None] * _POS_BLOCK
           + np.arange(_SLAB)[None, :])
    return xp[:, jnp.asarray(idx)].swapaxes(0, 1)


def _frame_min(m, stride: int, pad_l: int):
    base = m * _POS_BLOCK
    return jnp.maximum((base + pad_l - _KMAX) // stride + 1, 0)


def _frame_min_np(m_blocks: int, stride: int, pad_l: int) -> np.ndarray:
    base = np.arange(m_blocks) * _POS_BLOCK
    return np.maximum((base + pad_l - _KMAX) // stride + 1, 0)


def _pair_onehot(n_pairs: int) -> jnp.ndarray:
    """(128·P, P) selector: onehot[r·P + p, p'] = δ_{p,p'} (static)."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (_POS_BLOCK * n_pairs, n_pairs), 0)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (_POS_BLOCK * n_pairs, n_pairs), 1)
    return (rows % n_pairs == cols).astype(jnp.float32)


def _pos_mask_flat(m, t_len: int, n_pairs: int) -> jnp.ndarray:
    """(1, 128·P) mask: position base+r < t_len (lowpass SAME padding)."""
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, _POS_BLOCK * n_pairs), 1)
    pos = m * _POS_BLOCK + lane // n_pairs
    return (pos < t_len).astype(jnp.float32)


def _fwd_kernel(x_ref, tre_ref, tim_ref, wf_ref, out_ref, *, n_pairs: int,
                t_len: int, stride: int, pad_l: int, n_frames: int):
    m = pl.program_id(1)
    x = x_ref[0]                                  # (Bt, SLAB)
    out_re = jnp.dot(x, tre_ref[:], preferred_element_type=jnp.float32)
    out_im = jnp.dot(x, tim_ref[:], preferred_element_type=jnp.float32)
    s = out_re * out_re + out_im * out_im         # (Bt, 128·P) flat
    s = s * _pos_mask_flat(m, t_len, n_pairs)

    onehot = _pair_onehot(n_pairs)                # (128·P, P)
    fr_min = _frame_min(m, stride, pad_l)
    np_ = n_pairs
    for j in range(_FRAMES_PER_BLOCK):
        fr = fr_min + j
        off = m * _POS_BLOCK - (fr * stride - pad_l)  # tap at r=0
        # provably 128-aligned for P=16 (every off term divisible by 8);
        # Mosaic's analysis can't see through //+maximum, so hint it.
        start = pl.multiple_of((off + _WMARGIN) * np_, 128)
        wf = wf_ref[:, pl.ds(start, _POS_BLOCK * np_)]
        valid = jnp.logical_and(fr >= 0, fr < n_frames)
        sel = onehot * wf.reshape(_POS_BLOCK * np_, 1)
        contrib = jnp.dot(s, sel, preferred_element_type=jnp.float32)
        out_ref[:, 0, j, :] = jnp.where(valid, contrib, 0.0)


def _run_fwd_group(xs, bank_re, bank_im, windows_g, t_len, stride, pad_l,
                   n_frames, interpret):
    m_blocks, b, _ = xs.shape
    n_pairs = bank_re.shape[1]
    bt = b if b <= 128 else 128
    assert b % bt == 0, f"batch {b} not a multiple of tile {bt}"

    t_re = _toeplitz_weights(bank_re, xs.dtype)
    t_im = _toeplitz_weights(bank_im, xs.dtype)
    wf = _flat_windows(windows_g)

    kern = functools.partial(
        _fwd_kernel, n_pairs=n_pairs, t_len=t_len, stride=stride,
        pad_l=pad_l, n_frames=n_frames)
    return pl.pallas_call(
        kern,
        grid=(b // bt, m_blocks),
        in_specs=[
            pl.BlockSpec((1, bt, _SLAB), lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, _POS_BLOCK * n_pairs),
                         lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB, _POS_BLOCK * n_pairs),
                         lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WPAD * n_pairs), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, 1, _FRAMES_PER_BLOCK, n_pairs),
            lambda i, m: (i, m, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, m_blocks, _FRAMES_PER_BLOCK, n_pairs), jnp.float32),
        interpret=interpret,
    )(xs, t_re, t_im, wf)


def _combine_partials(part, m_blocks, stride, pad_l, n_frames):
    """(B, M, 4, P) slot partials → (B, n_frames, P) via one segment_sum."""
    b = part.shape[0]
    n_pairs = part.shape[-1]
    fr_ids = (_frame_min_np(m_blocks, stride, pad_l)[:, None]
              + np.arange(_FRAMES_PER_BLOCK)[None, :])
    fr_ids = np.where(fr_ids < n_frames, fr_ids, n_frames)  # overflow bin
    seg = jax.ops.segment_sum(
        part.reshape(b, m_blocks * _FRAMES_PER_BLOCK, n_pairs).swapaxes(0, 1),
        jnp.asarray(fr_ids.reshape(-1)),
        num_segments=n_frames + 1)
    return seg[:n_frames].swapaxes(0, 1)


# --------------------------------------------------------------- backward

def _bwd_kernel(x_ref, tre_ref, tim_ref, wf_ref, dout_ref,
                dtre_ref, dtim_ref, dwf_ref, *, n_pairs: int, t_len: int,
                stride: int, pad_l: int, n_frames: int):
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, m == 0))
    def _():
        dtre_ref[:] = jnp.zeros_like(dtre_ref)
        dtim_ref[:] = jnp.zeros_like(dtim_ref)
        dwf_ref[:] = jnp.zeros_like(dwf_ref)

    x = x_ref[0]
    out_re = jnp.dot(x, tre_ref[:], preferred_element_type=jnp.float32)
    out_im = jnp.dot(x, tim_ref[:], preferred_element_type=jnp.float32)
    s = out_re * out_re + out_im * out_im
    mask = _pos_mask_flat(m, t_len, n_pairs)
    s = s * mask

    onehot = _pair_onehot(n_pairs)                # (128·P, P)
    fr_min = _frame_min(m, stride, pad_l)
    np_ = n_pairs
    bt = x.shape[0]
    d_s = jnp.zeros((bt, _POS_BLOCK * np_), jnp.float32)
    for j in range(_FRAMES_PER_BLOCK):
        fr = fr_min + j
        off = m * _POS_BLOCK - (fr * stride - pad_l)
        start = pl.multiple_of((off + _WMARGIN) * np_, 128)
        wf = wf_ref[:, pl.ds(start, _POS_BLOCK * np_)]  # (1, 128·P)
        valid = jnp.logical_and(fr >= 0, fr < n_frames)
        dof = jnp.where(valid, dout_ref[:, 0, j, :], 0.0)  # (Bt, P)
        # broadcast frame cotangent to flat positions: dof_flat[b, r·P+p]
        dof_flat = jnp.dot(dof, onehot.T,
                           preferred_element_type=jnp.float32)
        d_s = d_s + dof_flat * wf
        # dW_flat[(off+128+r)·P + p] += Σ_b S·dof
        dw_contrib = jnp.sum(s * dof_flat, axis=0, keepdims=True)
        cur = dwf_ref[:, pl.ds(start, _POS_BLOCK * np_)]
        dwf_ref[:, pl.ds(start, _POS_BLOCK * np_)] = cur + dw_contrib

    d_s = d_s * mask
    d_re = 2.0 * out_re * d_s
    d_im = 2.0 * out_im * d_s
    xt = x.astype(jnp.float32).T
    dtre_ref[:] += jnp.dot(xt, d_re, preferred_element_type=jnp.float32)
    dtim_ref[:] += jnp.dot(xt, d_im, preferred_element_type=jnp.float32)


_BWD_PAIR_GROUP = 8  # small P → small f32 dT accumulators → bt=128 fits


def _run_bwd_group(xs, bank_re, bank_im, windows_g, d_pad_g, t_len, stride,
                   pad_l, n_frames, interpret):
    m_blocks, b, _ = xs.shape
    k = bank_re.shape[0]
    n_pairs = bank_re.shape[1]
    bt = b if b <= 128 else 128

    t_re = _toeplitz_weights(bank_re, xs.dtype)
    t_im = _toeplitz_weights(bank_im, xs.dtype)
    wf = _flat_windows(windows_g)

    kern = functools.partial(
        _bwd_kernel, n_pairs=n_pairs, t_len=t_len, stride=stride,
        pad_l=pad_l, n_frames=n_frames)
    big = (_SLAB, _POS_BLOCK * n_pairs)
    dtre, dtim, dwf = pl.pallas_call(
        kern,
        grid=(b // bt, m_blocks),
        in_specs=[
            pl.BlockSpec((1, bt, _SLAB), lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(big, lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(big, lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WPAD * n_pairs), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, _FRAMES_PER_BLOCK, n_pairs),
                         lambda i, m: (i, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(big, lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(big, lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WPAD * n_pairs), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(big, jnp.float32),
            jax.ShapeDtypeStruct(big, jnp.float32),
            jax.ShapeDtypeStruct((1, _WPAD * n_pairs), jnp.float32),
        ],
        interpret=interpret,
    )(xs, t_re, t_im, wf, d_pad_g)

    d_re = _fold_toeplitz_grad(dtre, k, n_pairs)
    d_im = _fold_toeplitz_grad(dtim, k, n_pairs)
    # unflatten dW: dwf[0, (k+_WMARGIN)·P + p] → (P, K)
    d_win = dwf.reshape(_WPAD, n_pairs)[_WMARGIN:_WMARGIN + k].T
    return d_re, d_im, d_win


# ------------------------------------------------------------- public API

def _prep(x, pad):
    b, t = x.shape
    xp = jnp.pad(x, ((0, 0), (pad[0], pad[1])))
    m_blocks = -(-t // _POS_BLOCK)
    need = m_blocks * _POS_BLOCK + (_SLAB - _POS_BLOCK)
    if need > xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
    return _unfold(xp, m_blocks), t, m_blocks


# Pair-group size MUST divide every dynamic lane offset into a multiple of
# 128: offsets are (off + 128)·P with off = 128m − stride·fr + pad_l, all
# terms divisible by 8 — P=16 makes 16·off a multiple of 128 STATICALLY
# (Mosaic must prove alignment at compile time; P=20 fails on pad_l·P).
_PAIR_GROUP = 16


def _split_pairs(gabor, windows, pairs_per_group):
    """Split (and zero-pad) the F pairs into groups of exactly
    ``pairs_per_group``; zero channels produce zero outputs/grads."""
    k, c = gabor.shape
    f = c // 2
    groups = []
    for g0 in range(0, f, pairs_per_group):
        g1 = min(g0 + pairs_per_group, f)
        b_re = gabor[:, g0:g1]
        b_im = gabor[:, f + g0:f + g1]
        win = windows[g0:g1]
        pad_n = pairs_per_group - (g1 - g0)
        if pad_n:
            b_re = jnp.pad(b_re, ((0, 0), (0, pad_n)))
            b_im = jnp.pad(b_im, ((0, 0), (0, pad_n)))
            win = jnp.pad(win, ((0, pad_n), (0, 0)))
        groups.append((b_re, b_im, win, (g0, g1)))
    return groups


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_gabor_sqmod_lowpass(x, gabor, windows, stride: int = 160,
                              pad: Tuple[int, int] = (200, 200),
                              interpret: bool = False):
    """LEAF hot path, fused: waveform → lowpass-pooled energies.

    Args:
      x: (B, T) waveform. NO gradient is produced for x (raw-input only —
         use the XLA path when a preemphasis layer precedes this op).
      gabor: (K=401, 2F) [real | imag] Gabor filter bank (differentiable).
      windows: (F, K) per-channel lowpass windows (differentiable).
      stride/pad: lowpass hop and TF-SAME padding (the conv is stride 1
         with the same padding — reference: leaf_pytorch/frontend.py:78-84).

    Returns (B, n_frames, F) float32, n_frames = (T+pl+pr−K)//stride + 1.
    """
    out, _ = _fused_fwd(x, gabor, windows, stride, pad, interpret)
    return out


def _check_geometry(gabor, stride, pad):
    # The slot count (_FRAMES_PER_BLOCK), window margins (_WMARGIN) and the
    # mod-16 lane-alignment proof are all derived for the LEAF default
    # geometry; any other hop/padding must use the XLA path (Leaf gates on
    # this automatically via _fused_applicable).
    if gabor.shape[0] != _KMAX or stride != 160 or tuple(pad) != (200, 200):
        raise ValueError(
            "fused_gabor_sqmod_lowpass is specialized to K=401 taps, "
            f"stride=160, pad=(200,200); got K={gabor.shape[0]}, "
            f"stride={stride}, pad={tuple(pad)}")


def _fused_fwd(x, gabor, windows, stride, pad, interpret):
    _check_geometry(gabor, stride, pad)
    xs, t, m_blocks = _prep(x, pad)
    n_frames = lowpass_frames_out(t, stride, gabor.shape[0], pad)
    f = gabor.shape[1] // 2
    outs = []
    for b_re, b_im, win_g, (g0, g1) in _split_pairs(gabor, windows,
                                                    _PAIR_GROUP):
        part = _run_fwd_group(xs, b_re, b_im, win_g, t, stride, pad[0],
                              n_frames, interpret)
        outs.append(_combine_partials(part, m_blocks, stride, pad[0],
                                      n_frames)[..., :g1 - g0])
    out = jnp.concatenate(outs, axis=-1)
    return out, (x, gabor, windows)


def _fused_bwd(stride, pad, interpret, res, d_out):
    x, gabor, windows = res
    xs, t, m_blocks = _prep(x, pad)
    k, c = gabor.shape
    n_frames = lowpass_frames_out(t, stride, k, pad)

    fr_ids = (_frame_min_np(m_blocks, stride, pad[0])[:, None]
              + np.arange(_FRAMES_PER_BLOCK)[None, :])
    fr_safe = np.where(fr_ids < n_frames, fr_ids, 0)
    mask = jnp.asarray((fr_ids < n_frames)[None, :, :, None])
    d_out = d_out.astype(jnp.float32)

    d_res, d_ims, d_wins = [], [], []
    for b_re, b_im, win_g, (g0, g1) in _split_pairs(gabor, windows,
                                                    _BWD_PAIR_GROUP):
        d_g = d_out[:, :, g0:g1]
        if g1 - g0 < _BWD_PAIR_GROUP:
            d_g = jnp.pad(d_g, ((0, 0), (0, 0),
                                (0, _BWD_PAIR_GROUP - (g1 - g0))))
        d_pad = d_g[:, jnp.asarray(fr_safe.reshape(-1)), :].reshape(
            d_out.shape[0], m_blocks, _FRAMES_PER_BLOCK, _BWD_PAIR_GROUP)
        d_pad = jnp.where(mask, d_pad, 0.0)
        dr, di, dw = _run_bwd_group(xs, b_re, b_im, win_g, d_pad, t, stride,
                                    pad[0], n_frames, interpret)
        d_res.append(dr[:, :g1 - g0])
        d_ims.append(di[:, :g1 - g0])
        d_wins.append(dw[:g1 - g0])
    d_gabor = jnp.concatenate(
        [jnp.concatenate(d_res, axis=1), jnp.concatenate(d_ims, axis=1)],
        axis=1).astype(gabor.dtype)
    d_windows = jnp.concatenate(d_wins, axis=0).astype(windows.dtype)
    return jnp.zeros_like(x), d_gabor, d_windows


fused_gabor_sqmod_lowpass.defvjp(_fused_fwd, _fused_bwd)

"""Fused Gabor-conv → squared-modulus → Gaussian-lowpass Pallas TPU kernel.

Why: at LEAF shapes (B=256, T=16000, 2F=80) the XLA pipeline materializes
the conv output (B, T, 2F) and the squared modulus (B, T, F) in HBM —
~20 GB of traffic per fwd+bwd, which dominates the step (measured 29 ms
vs a 12.3 ms HLO optimum on v5e). This kernel keeps everything tile-local
in VMEM and writes only per-tile lowpass partial sums, turning the stage
from bandwidth-bound into MXU-bound.

How (forward), per grid step (batch-tile i, position-block m):
  1. Read the waveform slab X[m] = xp[·, 128m : 128m+640] DIRECTLY as
     _X_CHUNKS=5 shifted 128-tiles of the padded waveform (BlockSpecs
     indexed (i, m+δ)) — no unfold gather, no (M, B, SLAB) HBM slabs.
  2. Block-Toeplitz conv, real and imaginary banks separately:
     OUT_re[b, r·P + p] = Σ_u X[b,u] · T_re[u, r·P + p]
     with T_re[u, r·P + p] = G_re[u−r, p] (zero outside [0, 401)), built in
     XLA from the (401, P) bank — chunks 0-3 are full K=128 MXU dots
     (Bt, 128) @ (T rows δ·128.., 128·P) with f32 accumulation; chunk 4
     reaches only the bands of positions r ≥ _TAIL_POS=112, so its dot is
     narrowed to those N = 16·P lanes (4P + P/8 passes vs the naive 5P,
     −17.5%; same trim in the backward's recompute and dT accumulation).
     T is padded to _SLAB_PAD=640 zero rows so the tail dot's overhang
     rows contribute nothing. T stays VMEM-resident across the whole grid
     (its index_map is pinned to block 0). Keeping the (position r,
     pair p) layout FLAT avoids Mosaic-unsupported lane-splitting
     reshapes.
  3. Squared modulus in-register: S = OUT_re² + OUT_im² (f32, flat).
  4. For the ≤4 lowpass frames whose 401-tap window intersects this block,
     the windowed reduction over r is ONE matmul with a masked selector
     batching all 4 frame slots: S @ concat_j(onehot_p ⊙ w_flat[off_j]) →
     partials (Bt, 4·P) (N=4P keeps 4× more MXU output lanes busy than
     per-frame N=P dots) — combined with one segment_sum in XLA.

Backward (custom VJP): the VJP-forward SAVES the conv outputs OUT_re/
OUT_im per block at the compute dtype (two extra kernel outputs whose
HBM writes hide under the forward's MXU time), so the backward never
re-runs the banded contraction — the in-kernel recompute was ~45% of its
MXU passes, and dropping the Toeplitz operands from the kernel frees the
VMEM that capped its pair-group at 8. Per tile it reloads OUT, rebuilds
S = OUT_re² + OUT_im² in-register (VPU-cheap), folds the output cotangent
through the transposed lowpass as ONE (Bt, 4P) @ (4P, 128P) dot against a
per-pattern fused selector (pair one-hot ⊙ slot window, see
_build_bwd_selectors; the cotangent block is the group's own slot-major
(M, B, 4P) array, extracted from the shared slot-expanded cotangent by
one exact permutation matmul — see _group_cotangent — so K and the dW
dot's M stay at one MXU tile each for P ≤ 16), forms d_OUT = 2·OUT·d_S,
and accumulates into VMEM-resident buffers
  dT_re/im += Xᵀ @ d_OUT_re/im                     (MXU)
  dW_q[pattern] += chanfold(d_outᵀ @ S)            (MXU + C-row VPU fold)
after which XLA folds the Toeplitz-structured dT back to dG by diagonal
sums and the q-space dW slab back to taps by 24 static shifted adds. All
cotangent-side matmuls run at the compute dtype (like the dT dots). The
waveform gradient is NOT produced (the frontend input is the raw
waveform; with a preceding preemphasis layer use the XLA path instead).

Channel grouping bounds VMEM: the inference/primal forward runs up to 24
pairs per kernel (LEAF's F=40 → two launches [24, 16], zero padding
waste; see ``_fwd_max_pairs`` for the VMEM accounting). The VJP forward
and the backward share ONE group split at _BWD_PAIR_GROUP=16 pairs
(F=40 → [16, 16, 8]) — the saved OUT blocks keep the kernels' interleaved
flat (position r, pair p) lane layout, which cannot be sub-sliced, so the
two passes must agree; 16 is the largest P whose f32 dT accumulators
(2 × 640·128·P·4 B ≈ 10.5 MB) still fit VMEM now that the backward
carries no Toeplitz operands. All window access rides the period-5 offset
patterns (_SEL_REPS): static per-pattern operands, no dynamic lane
slicing anywhere in either kernel. The block-Toeplitz bank is gathered
ONCE as (SLAB_PAD, 128, 2F) and sliced per forward group; the backward
needs neither it nor the waveform re-fetch beyond the dT dots' X chunks.

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
_SLAB = 528                  # _POS_BLOCK + 400: true Toeplitz band height
_X_CHUNKS = 5                # ceil(_SLAB / 128): waveform tiles per block
_SLAB_PAD = _X_CHUNKS * _POS_BLOCK  # 640: T rows padded so every chunk
#                              dot is a full K=128 tile (rows ≥ _SLAB are
#                              zero in T, so the 5th chunk's overhang
#                              lanes contribute nothing)
_FRAMES_PER_BLOCK = 4        # ceil((128 + 401) / 160) + boundary slack
# Slot window offsets off = 128m − stride·fr + pad_l lie within
# [−280, 392] for LEAF geometry (asserted in tests/test_ops.py
# test_slot_offset_range) and are PERIODIC in m
# (see _SEL_REPS), so both kernels read windows through six static
# per-pattern operands (BlockSpec-indexed) — NO dynamic window slicing
# remains; the former _WMARGIN mod-16 lane-alignment machinery is gone.


def lowpass_frames_out(t: int, stride: int, k: int,
                       pad: Tuple[int, int]) -> int:
    return (t + pad[0] + pad[1] - k) // stride + 1


def _toeplitz_full(bank: jnp.ndarray, dtype) -> jnp.ndarray:
    """(K, C) filters → block-Toeplitz (SLAB_PAD, 128, C): T[u,r,c]=G[u−r,c].

    Built ONCE for all channels (one gather) and sliced per pair-group —
    per-group rebuilds were a measurable share of the op (the gather, not
    the bytes, dominates). The (u, r) leading layout means a channel slice
    + reshape yields the (SLAB_PAD, 128·P) matmul operand with the flat
    (position r, pair p) minor layout the kernels use. Rows ≥ _SLAB
    (the true band height, 528) are zero: the kernels read the waveform
    as _X_CHUNKS shifted 128-tiles; the 5th chunk's narrowed tail dot
    (see _TAIL_POS) reads rows 512-639, whose overhang rows ≥ 528 are
    these zeros.

    Built as 128 static zero-pads stacked along r — XLA lowers that to
    plain strided copies, ~4× cheaper than the equivalent (528·128)-index
    gather formulation (measured: the gather fusion alone was 0.94 ms/step
    at LEAF shape)."""
    k, c = bank.shape
    b = bank.astype(dtype)
    cols = [jnp.pad(b, ((r, _SLAB_PAD - k - r), (0, 0)))
            for r in range(_POS_BLOCK)]
    return jnp.stack(cols, axis=1)  # (SLAB_PAD, 128, C)


def _slice_toeplitz(tfull: jnp.ndarray, g0: int, g1: int,
                    pad_to: int) -> jnp.ndarray:
    """(SLAB_PAD, 128, C) → (SLAB_PAD, 128·P) for channels [g0, g1),
    zero-padded to P=pad_to pairs (zero channels → zero outputs/grads)."""
    t = tfull[:, :, g0:g1]
    if g1 - g0 < pad_to:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad_to - (g1 - g0))))
    return t.reshape(_SLAB_PAD, _POS_BLOCK * pad_to)


def _fold_toeplitz_grad(d_t: jnp.ndarray, k: int) -> jnp.ndarray:
    """(SLAB, 128, C) Toeplitz cotangent → (K, C) by summing r-diagonals.

    Called ONCE on the channel-concatenated cotangents of every backward
    group and both banks. Expressed as 128 static shifted slices summed
    pairwise (a balanced tree keeps the XLA graph shallow) — like the
    forward Toeplitz build, the equivalent one-gather formulation is
    gather-bound and measured ~5× slower than plain strided copies."""
    terms = [d_t[r:r + k, r, :] for r in range(_POS_BLOCK)]  # (K, C) each
    while len(terms) > 1:
        odd = terms.pop() if len(terms) % 2 else None
        it = iter(terms)
        terms = [a + b for a, b in zip(it, it)]
        if odd is not None:
            terms.append(odd)
    return terms[0]


def _x_specs(bt: int):
    """_X_CHUNKS BlockSpecs reading the PADDED waveform (B, Tp) directly:
    chunk δ of grid step (i, m) is xp[i·bt:(i+1)·bt, (m+δ)·128:(m+δ+1)·128].

    This replaces the former XLA unfold gather that materialized
    overlapping (M, B, SLAB) slabs in HBM (0.21 ms/step + a 35 MB
    residual at LEAF shape). Each kernel re-fetches every waveform tile
    ~5× across m, but that DMA (~41 MB/call) hides entirely under the
    MXU-bound kernels, while the gather was a serial XLA op."""
    return [pl.BlockSpec((bt, _POS_BLOCK),
                         lambda i, m, d=d: (i, m + d),
                         memory_space=pltpu.VMEM)
            for d in range(_X_CHUNKS)]


# Positions r ≥ _TAIL_POS are the ONLY ones whose 401-tap band reaches the
# 5th waveform chunk: T[u, r·P+p] = G[u−r] is nonzero for u ≥ 4·128 = 512
# iff r ≥ 512 − 400 = 112. So the 5th chunk's dot needs just the last
# 16 positions' lanes — N = 16·P instead of 128·P — cutting the banded
# contraction from 5P to 4P + P/8 MXU passes (−17.5%). 112·P is a lane
# offset multiple of 128 for every legal P (112 = 7·16, P ≡ 0 mod 8).
_TAIL_POS = 112


def _banded_dot(x_chunks, t_ref, n_pairs):
    """Σ_δ x_δ @ T[δ·128:(δ+1)·128] — the (Bt, SLAB) @ (SLAB, 128·P) slab
    contraction as 4 full K=128 tile dots over all lanes plus one narrow
    N = 16·P tail dot for the 5th chunk (see _TAIL_POS)."""
    acc = None
    for d, xc in enumerate(x_chunks[:-1]):
        part = jnp.dot(xc, t_ref[d * _POS_BLOCK:(d + 1) * _POS_BLOCK, :],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    tl = _TAIL_POS * n_pairs
    tail = jnp.dot(
        x_chunks[-1],
        t_ref[(_X_CHUNKS - 1) * _POS_BLOCK:, tl:],
        preferred_element_type=jnp.float32)
    return jnp.concatenate([acc[:, :tl], acc[:, tl:] + tail], axis=1)


def _frame_min_np(m_blocks: int, stride: int, pad_l: int) -> np.ndarray:
    base = np.arange(m_blocks) * _POS_BLOCK
    return np.maximum((base + pad_l - _KMAX) // stride + 1, 0)


def _pos_mask_flat(m, t_len: int, n_pairs: int) -> jnp.ndarray:
    """(1, 128·P) mask: position base+r < t_len (lowpass SAME padding)."""
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, _POS_BLOCK * n_pairs), 1)
    pos = m * _POS_BLOCK + lane // n_pairs
    return (pos < t_len).astype(jnp.float32)


# The slot window offsets off_j(m) = 128m − stride·(fr_min(m)+j) + pad_l
# are PERIODIC in m with period lcm(128, 160)/128 = 5 (128·5 = 160·4), so
# every block's 4 window-weighted slot selectors are one of 6 static
# patterns: residues m ≡ 1..4, m ≡ 0 (m ≥ 5), and m = 0 (whose fr_min
# clamps at 0). Representative m per pattern index 0..5:
_SEL_REPS = (5, 1, 2, 3, 4, 0)


def _sel_index(m):
    """Pattern index for block m: m=0 → 5, else m % 5."""
    return jnp.where(m == 0, 5, jax.lax.rem(m, 5))


def _slot_taps(m_rep: int, stride: int, pad_l: int, k: int):
    """Static (j, off, lo, hi) per frame slot of pattern-rep block m_rep:
    slot j's window taps off+r cover block positions r ∈ [lo, hi)."""
    fr0 = max((m_rep * _POS_BLOCK + pad_l - k) // stride + 1, 0)
    out = []
    for j in range(_FRAMES_PER_BLOCK):
        off = m_rep * _POS_BLOCK - (fr0 + j) * stride + pad_l
        out.append((j, off, max(0, -off), min(_POS_BLOCK, k - off)))
    return out


def _window_block(w: jnp.ndarray, off: int, lo: int, hi: int) -> jnp.ndarray:
    """(P, K) windows → (128, P) slot block: row r holds W[:, off + r]
    (zero where the tap falls outside [0, K), i.e. r outside [lo, hi))."""
    blk = jnp.zeros((_POS_BLOCK, w.shape[0]), jnp.float32)
    if hi > lo:
        blk = jax.lax.dynamic_update_slice(
            blk, w[:, off + lo:off + hi].T, (lo, 0))
    return blk


def _build_selectors(windows_g: jnp.ndarray, stride: int,
                     pad_l: int) -> jnp.ndarray:
    """(P, K) windows → (6, 128·P, 4·P) fused slot selectors:

    sel[q, r·P + p, j·P + p'] = δ_{p,p'} · W[p, off_j(rep_q) + r]
    (zero where the tap off_j + r falls outside [0, K)).

    This folds the per-slot window row AND the pair one-hot into ONE
    matmul operand, so the forward's windowed reduction is a single
    (Bt, 128P) @ (128P, 4P) dot instead of 4 per-slot (…, P) dots —
    4P → P MXU pass tiles. Built in XLA from static slices (offsets are
    compile-time), where the lane→sublane transpose of the window row is
    cheap — in-kernel it forced a relayout that dominated the forward."""
    p, k = windows_g.shape
    w = windows_g.astype(jnp.float32)
    eye = jnp.eye(p, dtype=jnp.float32)
    sels = []
    for m_rep in _SEL_REPS:
        blocks = []
        for _, off, lo, hi in _slot_taps(m_rep, stride, pad_l, k):
            w_blk = _window_block(w, off, lo, hi)
            # (128, P) window values ⊗ pair one-hot → (128·P, P)
            blocks.append((w_blk[:, :, None] * eye[None]).reshape(
                _POS_BLOCK * p, p))
        sels.append(jnp.concatenate(blocks, axis=1))
    return jnp.stack(sels)


def _build_bwd_selectors(windows_g: jnp.ndarray, stride: int,
                         pad_l: int) -> jnp.ndarray:
    """(P, K) windows → (6, 4·P, 128·P) fused backward selectors:

    bsel[q, j·P + p, r·P + p'] = δ_{p,p'} · W[p, off_j(rep_q) + r]
    (zero where the tap falls outside [0, K)).

    The pair one-hot AND the slot window row fold into ONE matmul
    operand, so the backward's cotangent fold d_S = Σ_j dout_j ⊙ w_j is
    a single (Bt, 4P) @ (4P, 128P) dot over the group's OWN slot-major
    cotangent block (see _group_cotangent): K = 4P = 32 is one MXU
    K-tile, and the dW dot's output M is one sublane tile — the former
    full-channel (Bt, 4C=160) @ (4C, 128P) formulation paid two of each
    (16 of ~164 passes/block)."""
    p, k = windows_g.shape
    w = windows_g.astype(jnp.float32)
    onehot = (jnp.arange(p)[:, None]
              == jnp.arange(_POS_BLOCK * p)[None, :] % p)
    onehot = onehot.astype(jnp.float32)           # (P, 128·P)
    sels = []
    for m_rep in _SEL_REPS:
        segs = [onehot * _window_block(w, off, lo, hi).reshape(
                    1, _POS_BLOCK * p)
                for _, off, lo, hi in _slot_taps(m_rep, stride, pad_l, k)]
        sels.append(jnp.concatenate(segs, axis=0))  # (4·P, 128·P)
    return jnp.stack(sels)


def _fold_bwd_windows(dwf: jnp.ndarray, k: int, stride: int,
                      pad_l: int) -> jnp.ndarray:
    """(6, 1, 4·128·P) q-space dW accumulator → (P, K): 24 static
    shifted-pad adds (one per (pattern, slot)); taps outside [0, K) were
    accumulated into out-of-range slab lanes and are simply dropped."""
    n_pairs = dwf.shape[-1] // (_FRAMES_PER_BLOCK * _POS_BLOCK)
    dwq = dwf.reshape(6, _FRAMES_PER_BLOCK, _POS_BLOCK, n_pairs)
    acc = None
    for qi, m_rep in enumerate(_SEL_REPS):
        for j, off, lo, hi in _slot_taps(m_rep, stride, pad_l, k):
            if hi <= lo:
                continue
            term = jnp.pad(dwq[qi, j, lo:hi],
                           ((off + lo, k - (off + hi)), (0, 0)))
            acc = term if acc is None else acc + term
    return acc.T


def _fwd_kernel(*refs, n_pairs: int, t_len: int, masked: bool,
                save_out: bool):
    if save_out:
        (x0, x1, x2, x3, x4, tre_ref, tim_ref, sel_ref, out_ref,
         outre_ref, outim_ref) = refs
    else:
        (x0, x1, x2, x3, x4, tre_ref, tim_ref, sel_ref, out_ref) = refs
    m = pl.program_id(1)
    xc = [x0[:], x1[:], x2[:], x3[:], x4[:]]      # 5 × (Bt, 128)
    out_re = _banded_dot(xc, tre_ref, n_pairs)
    out_im = _banded_dot(xc, tim_ref, n_pairs)
    if save_out:
        # VJP path: persist the conv outputs at the compute dtype so the
        # backward skips the banded recompute (~45% of its MXU passes).
        # The writes are async block DMA that hides under this kernel's
        # own MXU time. f32 runs save f32 — bit-identical to recompute.
        outre_ref[0] = out_re.astype(outre_ref.dtype)
        outim_ref[0] = out_im.astype(outim_ref.dtype)
    s = out_re * out_re + out_im * out_im         # (Bt, 128·P) flat
    if masked:  # tail positions ≥ t_len exist only when 128 ∤ t_len
        s = s * _pos_mask_flat(m, t_len, n_pairs)
    # Windowed reduction over r for ALL 4 frame slots as ONE matmul with
    # the block's precomputed fused selector (window ⊙ pair-one-hot, see
    # _build_selectors): 4P → P MXU pass tiles vs the former per-slot
    # dots, and no dynamic window slicing — out-of-range taps are zeros
    # by construction, and frames past n_frames land in _combine_partials'
    # segment_sum overflow bin.
    out_ref[0] = jnp.dot(s, sel_ref[0], preferred_element_type=jnp.float32)


def _run_fwd_group(xp, m_blocks, t_re, t_im, windows_g, t_len, stride,
                   pad_l, interpret, save_out=False):
    b = xp.shape[0]
    n_pairs = windows_g.shape[0]
    bt = b if b <= 128 else 128
    assert b % bt == 0, f"batch {b} not a multiple of tile {bt}"

    sel = _build_selectors(windows_g, stride, pad_l)  # (6, 128·P, 4·P)

    kern = functools.partial(_fwd_kernel, n_pairs=n_pairs, t_len=t_len,
                             masked=t_len % _POS_BLOCK != 0,
                             save_out=save_out)
    # M leads (like the input slabs) so each block's last two dims are
    # (bt, lanes) — Mosaic requires those to be 8/128-divisible or equal
    # to the array dims; a (bt, 1, lanes) layout would put the 1-of-M in
    # the sublane slot and fail to lower.
    out_specs = [pl.BlockSpec(
        (1, bt, _FRAMES_PER_BLOCK * n_pairs),
        lambda i, m: (m, i, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(
        (m_blocks, b, _FRAMES_PER_BLOCK * n_pairs), jnp.float32)]
    if save_out:
        big_blk = pl.BlockSpec((1, bt, _POS_BLOCK * n_pairs),
                               lambda i, m: (m, i, 0),
                               memory_space=pltpu.VMEM)
        big_shp = jax.ShapeDtypeStruct(
            (m_blocks, b, _POS_BLOCK * n_pairs), xp.dtype)
        out_specs += [big_blk, big_blk]
        out_shape += [big_shp, big_shp]
    res = pl.pallas_call(
        kern,
        grid=(b // bt, m_blocks),
        in_specs=_x_specs(bt) + [
            pl.BlockSpec((_SLAB_PAD, _POS_BLOCK * n_pairs),
                         lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLAB_PAD, _POS_BLOCK * n_pairs),
                         lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _POS_BLOCK * n_pairs,
                          _FRAMES_PER_BLOCK * n_pairs),
                         lambda i, m: (_sel_index(m), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if save_out else out_specs[0],
        out_shape=out_shape if save_out else out_shape[0],
        interpret=interpret,
    )(xp, xp, xp, xp, xp, t_re, t_im, sel)
    part = (res[0] if save_out else res).swapaxes(0, 1).reshape(
        b, m_blocks, _FRAMES_PER_BLOCK, n_pairs)
    return (part, res[1], res[2]) if save_out else part


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

def _bwd_kernel(*refs, n_pairs: int, t_len: int, masked: bool):
    (x0, x1, x2, x3, x4, outre_ref, outim_ref, bsel_ref, dout_ref,
     dtre_ref, dtim_ref, dwf_ref) = refs
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, m == 0))
    def _():
        dtre_ref[:] = jnp.zeros_like(dtre_ref)
        dtim_ref[:] = jnp.zeros_like(dtim_ref)
        dwf_ref[:] = jnp.zeros_like(dwf_ref)

    xc = [x0[:], x1[:], x2[:], x3[:], x4[:]]      # 5 × (Bt, 128)
    # Conv outputs come from the VJP-forward's saved residual blocks
    # (same (m, i) BlockSpec indexing as the forward wrote them) instead
    # of an in-kernel banded-dot recompute — that recompute was 66 of the
    # backward's ~148 MXU passes per block, and dropping the Toeplitz
    # operands it needed is what lets the pair-group double to 16.
    out_re = outre_ref[0].astype(jnp.float32)
    out_im = outim_ref[0].astype(jnp.float32)
    s = out_re * out_re + out_im * out_im
    if masked:  # tail positions ≥ t_len exist only when 128 ∤ t_len
        s = s * _pos_mask_flat(m, t_len, n_pairs)

    np_ = n_pairs
    # This group's pair selection AND the slot windows are folded into
    # the bsel operand (see _build_bwd_selectors): the dout block is the
    # group's OWN slot-major (Bt, 4P) cotangent (built by one exact
    # permutation matmul in _group_cotangent — no XLA slicing on
    # lane-hostile layouts), and the whole cotangent fold d_S is ONE
    # (Bt, 4P ≤ 64) @ (4P, 128P) dot at the compute dtype — K is one MXU
    # tile. History at LEAF shape (bs 256, bf16, v5e): 4 per-slot f32
    # broadcast dots + 4 VPU multiply-accumulates (the original), then
    # one full-channel (Bt, 4C=160) dot (2 K-tiles; its dW dot also paid
    # 2 sublane tiles); XLA-side per-group slicing measured worse than
    # either (5-way split fusion 0.53 ms/step, group-major transpose
    # 0.52 ms/step), and a 128-lane-per-group padded layout fed by a
    # combined (frame, channel) gather cost 0.51 ms/step in the gather —
    # the permutation-matmul build costs ~0.1 ms for all groups.
    # Out-of-range frame slots carry zero cotangents by construction
    # (zero-frame-padded gather in _fused_bwd).
    dall = dout_ref[0]                             # (Bt, 4·P)
    d_s = jnp.dot(dall, bsel_ref[0], preferred_element_type=jnp.float32)
    # dW in q-space via the MXU instead of per-slot VPU batch reductions:
    # mjc[j·P + p, l] = Σ_b dall[b, j·P+p] · S[b, l], then the per-lane
    # pair fold Σ_p mjc[j·P+p, l]·δ_{p, l%P} is a P-row VPU reduce per
    # slot — ~5× less VPU work than the former full-channel C-row folds,
    # and the dW dot's M = 4P ≤ 64 is one sublane tile.
    s_c = s.astype(x0.dtype)
    mjc = jax.lax.dot_general(
        dall, s_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (4·P, 128·P)
    prow = jax.lax.broadcasted_iota(jnp.int32, (np_, _POS_BLOCK * np_), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (np_, _POS_BLOCK * np_), 1)
    selhot = (prow == pcol % np_).astype(jnp.float32)  # (P, 128·P)
    dw_segs = [
        jnp.sum(mjc[j * np_:(j + 1) * np_] * selhot, axis=0, keepdims=True)
        for j in range(_FRAMES_PER_BLOCK)]
    q = _sel_index(m)
    dwf_ref[q] = dwf_ref[q] + jnp.concatenate(dw_segs, axis=1)

    if masked:
        d_s = d_s * _pos_mask_flat(m, t_len, n_pairs)
    d_re = 2.0 * out_re * d_s
    d_im = 2.0 * out_im * d_s
    # dT matmuls run at the COMPUTE dtype (the accumulators stay f32 via
    # preferred_element_type + the f32 out refs). Under bf16 compute this
    # is single-pass MXU instead of the multipass decomposition f32 inputs
    # force — ~3× on the dominant backward matmuls; the extra cotangent
    # rounding is the same order as the bf16 forward's own noise. f32
    # compute keeps full f32 operands (parity checks run that path).
    # Per-chunk row-slab accumulation mirrors _banded_dot: chunk δ's
    # products land in dT rows δ·128..δ·128+127; rows ≥ _SLAB collect the
    # 5th chunk's overhang garbage, which the diagonal fold never reads.
    d_re = d_re.astype(x0.dtype)
    d_im = d_im.astype(x0.dtype)
    for d, x_d in enumerate(xc[:-1]):
        sl = pl.ds(d * _POS_BLOCK, _POS_BLOCK)
        dtre_ref[sl, :] += jnp.dot(x_d.T, d_re,
                                   preferred_element_type=jnp.float32)
        dtim_ref[sl, :] += jnp.dot(x_d.T, d_im,
                                   preferred_element_type=jnp.float32)
    # 5th chunk: the diagonal fold reads dT rows ≥ 512 only at columns
    # r ≥ _TAIL_POS (d_t[r:r+401, r]), so accumulate just those lanes —
    # N = 16·P instead of 128·P, mirroring _banded_dot's tail (−17.5%
    # of the dT passes). The untouched lanes stay zero (never folded).
    sl = pl.ds((_X_CHUNKS - 1) * _POS_BLOCK, _POS_BLOCK)
    tl = _TAIL_POS * np_
    tlen = (_POS_BLOCK - _TAIL_POS) * np_
    dtre_ref[sl, pl.ds(tl, tlen)] += jnp.dot(
        xc[-1].T, d_re[:, tl:], preferred_element_type=jnp.float32)
    dtim_ref[sl, pl.ds(tl, tlen)] += jnp.dot(
        xc[-1].T, d_im[:, tl:], preferred_element_type=jnp.float32)


def _vjp_pair_group(dtype) -> int:
    """Shared VJP fwd/bwd pair-group size (the saved OUT blocks keep the
    kernels' interleaved (r, p) lane layout, so both passes must split
    channels identically). bf16: 16 — the backward's f32 dT accumulators
    (2 × 640·128·16·4 B ≈ 10.5 MB) + bf16 OUT/selector blocks fit VMEM
    now that it carries no Toeplitz operands. f32 (the parity path): 8 —
    the VJP-forward still holds the f32 Toeplitz operands AND the f32 OUT
    write buffers."""
    return 16 if dtype == jnp.bfloat16 else 8


def _group_cotangent(d_all, f_pad, g0, n_pairs):
    """(M, B, 4·F_pad) slot-expanded cotangent → the group's slot-major
    (M, B, 4·P) block via ONE exact permutation matmul (every output
    lane copies exactly one input lane — a single product against 1.0,
    so there is no rounding at any dtype).

    Measured alternatives at LEAF shape (bs 256, bf16, v5e): XLA-side
    per-group slicing 0.52-0.53 ms/step (lane-hostile minor-dim-8
    layouts); a combined (frame, channel) gather into 128-lane-per-group
    padded segments 0.51 ms/step; full-channel streaming avoided the
    glue entirely but cost every kernel 2 K/sublane MXU tiles in its
    cotangent dots (16 of ~164 passes/block). The permutation matmuls
    for all groups together are ~0.1 ms and ride the MXU."""
    sel = np.zeros((d_all.shape[-1], _FRAMES_PER_BLOCK * n_pairs),
                   np.float32)
    for j in range(_FRAMES_PER_BLOCK):
        for p in range(n_pairs):
            sel[j * f_pad + g0 + p, j * n_pairs + p] = 1.0
    return jnp.dot(d_all, jnp.asarray(sel, d_all.dtype))


def _run_bwd_group(xp, m_blocks, windows_g, out_re_sv, out_im_sv, d_grp,
                   k, t_len, stride, pad_l, interpret):
    """One backward pair-group. ``out_re_sv``/``out_im_sv`` are the VJP-
    forward's saved (M, B, 128·P) conv-output blocks for THIS group (same
    BlockSpec indexing both passes). ``d_grp`` is the group's OWN
    slot-major cotangent (M, B, 4·P) at the compute dtype (lane j·P + p,
    built by ``_group_cotangent``'s exact permutation matmul) — lane dim
    4P ≤ 64 equals the array dim, so the dout BlockSpec is legal with no
    padding and the kernel's cotangent dots stay at one K/sublane MXU
    tile (see ``_bwd_kernel``)."""
    b = xp.shape[0]
    n_pairs = windows_g.shape[0]
    bt = b if b <= 128 else 128

    bsel = _build_bwd_selectors(windows_g, stride,
                                pad_l).astype(xp.dtype)  # (6, 4·P, 128·P)
    slab_w = _FRAMES_PER_BLOCK * _POS_BLOCK * n_pairs

    kern = functools.partial(
        _bwd_kernel, n_pairs=n_pairs, t_len=t_len,
        masked=t_len % _POS_BLOCK != 0)
    big = (_SLAB_PAD, _POS_BLOCK * n_pairs)
    out_blk = pl.BlockSpec((1, bt, _POS_BLOCK * n_pairs),
                           lambda i, m: (m, i, 0),
                           memory_space=pltpu.VMEM)
    dtre, dtim, dwf = pl.pallas_call(
        kern,
        grid=(b // bt, m_blocks),
        in_specs=_x_specs(bt) + [
            out_blk,
            out_blk,
            pl.BlockSpec((1, _FRAMES_PER_BLOCK * n_pairs,
                          _POS_BLOCK * n_pairs),
                         lambda i, m: (_sel_index(m), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, _FRAMES_PER_BLOCK * n_pairs),
                         lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(big, lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(big, lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, slab_w), lambda i, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(big, jnp.float32),
            jax.ShapeDtypeStruct(big, jnp.float32),
            jax.ShapeDtypeStruct((6, 1, slab_w), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, xp, xp, xp, out_re_sv, out_im_sv, bsel, d_grp)

    # Toeplitz cotangents returned UNfolded (SLAB_PAD, 128, P) — the
    # caller concatenates all groups/banks and folds once (the fold reads
    # only rows < _SLAB; the padded rows hold chunk-overhang garbage).
    d_win = _fold_bwd_windows(dwf, k, stride, pad_l)  # (P, K)
    return (dtre.reshape(_SLAB_PAD, _POS_BLOCK, n_pairs),
            dtim.reshape(_SLAB_PAD, _POS_BLOCK, n_pairs), d_win)


# ------------------------------------------------------------- public API

def _prep(x, pad):
    """Pad the waveform so every chunk block index m+δ (δ < _X_CHUNKS) is
    in bounds: length (m_blocks + _X_CHUNKS − 1)·128 ≥ the true band need
    m_blocks·128 + 400. No unfold — kernels read xp directly."""
    b, t = x.shape
    xp = jnp.pad(x, ((0, 0), (pad[0], pad[1])))
    m_blocks = -(-t // _POS_BLOCK)
    need = (m_blocks + _X_CHUNKS - 1) * _POS_BLOCK
    if need > xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
    return xp, t, m_blocks


# Pair-group sizes are multiples of 8 so every static lane slice the
# kernels take (slot slabs at j·128·P, the tail dots at _TAIL_POS·P=112·P)
# lands on a 128-lane boundary. Primal forward group size: see
# _fwd_max_pairs (VMEM is T_re/T_im at 2×_SLAB_PAD·128·P at the compute
# dtype plus the kernel's live f32 (Bt, 128·P) intermediates). The VJP
# fwd/bwd pair share one split: see _vjp_pair_group.


def _pair_groups(f, max_pairs):
    """[(g0, g1, P)]: channel ranges in chunks of ≤max_pairs, each padded
    up to the next multiple of 8 (zero channels → zero outputs/grads)."""
    groups = []
    g0 = 0
    while g0 < f:
        g1 = min(g0 + max_pairs, f)
        groups.append((g0, g1, -(-(g1 - g0) // 8) * 8))
        g0 = g1
    return groups


def _pad_pairs(windows_g, pad_to):
    if windows_g.shape[0] < pad_to:
        windows_g = jnp.pad(
            windows_g, ((0, pad_to - windows_g.shape[0]), (0, 0)))
    return windows_g


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
    out, _ = _fused_fwd_impl(x, gabor, windows, stride, pad, interpret,
                             save_out=False)
    return out


def _check_geometry(gabor, stride, pad):
    # The slot count (_FRAMES_PER_BLOCK) and the period-5 offset patterns
    # (_SEL_REPS) are derived for the LEAF default geometry; any other
    # hop/padding must use the XLA path (Leaf gates on this automatically
    # via _fused_applicable).
    if gabor.shape[0] != _KMAX or stride != 160 or tuple(pad) != (200, 200):
        raise ValueError(
            "fused_gabor_sqmod_lowpass is specialized to K=401 taps, "
            f"stride=160, pad=(200,200); got K={gabor.shape[0]}, "
            f"stride={stride}, pad={tuple(pad)}")


def _fwd_max_pairs(dtype) -> int:
    """24 pairs/launch under bf16 ([24, 16] for LEAF's F=40, zero padding
    waste); 16 under f32 — the f32 Toeplitz operands at _SLAB_PAD rows
    (640·128·24·4 B ≈ 7.9 MB ×2 banks) no longer fit the 16 MB VMEM
    budget at P=24 (the f32 path exists for parity checks, not speed)."""
    return 24 if dtype == jnp.bfloat16 else 16


def _fused_fwd_impl(x, gabor, windows, stride, pad, interpret, save_out):
    """Forward at two group splits: the primal/inference path
    (save_out=False) uses the VMEM-maximal _fwd_max_pairs split and saves
    nothing; the VJP path (save_out=True) uses the backward's
    _vjp_pair_group split and additionally writes each group's conv
    outputs OUT_re/OUT_im as residual blocks — the saved blocks keep the
    kernels' interleaved (r, p) lane layout, which cannot be sub-sliced,
    so the two passes must share one split."""
    _check_geometry(gabor, stride, pad)
    xp, t, m_blocks = _prep(x, pad)
    n_frames = lowpass_frames_out(t, stride, gabor.shape[0], pad)
    f = gabor.shape[1] // 2
    tfull = _toeplitz_full(gabor, x.dtype)  # one gather for all channels
    max_pairs = (_vjp_pair_group(x.dtype) if save_out
                 else _fwd_max_pairs(x.dtype))
    outs, saved = [], []
    for g0, g1, p in _pair_groups(f, max_pairs):
        t_re = _slice_toeplitz(tfull, g0, g1, p)
        t_im = _slice_toeplitz(tfull, f + g0, f + g1, p)
        win_g = _pad_pairs(windows[g0:g1], p)
        res = _run_fwd_group(xp, m_blocks, t_re, t_im, win_g, t, stride,
                             pad[0], interpret, save_out=save_out)
        part = res[0] if save_out else res
        if save_out:
            saved.append((res[1], res[2]))
        outs.append(_combine_partials(part, m_blocks, stride, pad[0],
                                      n_frames)[..., :g1 - g0])
    out = jnp.concatenate(outs, axis=-1)
    # Residuals: the padded waveform (for the backward's dT dots) and the
    # per-group saved conv outputs (so the backward recomputes nothing —
    # neither the Toeplitz bank nor the banded contraction).
    return out, (x, xp, gabor, windows, saved)


def _fused_fwd(x, gabor, windows, stride, pad, interpret):
    return _fused_fwd_impl(x, gabor, windows, stride, pad, interpret,
                           save_out=True)


def _fused_bwd(stride, pad, interpret, res, d_out):
    x, xp, gabor, windows, saved = res
    k, c = gabor.shape
    f = c // 2
    t = x.shape[1]
    m_blocks = -(-t // _POS_BLOCK)
    n_frames = lowpass_frames_out(t, stride, k, pad)

    fr_ids = (_frame_min_np(m_blocks, stride, pad[0])[:, None]
              + np.arange(_FRAMES_PER_BLOCK)[None, :])
    # Out-of-range slots gather row n_frames of the zero-frame-padded
    # cotangent — ZERO rows — so the kernels need no validity masking.
    fr_safe = np.where(fr_ids < n_frames, fr_ids, n_frames)
    # Slot-expand the output cotangent ONCE for all channels: one
    # 2-D-index gather (B, n_frames+1, F_pad) → (B, M, 4, F_pad), then a
    # single relayout to the slot-major (M, B, 4·F_pad) layout at the
    # COMPUTE dtype (the cotangent-side matmuls run at the compute
    # dtype like the dT dots — f32 operands force the MXU's multipass
    # decomposition). Each group's kernel then gets its OWN (M, B, 4P)
    # slot-major block via _group_cotangent's permutation matmul.
    p_grp = _vjp_pair_group(xp.dtype)
    groups = _pair_groups(f, p_grp)
    f_pad = len(groups) * p_grp
    d0 = d_out.astype(xp.dtype)
    d0 = jnp.pad(d0, ((0, 0), (0, 1), (0, f_pad - f)))
    d_all = d0[:, jnp.asarray(fr_safe)]  # (B, M, 4, F_pad)
    d_all = d_all.swapaxes(0, 1).reshape(
        m_blocks, x.shape[0], _FRAMES_PER_BLOCK * f_pad)

    d_res, d_ims, d_wins = [], [], []
    for gi, (g0, g1, p) in enumerate(groups):
        win_g = _pad_pairs(windows[g0:g1], p)
        d_grp = _group_cotangent(d_all, f_pad, g0, p)
        out_re_sv, out_im_sv = saved[gi]
        dr, di, dw = _run_bwd_group(xp, m_blocks, win_g, out_re_sv,
                                    out_im_sv, d_grp, k, t, stride,
                                    pad[0], interpret)
        d_res.append(dr[..., :g1 - g0])
        d_ims.append(di[..., :g1 - g0])
        d_wins.append(dw[:g1 - g0])
    # One diagonal-sum fold over every group and both banks.
    d_t_all = jnp.concatenate(d_res + d_ims, axis=2)  # (SLAB, 128, 2F)
    d_gabor = _fold_toeplitz_grad(d_t_all, k).astype(gabor.dtype)
    d_windows = jnp.concatenate(d_wins, axis=0).astype(windows.dtype)
    return jnp.zeros_like(x), d_gabor, d_windows


fused_gabor_sqmod_lowpass.defvjp(_fused_fwd, _fused_bwd)

"""Exact streaming (chunked) evaluation of the LEAF frontend.

Serving long or live audio should not require buffering the whole clip:
this module evaluates the frontend over fixed-size waveform chunks and
produces frames numerically identical to the offline ``Leaf.apply`` on the
concatenated signal — exact up to f32 roundoff from re-associated EMA
sums, ≤2e-5 relative (asserted in tests/test_streaming.py). The
reference has no streaming story at all — its eval chunks clips into
independent 1 s windows and mean-pools logits (reference: test.py:57-71),
which re-pads every window edge; here the frontend state flows across
chunk boundaries exactly.

Why it works: every stage is either local-in-time or a linear recurrence.

- GaborConv1d (stride 1, K taps, TF-SAME (K//2, K//2)) and the Gaussian
  lowpass (stride H, K taps, same pad) compose so that output frame m
  needs x only on [H·m − R, H·m + R], R = 2·(K//2) (LEAF: K=401, H=160,
  R=400). Streaming keeps a P = H·D + R sample tail (D = ceil((R+1)/H)−1
  frames of latency; LEAF: D=2, P=720) and runs both stages with VALID
  padding over [tail ‖ chunk] — the offline SAME zero-padding is
  reproduced by an explicit zero tail on the first call and appended
  zeros on flush.
- The optional preemphasis runs before the conv; its global zero-padding
  happens in *preemp-output* space, so the first call zeroes the
  pre-stream region after applying preemp (otherwise preemp(0‖x₀) = x₀
  would leak into the left pad).
- sPCEN's smoother is the linear recurrence s_t = w·x_t + (1−w)·s_{t−1}
  with s_0 = x_0 (reference: leaf_pytorch/postprocessing.py:17-28); the
  carried state is one (B, C) vector, injected as a virtual leading frame
  into the same closed-form/scan evaluators the offline path uses
  (postprocessing.ema_matmul / ema_scan), so chunked PCEN is exact, not
  an approximation.
- ``mean_var_norm`` normalizes over the whole clip and is therefore not
  streamable; requesting it raises.

Chunks must be a multiple of the hop H and long enough that only the
first call sees the stream start (LEAF: 640 samples, see
``streaming_geometry``); the final partial chunk (any multiple of H, possibly 0) goes
to ``flush``. Latency is D frames (LEAF: 2 frames = 320 ms of hop, i.e.
frames for samples [0, L−480] arrive with the first chunk of L samples).

Typical use::

    leaf = Leaf()
    variables = leaf.init(rng, jnp.zeros((B, 16000)))
    streamer = LeafStreamer(leaf, variables, chunk_size=1600)
    for chunk in wave_chunks:              # (B, 1600) each
        frames = streamer.process(chunk)   # (B, 10, C) after warmup
    frames = streamer.flush(remainder)     # remaining D (+ partial) frames
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.frontend import convolution, pooling
from leaf_tpu.frontend.frontend import Leaf, Preemphasis
from leaf_tpu.frontend.postprocessing import (
    _EMA_MATMUL_MAX_T,
    ema_matmul,
    ema_scan,
)

__all__ = ["StreamingLeafCell", "LeafStreamer", "streaming_geometry"]


def streaming_geometry(kernel_size: int, stride: int) -> dict:
    """Derived constants of the chunked evaluation (see module docstring).

    R: waveform radius of one output frame; D: output latency in frames;
    P: carried-tail length in samples; flush_pad: zeros appended on flush.

    The geometry assumes the symmetric (K//2, K//2) SAME padding of an
    ODD kernel (every reference Leaf geometry: window_size =
    sr·25//1000 + 1 is odd for all common rates); SAME-padding an even K
    is asymmetric ((K−1)//2 left, K//2 right), which would silently
    misalign streamed frames vs offline, so even K is refused.
    """
    if kernel_size % 2 == 0:
        raise ValueError(
            f"streaming requires an odd conv kernel (symmetric SAME "
            f"padding); got kernel_size={kernel_size}. Offline Leaf pads "
            f"an even kernel asymmetrically, which this chunk geometry "
            f"does not reproduce.")
    r = 2 * (kernel_size // 2)
    d = -(-(r + 1) // stride) - 1
    tail = stride * d + r
    flush_pad = r + 1 - stride
    mask_left = tail - kernel_size // 2
    # A chunk must (a) yield ≥ 1 frame past the lag on the first call and
    # (b) be long enough that only the FIRST call's conv window reaches
    # before the stream start (global t < 0), so the left mask is a
    # first-call-only static.
    min_chunk = stride * max(d + 1, -(-mask_left // stride))
    return {
        "radius": r,
        "lag_frames": d,
        "tail": tail,
        "flush_pad": flush_pad,
        "min_chunk": min_chunk,
        # conv outputs falling outside the stream's global [0, T) — offline
        # those positions are the lowpass's zero padding, never the conv:
        "mask_conv_left": mask_left,
        "mask_conv_right": max(0, flush_pad - kernel_size // 2),
    }


class _EMAWeights(nn.Module):
    """Parameter-only mirror of ExponentialMovingAverage (same tree path)."""

    in_channels: int
    coeff_init: float
    per_channel: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        shape = (self.in_channels,) if self.per_channel else (1,)
        return self.param(
            "weights",
            lambda key, s, dtype: jnp.full(s, self.coeff_init, dtype),
            shape,
            self.param_dtype,
        )


def _ema_chunk(x: jnp.ndarray, w: jnp.ndarray,
               s_prev: Optional[jnp.ndarray]) -> jnp.ndarray:
    """EMA over a chunk; ``s_prev=None`` ⇒ stream start (s_0 = x_0 exactly,
    same code path as offline). Otherwise the carry is injected as a
    virtual frame 0 — the recurrence then continues it exactly."""
    if s_prev is None:
        xs = x
    else:
        xs = jnp.concatenate([s_prev[:, None, :].astype(x.dtype), x], axis=1)
    s = (ema_matmul(xs, w) if xs.shape[1] <= _EMA_MATMUL_MAX_T
         else ema_scan(xs, w))
    return s if s_prev is None else s[:, 1:]


class _StreamingPCEN(nn.Module):
    """sPCEN with an explicit smoother carry; params mirror
    postprocessing.PCENLayer exactly (alpha/delta/root + ema/weights)."""

    in_channels: int
    alpha: float = 0.96
    smooth_coef: float = 0.04
    delta: float = 2.0
    root: float = 2.0
    floor: float = 1e-12
    param_dtype: Any = jnp.float32
    stream_start: bool = False  # static: first frames of the whole stream

    @nn.compact
    def __call__(self, x, s_prev):
        def const(v):
            return lambda key, s, dtype: jnp.full(s, v, dtype)

        c = (self.in_channels,)
        alpha = self.param("alpha", const(self.alpha), c, self.param_dtype)
        delta = self.param("delta", const(self.delta), c, self.param_dtype)
        root = self.param("root", const(self.root), c, self.param_dtype)
        w = jnp.clip(
            _EMAWeights(self.in_channels, self.smooth_coef,
                        param_dtype=self.param_dtype, name="ema")(),
            0.0, 1.0)

        alpha = jnp.minimum(alpha, 1.0)
        root = jnp.maximum(root, 1.0)
        s = _ema_chunk(x, w, None if self.stream_start else s_prev)
        one_over_root = 1.0 / root
        out = (x / (self.floor + s) ** alpha + delta) ** one_over_root \
            - delta ** one_over_root
        return out, s[:, -1, :]


class StreamingLeafCell(nn.Module):
    """One chunk step of the frontend; parameter tree identical to
    :class:`~leaf_tpu.frontend.frontend.Leaf` (apply trained Leaf
    variables directly). Role flags are static — the host wrapper
    (:class:`LeafStreamer`) compiles one variant per role.

    x_work is the raw waveform window [tail ‖ chunk (‖ flush zeros)];
    returns (frames, new_pcen_state) with ``drop_lead`` warmup frames
    removed before PCEN so they never pollute the carry.
    """

    leaf: Leaf
    drop_lead: int = 0         # static: frames to discard at stream start
    mask_preemp: int = 0       # static: preemp-space zeroing of the left pad
    # Offline, the lowpass SAME-pads the |conv|² sequence with zeros — the
    # conv is never evaluated outside [0, T). Streaming evaluates it on the
    # zero-extended waveform, which is NOT zero there (the taps overlap real
    # samples), so the out-of-range conv outputs are masked to match:
    mask_conv_left: int = 0    # static: conv outputs at global t < 0
    mask_conv_right: int = 0   # static: conv outputs at global t ≥ T
    stream_start: bool = False

    @nn.compact
    def __call__(self, x_work: jnp.ndarray, pcen_s: jnp.ndarray):
        leaf = self.leaf
        if leaf.mean_var_norm:
            raise ValueError(
                "mean_var_norm normalizes over the whole clip and cannot "
                "be streamed; disable it for streaming inference.")
        x = x_work[:, :, None].astype(jnp.float32)
        if leaf.preemp:
            x = Preemphasis(param_dtype=leaf.param_dtype, name="preemp")(x)
            if self.mask_preemp:
                # Offline, SAME zero-padding happens AFTER preemp; zero the
                # pre-stream region in preemp space (preemp(0‖x0)=x0 at the
                # seam would otherwise leak into the pad).
                x = x.at[:, :self.mask_preemp, :].set(0.0)
        x = x.astype(leaf.compute_dtype)
        out = convolution.GaborConv1d(
            filters=2 * leaf.n_filters,
            kernel_size=leaf.window_size,
            strides=1,
            padding=(0, 0),
            initializer=leaf.initializer,
            use_bias=False,
            sample_rate=leaf.sample_rate,
            min_freq=leaf.init_min_freq,
            max_freq=leaf.init_max_freq,
            param_dtype=leaf.param_dtype,
            name="complex_conv",
        )(x)
        f = leaf.n_filters
        out = out[..., :f] ** 2 + out[..., f:] ** 2  # SquaredModulus
        if self.mask_conv_left:
            out = out.at[:, :self.mask_conv_left, :].set(0.0)
        if self.mask_conv_right:
            out = out.at[:, -self.mask_conv_right:, :].set(0.0)
        out = out.astype(leaf.compute_dtype)
        out = pooling.GaussianLowPass(
            in_channels=f,
            kernel_size=leaf.window_size,
            strides=leaf.stride,
            padding=(0, 0),
            param_dtype=leaf.param_dtype,
            name="pooling",
        )(out)
        out = jnp.maximum(out, 1e-5)
        if self.drop_lead:
            out = out[:, self.drop_lead:]
        if leaf.pcen_compression:
            out, pcen_s = _StreamingPCEN(
                in_channels=f,
                param_dtype=leaf.param_dtype,
                stream_start=self.stream_start,
                name="compression",
            )(out, pcen_s)
        return out, pcen_s


class LeafStreamer:
    """Host-side driver: carries the waveform tail + PCEN state between
    jitted chunk calls and reproduces the offline ``Leaf.apply`` output
    exactly (tests/test_streaming.py asserts equality to ≤1e-6 for f32).

    Constraints: chunk_size % hop == 0 and chunk_size ≥ the geometry's
    min_chunk (LEAF: 640); the total stream length must be a multiple of
    the hop (LEAF: 160) — pad the source if needed, exactly like the
    offline path would.
    """

    def __init__(self, leaf: Leaf, variables, chunk_size: int,
                 batch_size: Optional[int] = None):
        if leaf.mean_var_norm:
            raise ValueError("mean_var_norm cannot be streamed.")
        self.leaf = leaf
        self.variables = variables
        self._setup(leaf.stride, leaf.n_filters,
                    streaming_geometry(leaf.window_size, leaf.stride),
                    chunk_size, batch_size)

    def _setup(self, hop: int, n_filters: int, geo: dict,
               chunk_size: int, batch_size: Optional[int]):
        """Shared bookkeeping init (also used by the AOT-exported serving
        wrapper, leaf_tpu/serving.py StreamingServingModel)."""
        if chunk_size % hop != 0:
            raise ValueError(
                f"chunk_size must be a multiple of the hop "
                f"({hop}): {chunk_size}")
        if chunk_size < geo["min_chunk"]:
            raise ValueError(
                f"chunk_size must be ≥ {geo['min_chunk']} "
                f"(hop·(lag+1)): {chunk_size}")
        self.hop = hop
        self.n_filters = n_filters
        self.chunk_size = chunk_size
        self.geometry = geo
        self._batch = batch_size
        self._tail = None      # (B, P) raw waveform carry
        self._pcen_s = None    # (B, C) smoother carry
        self._n_calls = 0
        self._flushed = False
        self._jitted = {}

    def _cell(self, role: str):
        geo = self.geometry
        if role not in self._jitted:
            first = role.startswith("first")
            flush = "flush" in role
            cell = StreamingLeafCell(
                leaf=self.leaf,
                drop_lead=geo["lag_frames"] if first else 0,
                mask_preemp=geo["tail"] if first else 0,
                mask_conv_left=geo["mask_conv_left"] if first else 0,
                mask_conv_right=geo["mask_conv_right"] if flush else 0,
                stream_start=first,
            )
            self._jitted[role] = jax.jit(
                lambda v, xw, s: cell.apply(v, xw, s))
        return self._jitted[role]

    def _init_state(self, batch: int):
        self._batch = batch
        self._tail = jnp.zeros((batch, self.geometry["tail"]), jnp.float32)
        self._pcen_s = jnp.zeros((batch, self.n_filters), jnp.float32)

    def _step(self, x_work: jnp.ndarray, role: str):
        frames, self._pcen_s = self._cell(role)(
            self.variables, x_work, self._pcen_s)
        self._tail = x_work[:, -self.geometry["tail"]:]
        self._n_calls += 1
        return frames

    def process(self, chunk) -> jnp.ndarray:
        """Feed (B, chunk_size) samples; returns (B, F, n_filters) frames —
        F = chunk_size/hop − lag on the first call, chunk_size/hop after."""
        if self._flushed:
            raise RuntimeError("stream already flushed; make a new streamer")
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim != 2 or chunk.shape[1] != self.chunk_size:
            raise ValueError(
                f"expected (B, {self.chunk_size}) chunk, got {chunk.shape}")
        if self._tail is None:
            self._init_state(chunk.shape[0])
        role = "first" if self._n_calls == 0 else "steady"
        return self._step(jnp.concatenate([self._tail, chunk], axis=1), role)

    def flush(self, remainder=None) -> jnp.ndarray:
        """Feed the final partial chunk (multiple of the hop, may be None/
        empty) and drain the lag; returns (B, p/hop + lag, n_filters)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        hop = self.hop
        if remainder is not None:
            remainder = jnp.asarray(remainder, jnp.float32)
            if remainder.ndim != 2 or remainder.shape[1] % hop != 0 \
                    or remainder.shape[1] >= self.chunk_size:
                raise ValueError(
                    f"flush remainder must be (B, k·{hop}) with "
                    f"k·{hop} < {self.chunk_size}: "
                    f"{None if remainder is None else remainder.shape}")
        p = 0 if remainder is None else remainder.shape[1]
        if self._tail is None:
            if remainder is None or p < self.geometry["min_chunk"]:
                raise ValueError(
                    f"stream too short: needs ≥ {self.geometry['min_chunk']} "
                    f"samples total")
            self._init_state(remainder.shape[0])
        parts = [self._tail]
        if p:
            parts.append(remainder)
        parts.append(jnp.zeros(
            (self._batch, self.geometry["flush_pad"]), jnp.float32))
        # distinct jit-cache key per remainder length; the prefix picks the
        # static flags in _cell.
        role = ("first_flush" if self._n_calls == 0 else "flush") + f"_{p}"
        frames = self._step(jnp.concatenate(parts, axis=1), role)
        self._flushed = True
        return frames

    def reset(self):
        """Start a new stream with the same compiled variants."""
        self._tail = None
        self._pcen_s = None
        self._n_calls = 0
        self._flushed = False

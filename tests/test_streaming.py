"""Streaming frontend == offline frontend, exactly.

LeafStreamer must reproduce offline ``Leaf.apply`` on the concatenated
waveform for every chunking of the stream — including the PCEN smoother
carry across chunk boundaries (the reference has no streaming path at
all; its eval re-pads independent 1 s windows, test.py:57-71).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.frontend import Leaf
from leaf_tpu.frontend.streaming import LeafStreamer, streaming_geometry

# chunk-boundary FP differences only: the streamed PCEN composes two
# closed-form EMAs where offline uses one, so results match to f32
# roundoff, not bitwise.
TOL = dict(rtol=2e-5, atol=2e-6)


def _leaf(**kw):
    return Leaf(use_fused_kernel="off", **kw)


def _wave(b, t, seed=0):
    return np.random.RandomState(seed).randn(b, t).astype(np.float32) * 0.1


def _stream_all(leaf, variables, wave, chunk):
    streamer = LeafStreamer(leaf, variables, chunk_size=chunk)
    t = wave.shape[1]
    n_full = t // chunk
    outs = []
    for i in range(n_full):
        outs.append(streamer.process(wave[:, i * chunk:(i + 1) * chunk]))
    rem = wave[:, n_full * chunk:]
    outs.append(streamer.flush(rem if rem.shape[1] else None))
    return jnp.concatenate(outs, axis=1)


@pytest.fixture(scope="module")
def default_leaf():
    leaf = _leaf()
    variables = leaf.init(jax.random.PRNGKey(0), jnp.zeros((2, 16000)))
    return leaf, variables


def test_geometry_leaf_defaults():
    geo = streaming_geometry(401, 160)
    assert geo == {"radius": 400, "lag_frames": 2, "tail": 720,
                   "flush_pad": 241, "min_chunk": 640,
                   "mask_conv_left": 520, "mask_conv_right": 41}


def test_geometry_even_kernel_refused():
    # e.g. sr=22050 → window_size 552: SAME padding goes asymmetric and
    # the chunk geometry would silently misalign vs offline Leaf
    with pytest.raises(ValueError, match="odd"):
        streaming_geometry(552, 220)


@pytest.mark.parametrize("chunk", [640, 1600, 4800])
def test_streamed_equals_offline(default_leaf, chunk):
    leaf, variables = default_leaf
    wave = _wave(2, 16000)
    ref = leaf.apply(variables, wave)
    out = _stream_all(leaf, variables, wave, chunk)
    assert out.shape == ref.shape == (2, 100, 40)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_streamed_with_remainder(default_leaf):
    leaf, variables = default_leaf
    wave = _wave(2, 16000, seed=1)
    # 3×4800 = 14400 consumed by process, 1600 via flush
    ref = leaf.apply(variables, wave)
    out = _stream_all(leaf, variables, wave, 4800)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_three_second_clip(default_leaf):
    leaf, variables = default_leaf
    wave = _wave(1, 48000, seed=2)
    ref = leaf.apply(variables, wave)
    out = _stream_all(leaf, variables, wave, 1600)
    assert out.shape == (1, 300, 40)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_preemp_streams_exactly():
    leaf = _leaf(preemp=True)
    variables = leaf.init(jax.random.PRNGKey(1), jnp.zeros((2, 16000)))
    wave = _wave(2, 16000, seed=3)
    ref = leaf.apply(variables, wave)
    out = _stream_all(leaf, variables, wave, 1600)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_no_pcen_streams_exactly():
    leaf = _leaf(pcen_compression=False)
    variables = leaf.init(jax.random.PRNGKey(2), jnp.zeros((2, 16000)))
    wave = _wave(2, 16000, seed=4)
    ref = leaf.apply(variables, wave)
    out = _stream_all(leaf, variables, wave, 800)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_flush_only_short_stream(default_leaf):
    leaf, variables = default_leaf
    wave = _wave(2, 960, seed=5)
    ref = leaf.apply(variables, wave)
    streamer = LeafStreamer(leaf, variables, chunk_size=1600)
    out = streamer.flush(wave)
    assert out.shape == ref.shape == (2, 6, 40)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_long_chunk_uses_scan_path(default_leaf):
    # >256 frames per chunk flips the EMA to the associative scan;
    # both paths must continue the carry exactly.
    leaf, variables = default_leaf
    wave = _wave(1, 96000, seed=6)
    ref = leaf.apply(variables, wave)
    out = _stream_all(leaf, variables, wave, 48000)  # 300 frames/chunk
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_reset_reuses_compilation(default_leaf):
    leaf, variables = default_leaf
    wave = _wave(2, 4800, seed=7)
    streamer = LeafStreamer(leaf, variables, chunk_size=1600)
    for i in range(3):
        streamer.process(wave[:, i * 1600:(i + 1) * 1600])
    a = streamer.flush()
    streamer.reset()
    for i in range(3):
        streamer.process(wave[:, i * 1600:(i + 1) * 1600])
    b = streamer.flush()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validation_errors(default_leaf):
    leaf, variables = default_leaf
    with pytest.raises(ValueError, match="multiple of the hop"):
        LeafStreamer(leaf, variables, chunk_size=1000)
    with pytest.raises(ValueError, match="≥ 640"):
        LeafStreamer(leaf, variables, chunk_size=320)
    with pytest.raises(ValueError, match="mean_var_norm"):
        LeafStreamer(_leaf(mean_var_norm=True), variables, chunk_size=1600)
    streamer = LeafStreamer(leaf, variables, chunk_size=1600)
    with pytest.raises(ValueError, match="expected"):
        streamer.process(np.zeros((2, 800), np.float32))
    with pytest.raises(ValueError, match="too short"):
        LeafStreamer(leaf, variables, chunk_size=1600).flush(
            np.zeros((2, 160), np.float32))
    streamer2 = LeafStreamer(leaf, variables, chunk_size=1600)
    streamer2.process(np.zeros((1, 1600), np.float32))
    streamer2.flush()
    with pytest.raises(RuntimeError, match="flushed"):
        streamer2.process(np.zeros((1, 1600), np.float32))

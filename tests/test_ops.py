"""Pallas fused-frontend kernel tests (interpret mode on the CPU mesh).

The kernel must match the XLA composition
GaussianLowPass(SquaredModulus(GaborConv1d(x))) bit-tightly in f32
interpret mode — forward and both parameter gradients — and the Leaf
module must produce identical features with use_fused_kernel='on' vs 'off'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from leaf_tpu.frontend import Leaf
from leaf_tpu.frontend.pooling import depthwise_strided_conv
from leaf_tpu.ops.fused_frontend import (
    fused_gabor_sqmod_lowpass,
    lowpass_frames_out,
)

F, K = 40, 401


def xla_composition(x, gabor, windows, stride=160, pad=(200, 200)):
    f = gabor.shape[1] // 2
    out = lax.conv_general_dilated(
        x[:, :, None], gabor[:, None, :], window_strides=(1,),
        padding=(pad,), dimension_numbers=("NWC", "WIO", "NWC"))
    s = out[..., :f] ** 2 + out[..., f:] ** 2
    return depthwise_strided_conv(s, windows, stride, pad)


@pytest.fixture
def inputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16000).astype("float32") * 0.1)
    gabor = jnp.asarray(rng.randn(K, 2 * F).astype("float32") * 0.05)
    windows = jnp.asarray(np.abs(rng.randn(F, K)).astype("float32") * 0.01)
    return x, gabor, windows


class TestFusedForward:
    def test_matches_xla(self, inputs):
        x, gabor, windows = inputs
        ref = xla_composition(x, gabor, windows)
        got = fused_gabor_sqmod_lowpass(x, gabor, windows, 160, (200, 200),
                                        True)
        assert got.shape == (4, 100, F)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)

    def test_non_multiple_length(self, inputs):
        # T=12345 is not a multiple of the 128-position block
        x, gabor, windows = inputs
        x = x[:, :12345]
        ref = xla_composition(x, gabor, windows)
        got = fused_gabor_sqmod_lowpass(x, gabor, windows, 160, (200, 200),
                                        True)
        assert got.shape[1] == lowpass_frames_out(12345, 160, K, (200, 200))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)

    def test_three_second_clip(self, inputs):
        x, gabor, windows = inputs
        x = jnp.tile(x, (1, 3))  # 48000 samples (VoxCeleb shape)
        ref = xla_composition(x, gabor, windows)
        got = fused_gabor_sqmod_lowpass(x, gabor, windows, 160, (200, 200),
                                        True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)

    def test_n_filters_not_multiple_of_group(self, inputs):
        # 24 pairs → one full group of 16 + one padded group of 8
        x, gabor, windows = inputs
        f2 = 24
        gab = jnp.concatenate([gabor[:, :f2], gabor[:, F:F + f2]], axis=1)
        win = windows[:f2]
        ref = xla_composition(x, gab, win)
        got = fused_gabor_sqmod_lowpass(x, gab, win, 160, (200, 200), True)
        assert got.shape[-1] == f2
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)


class TestFusedBackward:
    def test_grads_match_xla(self, inputs):
        x, gabor, windows = inputs

        def loss_fused(g, w):
            o = fused_gabor_sqmod_lowpass(x, g, w, 160, (200, 200), True)
            return jnp.sum(jnp.sin(o * 0.1))

        def loss_xla(g, w):
            return jnp.sum(jnp.sin(xla_composition(x, g, w) * 0.1))

        g_ref = jax.grad(loss_xla, argnums=(0, 1))(gabor, windows)
        g_got = jax.grad(loss_fused, argnums=(0, 1))(gabor, windows)
        for a, b in zip(g_ref, g_got):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / np.linalg.norm(a)
            assert rel < 1e-5, rel

    def test_grads_match_xla_non_multiple_length(self, inputs):
        # T=12345 exercises the masked tail-block path AND the
        # zero-frame-padded cotangent gather (frames past n_frames).
        x, gabor, windows = inputs
        x = x[:, :12345]

        def loss_fused(g, w):
            o = fused_gabor_sqmod_lowpass(x, g, w, 160, (200, 200), True)
            return jnp.sum(jnp.sin(o * 0.1))

        def loss_xla(g, w):
            return jnp.sum(jnp.sin(xla_composition(x, g, w) * 0.1))

        g_ref = jax.grad(loss_xla, argnums=(0, 1))(gabor, windows)
        g_got = jax.grad(loss_fused, argnums=(0, 1))(gabor, windows)
        for a, b in zip(g_ref, g_got):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / np.linalg.norm(a)
            assert rel < 1e-5, rel

    def test_slot_offset_range(self):
        # the [−280, 392] bound documented at fused_frontend.py's
        # _FRAMES_PER_BLOCK comment, over every pattern representative
        from leaf_tpu.ops.fused_frontend import _SEL_REPS, _slot_taps
        offs = [off for m_rep in _SEL_REPS
                for _, off, _, _ in _slot_taps(m_rep, 160, 200, K)]
        assert min(offs) == -280 and max(offs) == 392

    def test_no_waveform_grad(self, inputs):
        x, gabor, windows = inputs
        dx = jax.grad(lambda xx: jnp.sum(
            fused_gabor_sqmod_lowpass(xx, gabor, windows, 160, (200, 200),
                                      True)))(x)
        assert float(jnp.abs(dx).max()) == 0.0


class TestLeafIntegration:
    def test_leaf_fused_matches_xla_path(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16000).astype("float32") * 0.1)
        m_off = Leaf(use_fused_kernel="off")
        m_on = Leaf(use_fused_kernel="on")
        params = m_off.init(jax.random.PRNGKey(0), x)
        a = np.asarray(m_off.apply(params, x))
        b = np.asarray(m_on.apply(params, x))  # same param tree!
        np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)

    def test_leaf_fused_train_gradients(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 16000).astype("float32") * 0.1)
        m_off = Leaf(use_fused_kernel="off")
        m_on = Leaf(use_fused_kernel="on")
        params = m_off.init(jax.random.PRNGKey(0), x)

        def loss(m):
            return lambda p: jnp.mean(m.apply(p, x) ** 2)

        g_off = jax.grad(loss(m_off))(params)
        g_on = jax.grad(loss(m_on))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_off),
                        jax.tree_util.tree_leaves(g_on)):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.linalg.norm(a)
            if denom < 1e-12:
                continue
            assert np.linalg.norm(a - b) / denom < 1e-4

    def test_fused_on_unsupported_config_raises(self):
        x = jnp.zeros((2, 16000), jnp.float32)
        m = Leaf(use_fused_kernel="on", preemp=True)
        with pytest.raises(ValueError):
            m.init(jax.random.PRNGKey(0), x)


class TestGeometryGuards:
    def test_non_default_stride_rejected(self, inputs):
        x, gabor, windows = inputs
        with pytest.raises(ValueError, match="specialized"):
            fused_gabor_sqmod_lowpass(x, gabor, windows, 128, (200, 200),
                                      True)

    def test_non_default_pad_rejected(self, inputs):
        x, gabor, windows = inputs
        with pytest.raises(ValueError, match="specialized"):
            fused_gabor_sqmod_lowpass(x, gabor, windows, 160, (100, 100),
                                      True)

    def test_leaf_nondefault_stride_uses_xla_path(self):
        # 8 ms hop → stride 128 → auto must fall back to XLA (and 'on' must
        # raise) rather than silently producing wrong frames
        m = Leaf(window_stride=8.0, use_fused_kernel="on")
        with pytest.raises(ValueError):
            m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16000)))
        m_auto = Leaf(window_stride=8.0)  # auto: XLA path works
        p = m_auto.init(jax.random.PRNGKey(0), jnp.zeros((2, 16000)))
        out = m_auto.apply(p, jnp.zeros((2, 16000)))
        assert out.shape[1] == 125  # 16000/128 frames

"""End-to-end frontend module tests: shapes, parity vs float64 oracle, autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leaf_tpu.frontend import Leaf, SquaredModulus, GaussianLowPass, PCENLayer, get_frontend
from leaf_tpu.frontend.convolution import GaborConv1d

from tests import reference_numpy as oracle


@pytest.fixture(scope="module")
def leaf_model_and_vars():
    model = Leaf()
    x = jnp.zeros((1, 16000))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


class TestLeafShapes:
    def test_output_shape_1s(self, leaf_model_and_vars):
        model, variables = leaf_model_and_vars
        out = model.apply(variables, jnp.zeros((2, 16000)))
        assert out.shape == (2, 100, 40)

    def test_accepts_reference_layout(self, leaf_model_and_vars):
        model, variables = leaf_model_and_vars
        out = model.apply(variables, jnp.zeros((2, 1, 16000)))
        assert out.shape == (2, 100, 40)

    def test_accepts_channels_last(self, leaf_model_and_vars):
        model, variables = leaf_model_and_vars
        out = model.apply(variables, jnp.zeros((2, 16000, 1)))
        assert out.shape == (2, 100, 40)

    def test_longer_clip(self, leaf_model_and_vars):
        model, variables = leaf_model_and_vars
        out = model.apply(variables, jnp.zeros((1, 48000)))
        assert out.shape == (1, 300, 40)

    def test_param_count(self, leaf_model_and_vars):
        # (40,2) gabor + 40 lowpass w + 40 lowpass bias + 4*40 pcen = 320
        _, variables = leaf_model_and_vars
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert n == 40 * 2 + 40 + 40 + 4 * 40

    def test_window_math(self):
        m = Leaf()
        assert m.window_size == 401 and m.stride == 160
        m = Leaf(sample_rate=8000, window_len=25.0, window_stride=10.0)
        assert m.window_size == 201 and m.stride == 80


class TestLeafParity:
    def test_full_forward_matches_oracle(self, leaf_model_and_vars):
        """LEAF forward on random audio ≤1e-4 vs independent float64 pipeline."""
        model, variables = leaf_model_and_vars
        rng = np.random.RandomState(42)
        x = rng.randn(16000).astype(np.float32) * 0.1
        got = np.asarray(model.apply(variables, jnp.asarray(x)[None]))[0]  # (100, 40)

        p = variables["params"]
        pcen = {
            "alpha": np.asarray(p["compression"]["alpha"], np.float64),
            "delta": np.asarray(p["compression"]["delta"], np.float64),
            "root": np.asarray(p["compression"]["root"], np.float64),
            "smooth": np.asarray(p["compression"]["ema"]["weights"], np.float64),
            "floor": 1e-12,
        }
        ref = oracle.leaf_forward(
            x.astype(np.float64),
            np.asarray(p["complex_conv"]["kernel"], np.float64),
            np.asarray(p["pooling"]["weights"], np.float64),
            pcen,
        )
        assert ref.shape == got.shape
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_silence_baseline(self, leaf_model_and_vars):
        """On silence the pooled energy is the bias (1.0) everywhere → PCEN
        output is constant across time and finite."""
        model, variables = leaf_model_and_vars
        out = np.asarray(model.apply(variables, jnp.zeros((1, 16000))))
        assert np.isfinite(out).all()
        assert np.abs(out[0, 1:] - out[0, :1]).max() < 1e-5 * np.abs(out).max()

    def test_jit_matches_eager(self, leaf_model_and_vars):
        model, variables = leaf_model_and_vars
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32))
        eager = model.apply(variables, x)
        jitted = jax.jit(model.apply)(variables, x)
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=2e-5, atol=1e-6)

    def test_grads_finite(self, leaf_model_and_vars):
        model, variables = leaf_model_and_vars
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16000).astype(np.float32))

        def loss(params):
            return model.apply({"params": params}, x).sum()

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # Every parameter must receive gradient (all trainable).
        assert all(np.abs(np.asarray(l)).max() > 0 for l in leaves)


class TestSubmodules:
    def test_squared_modulus(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 8).astype(np.float32))
        out = SquaredModulus().apply({}, x)
        ref = np.asarray(x[..., :4]) ** 2 + np.asarray(x[..., 4:]) ** 2
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    def test_gabor_conv_output_channels(self):
        conv = GaborConv1d(filters=80, kernel_size=401)
        x = jnp.zeros((1, 16000, 1))
        variables = conv.init(jax.random.PRNGKey(0), x)
        out = conv.apply(variables, x)
        assert out.shape == (1, 16000, 80)
        assert variables["params"]["kernel"].shape == (40, 2)

    def test_gabor_conv_bias(self):
        conv = GaborConv1d(filters=8, kernel_size=101, use_bias=True)
        x = jnp.zeros((1, 1000, 1))
        variables = conv.init(jax.random.PRNGKey(0), x)
        out = conv.apply(variables, x)
        np.testing.assert_allclose(np.asarray(out), 1.0)  # bias init = ones

    def test_lowpass_stride_shape(self):
        lp = GaussianLowPass(in_channels=4, kernel_size=401, strides=160)
        x = jnp.zeros((2, 16000, 4))
        variables = lp.init(jax.random.PRNGKey(0), x)
        assert lp.apply(variables, x).shape == (2, 100, 4)

    def test_pcen_disabled_raises(self):
        with pytest.raises(ValueError):
            PCENLayer(in_channels=4, learn_smooth_coef=False).init(
                jax.random.PRNGKey(0), jnp.ones((1, 5, 4))
            )

    def test_init_schemes(self):
        for scheme in ["random", "xavier_normal", "kaiming_normal"]:
            m = Leaf(initializer=scheme)
            v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 16000)))
            k = np.asarray(v["params"]["complex_conv"]["kernel"])
            assert k.shape == (40, 2) and np.isfinite(k).all()

    def test_preemp_and_norm(self):
        m = Leaf(preemp=True, mean_var_norm=True)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16000).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(v, x))
        assert out.shape == (1, 100, 40)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)


class TestFrontendFactory:
    def test_default_args_cfg(self):
        cfg = {"frontend": {"name": "leaf", "default_args": True, "use_legacy_complex": True}}
        fe = get_frontend(cfg)
        assert isinstance(fe, Leaf) and fe.n_filters == 40

    def test_explicit_cfg(self):
        cfg = {
            "frontend": {"name": "leaf", "n_filters": 64, "min_freq": 50.0, "max_freq": 4000.0},
            "audio_config": {"sample_rate": 8000, "window_len": 25.0, "window_stride": 10.0},
        }
        fe = get_frontend(cfg)
        assert fe.n_filters == 64 and fe.sample_rate == 8000
        assert fe.window_size == 201 and fe.stride == 80

    def test_non_leaf_raises(self):
        with pytest.raises(NotImplementedError):
            get_frontend({"frontend": {"name": "sincnet"}})

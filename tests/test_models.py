"""Model zoo tests: shapes, parameter counts vs the torch reference
architectures, train-mode (BN/dropout/stochastic-depth) smoke.

Param-count goldens were computed from torchvision-equivalent architectures;
where our design intentionally differs (channels-last, fused ops) the
parameter inventory must still match exactly — same layers, same shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import cifar_resnet, densenet, resnet
from leaf_tpu.models.classifier import Classifier, get_classifier
from leaf_tpu.models.efficientnet import (
    EfficientNet,
    GlobalParams,
    decode_block_string,
    round_filters,
    round_repeats,
)
from leaf_tpu.models.netvlad import NetVLAD


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def init_model(model, shape, train=False):
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(rng, x, train=train)
    return variables, x


class TestBlockDecoder:
    def test_b0_first_block(self):
        ba = decode_block_string("r1_k3_s11_e1_i32_o16_se0.25")
        assert ba.num_repeat == 1 and ba.kernel_size == 3
        assert ba.stride == 1 and ba.expand_ratio == 1
        assert ba.input_filters == 32 and ba.output_filters == 16
        assert ba.se_ratio == 0.25 and ba.id_skip

    def test_noskip(self):
        ba = decode_block_string("r2_k5_s22_e6_i24_o40_noskip")
        assert not ba.id_skip and ba.se_ratio is None and ba.stride == 2

    def test_round_filters_b0_identity(self):
        gp = GlobalParams(width_coefficient=1.0, depth_coefficient=1.0)
        assert round_filters(32, gp) == 32
        assert round_filters(1280, gp) == 1280

    def test_round_filters_b2(self):
        # b2: width 1.1 → stem 32→32, head 1280→1408 (lukemelas goldens)
        gp = GlobalParams(width_coefficient=1.1, depth_coefficient=1.2)
        assert round_filters(32, gp) == 32
        assert round_filters(1280, gp) == 1408
        assert round_repeats(2, gp) == 3


class TestEfficientNet:
    def test_b0_shape_and_params(self):
        # Reference EfficientNet.from_name('efficientnet-b0', in_channels=1,
        # num_classes=35): 4,051,807 params (computed from the reference
        # torch model; excludes BN running stats, as does Flax's 'params').
        model = EfficientNet(model_name="efficientnet-b0", num_classes=35)
        variables, x = init_model(model, (2, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 35)
        n = param_count(variables["params"])
        assert n == 4_051_807, f"param count {n} != torch reference 4,051,807"

    def test_b0_train_mode(self):
        model = EfficientNet(model_name="efficientnet-b0", num_classes=10)
        variables, x = init_model(model, (2, 40, 101, 1), train=True)
        out, mutated = model.apply(
            variables, jnp.ones_like(x), train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 10)
        assert "batch_stats" in mutated
        assert np.all(np.isfinite(np.asarray(out)))

    @pytest.mark.parametrize("name", ["efficientnet-b1", "efficientnet-b2"])
    def test_larger_variants_init(self, name):
        model = EfficientNet(model_name=name, num_classes=5)
        variables, x = init_model(model, (1, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 5)


class TestResNet:
    def test_resnet18_shape_and_params(self):
        # Reference resnet18(num_classes=35) (1-ch stem): 11,188,195 params.
        model = resnet.resnet18(num_classes=35)
        variables, x = init_model(model, (2, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 35)
        n = param_count(variables["params"])
        assert n == 11_188_195, n

    def test_resnet18_vlad(self):
        # Reference resnet18(num_classes=12, pool='vlad'): 11,284,956 params
        # (NetVLAD conv weight/bias are independent trainable tensors).
        model = resnet.resnet18(num_classes=12, pool="vlad")
        variables, x = init_model(model, (2, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 12)
        assert param_count(variables["params"]) == 11_284_956

    def test_resnet50_bottleneck(self):
        # Reference resnet50(num_classes=7): 23,516,103 params.
        model = resnet.resnet50(num_classes=7)
        variables, x = init_model(model, (1, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 7)
        assert param_count(variables["params"]) == 23_516_103

    def test_zero_init_residual(self):
        model = resnet.ResNet(block_cls=resnet.BasicBlock,
                              layers=(2, 2, 2, 2), num_classes=3,
                              zero_init_residual=True)
        variables, _ = init_model(model, (1, 40, 101, 1))
        bn2_scale = variables["params"]["layer1_0"]["bn2"]["BatchNorm_0"]["scale"]
        assert np.allclose(np.asarray(bn2_scale), 0.0)


class TestCifarResNet:
    def test_resnet20_shape(self):
        # Reference vanilla_cifar_resnet.resnet20(num_classes=35): 1,077,891.
        model = cifar_resnet.resnet20(num_classes=35)
        variables, x = init_model(model, (2, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 35)
        assert param_count(variables["params"]) == 1_077_891

    def test_option_a_shortcut_param_free(self):
        # Option-A shortcut must add zero parameters: compare a downsampling
        # block's params against torch formula.
        model = cifar_resnet.resnet20(num_classes=10)
        variables, _ = init_model(model, (1, 40, 101, 1))
        block = variables["params"]["layer2_0"]
        assert set(block.keys()) == {"conv1", "bn1", "conv2", "bn2"}

    def test_resnet34_custom_blocks(self):
        # Reference resnet34_custom(num_classes=4) = blocks (4,6,6): 2,200,676.
        model = cifar_resnet.resnet34_custom(num_classes=4)
        variables, x = init_model(model, (1, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 4)
        assert param_count(variables["params"]) == 2_200_676
        # (4,6,6) blocks → layer1_3 exists, layer1_4 doesn't
        assert "layer1_3" in variables["params"]
        assert "layer1_4" not in variables["params"]
        assert "layer2_5" in variables["params"]


class TestDenseNet:
    def test_densenet121_shape_and_params(self):
        # densenet121 architecture with 1-ch stem + 35-class head: 6,983,459
        # params (analytic count over the torchvision layer inventory the
        # reference vendors; its own factories are broken — densenet.py:242-309).
        model = densenet.densenet121(num_classes=35)
        variables, x = init_model(model, (1, 40, 101, 1))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 35)
        n = param_count(variables["params"])
        assert n == 6_983_459, n

    def test_memory_efficient_grads_match(self):
        m1 = densenet.DenseNet(block_config=(2, 2), num_init_features=8,
                               growth_rate=4, num_classes=3)
        m2 = densenet.DenseNet(block_config=(2, 2), num_init_features=8,
                               growth_rate=4, num_classes=3,
                               memory_efficient=True)
        variables, x = init_model(m1, (2, 40, 101, 1))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 101, 1))

        def loss(params, model):
            out = model.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              x, train=False)
            return jnp.sum(out ** 2)

        g1 = jax.grad(loss)(variables["params"], m1)
        g2 = jax.grad(loss)(variables["params"], m2)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestNetVLAD:
    def test_output_shape_and_norm(self):
        model = NetVLAD(num_clusters=16, dim=512)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 4, 512))
        variables = model.init(jax.random.PRNGKey(1), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 16 * 512)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5)


class TestClassifier:
    CFG = {
        "frontend": {"name": "leaf", "default_args": True},
        "audio_config": {"sample_rate": 16000},
        "model": {"arch": "efficientnet", "model_depth": "b0",
                  "num_classes": 35},
    }

    def test_waveform_to_logits(self):
        model = Classifier(cfg=self.CFG)
        x = jnp.zeros((2, 16000), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 35)

    def test_dispatch_errors(self):
        with pytest.raises(ValueError):
            get_classifier({"arch": "transformer", "num_classes": 2})
        with pytest.raises(ValueError):
            get_classifier({"arch": "densenet", "model_depth": 999,
                            "num_classes": 2})

    def test_remat_matches_plain(self):
        """model.remat=True (jax.checkpoint per MBConv block) must be a
        pure memory/schedule knob. Run the comparison in FLOAT64: in f32
        the two compilations legitimately differ by reassociation
        rounding amplified through the batch-2 BN chains (measured loss
        rel 3.7e-5, grad diffs up to ~1% — and the worst-looking leaves
        are bn biases whose true grads are ~1e-12 by cancellation); in
        f64 every gradient diff collapses to ~1e-13, proving exactness."""
        import numpy as np

        from leaf_tpu.models.efficientnet import EfficientNet

        with jax.enable_x64(True):
            x = jnp.asarray(np.random.RandomState(0)
                            .randn(2, 40, 25, 1).astype("float64") * 0.1)
            kw = dict(num_classes=7, dropout_rate=0.0,
                      drop_connect_rate=0.0, dtype=jnp.float64)
            plain = EfficientNet(**kw)
            remat = EfficientNet(**kw, remat=True)
            v = plain.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)

            def loss(mod, p):
                out, _ = mod.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.sum(out ** 2)

            l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(
                v["params"])
            l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(
                v["params"])
            assert abs(float(l0) - float(l1)) < 1e-10 * abs(float(l0))
            leaves0 = jax.tree_util.tree_leaves(g0)
            gmax = max(float(jnp.linalg.norm(a)) for a in leaves0)
            for a, b in zip(leaves0, jax.tree_util.tree_leaves(g1)):
                assert float(jnp.linalg.norm(a - b)) <= 1e-9 * gmax

    def test_cifar_resnet_classifier(self):
        cfg = dict(self.CFG)
        cfg["model"] = {"arch": "cifar_resnet", "model_depth": 20,
                        "num_classes": 35}
        model = Classifier(cfg=cfg)
        x = jnp.zeros((1, 16000), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 35)


class TestFeaturesOnly:
    def test_features_extraction_method(self):
        import jax
        import jax.numpy as jnp
        cfg = {
            "frontend": {"name": "leaf", "default_args": True},
            "audio_config": {"sample_rate": 16000},
            "model": {"arch": "cifar_resnet", "model_depth": 20,
                      "num_classes": 3},
        }
        model = Classifier(cfg=cfg)
        x = jnp.zeros((2, 16000), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        feats = model.apply(v, x, method="features_only")
        assert feats.shape == (2, 100, 40)

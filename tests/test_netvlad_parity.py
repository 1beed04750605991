"""NetVLAD pooling numeric parity vs the ACTUAL torch reference.

The reference's ResNet exposes ``pool='vlad'`` (models/resnet.py:99-101),
routing the stage-4 feature map through the VGGSound NetVLAD layer
(models/netvlad.py:10-65) and an 8192-wide fc. Our implementation
(leaf_tpu/models/netvlad.py) reformulates the (B, K, C, N) residual
broadcast as two einsums; this suite proves the reformulation is
numerically identical to the reference by injecting identical parameters
and comparing:

  1. the standalone NetVLAD layer on a random feature map, and
  2. the full resnet18(pool='vlad') backbone — the VoxCeleb-style
     speaker-ID head — end to end.

This closes the last model-zoo component with no torch cross-validation
(cifar_resnet20, resnet18/avgpool, EfficientNet-b0 and DenseNet-121 have
their own parity suites).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

sys.path.insert(0, os.path.dirname(__file__))
from test_resnet18_parity import (_load_reference_resnet,  # noqa: E402
                                  inject_resnet_backbone)
from test_trajectory_parity import _t  # noqa: E402


def _load_reference_netvlad():
    _load_reference_resnet()  # installs the `models` package shim
    import importlib.util
    if "models.netvlad" in sys.modules:
        return sys.modules["models.netvlad"]
    spec = importlib.util.spec_from_file_location(
        "models.netvlad", f"{REF}/models/netvlad.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["models.netvlad"] = mod
    spec.loader.exec_module(mod)
    return mod


def _inject_netvlad(fl_params, ref_vlad):
    """Our params {centroids, assign_weight, assign_bias} → reference
    NetVLAD (conv weight = (K, C, 1, 1), models/netvlad.py:35-41)."""
    with torch.no_grad():
        ref_vlad.centroids.copy_(_t(fl_params["centroids"]))
        ref_vlad.conv.weight.copy_(
            _t(fl_params["assign_weight"])[:, :, None, None])
        ref_vlad.conv.bias.copy_(_t(fl_params["assign_bias"]))


class TestStandaloneNetVLAD:
    def test_forward_matches_torch(self):
        """Identical params + identical (B, C, H, W)/(B, H, W, C) input →
        identical (B, K·C) descriptor: proves the two-einsum contraction,
        the α-sharp softmax assignment, and all three L2 normalizations
        (input / intra / final, models/netvlad.py:49-63) agree."""
        from leaf_tpu.models.netvlad import NetVLAD

        ours = NetVLAD(num_clusters=16, dim=512)
        rng = np.random.RandomState(0)
        x = rng.randn(4, 5, 3, 512).astype(np.float32)  # (B, H, W, C)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

        ref_mod = _load_reference_netvlad()
        ref = ref_mod.NetVLAD(num_clusters=16, dim=512)
        _inject_netvlad(variables["params"], ref)

        out_ours = np.asarray(ours.apply(variables, jnp.asarray(x)))
        ref.eval()
        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        assert out_ours.shape == out_ref.shape == (4, 16 * 512)
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5, rtol=1e-4)

    def test_init_matches_reference_recipe(self):
        """assign weight = 2α·centroids, bias = −α·‖centroid‖ at init
        (models/netvlad.py:35-41)."""
        from leaf_tpu.models.netvlad import NetVLAD

        ours = NetVLAD(num_clusters=8, dim=64, alpha=100.0)
        variables = ours.init(jax.random.PRNGKey(3),
                              jnp.zeros((1, 2, 2, 64)))
        p = variables["params"]
        c = np.asarray(p["centroids"])
        np.testing.assert_allclose(np.asarray(p["assign_weight"]),
                                   200.0 * c, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p["assign_bias"]),
                                   -100.0 * np.linalg.norm(c, axis=1),
                                   rtol=1e-6)


class TestResNet18Vlad:
    def test_backbone_forward_matches_torch(self):
        """resnet18(pool='vlad') — stem → 4 stages → NetVLAD → fc(8192):
        the reference's speaker-ID composition (models/resnet.py:99-101,
        163-171) must match ours end to end on a spectrogram-shaped
        input."""
        from leaf_tpu.models import resnet as our_resnet

        n_classes = 7
        ours = our_resnet.resnet18(num_classes=n_classes, pool="vlad")
        rng = np.random.RandomState(1)
        # LEAF-output-shaped: (B, F=40, T'=100) single-channel map
        x = rng.randn(2, 40, 100, 1).astype(np.float32)
        variables = ours.init(
            {"params": jax.random.PRNGKey(5)}, jnp.asarray(x), train=False)
        m = variables["params"]

        ref_mod = _load_reference_resnet()
        ref = ref_mod.resnet18(num_classes=n_classes, pool="vlad")
        inject_resnet_backbone(m, ref)
        _inject_netvlad(m["vlad"], ref.avgpool)

        out_ours = np.asarray(
            ours.apply(variables, jnp.asarray(x), train=False))
        ref.eval()
        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        assert out_ours.shape == out_ref.shape == (2, n_classes)
        np.testing.assert_allclose(out_ours, out_ref, atol=5e-4, rtol=1e-3)

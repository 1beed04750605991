"""Leaf + DenseNet-121 forward parity vs the reference DenseNet class.

The reference's densenet FACTORIES are dead code (models/densenet.py:
242-267 — `_densenet` is commented out, so `densenet121()` raises
NameError and the reference cannot actually train this family), but the
`DenseNet` CLASS itself (models/densenet.py:142-222, torchvision-derived,
1-channel stem) is functional. Instantiating it directly with the
densenet-121 config closes the last backbone family without torch
numeric cross-validation: identical injected params must produce
identical eval-mode logits through the full Leaf + DenseNet classifier.
"""

import importlib.util
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
from test_torch_cross_validation import _load_reference_leaf  # noqa: E402
from test_trajectory_parity import _t, inject_frontend_params  # noqa: E402

N_CLASSES = 6
BATCH = 2
SR = 16000


def _load_reference_densenet():
    if "ref_densenet" in sys.modules:
        return sys.modules["ref_densenet"]
    spec = importlib.util.spec_from_file_location(
        "ref_densenet", f"{REF}/models/densenet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_densenet"] = mod
    spec.loader.exec_module(mod)
    return mod


def _copy_conv(dst, kernel):
    dst.weight.copy_(_t(kernel).permute(3, 2, 0, 1))


def _copy_bn(dst, fl):
    dst.weight.copy_(_t(fl["scale"]))
    dst.bias.copy_(_t(fl["bias"]))


def _inject_densenet(variables, ref_model):
    """Ours → torch for DenseNet-121 (reference models/densenet.py naming:
    features.{conv0,norm0,denseblockN.denselayerM.*,transitionN.*,norm5},
    classifier)."""
    p = variables["params"]
    inject_frontend_params(p["features"], ref_model.features)
    with torch.no_grad():
        m = p["model"]
        bb = ref_model.model.features
        _copy_conv(bb.conv0, m["conv0"]["kernel"])
        _copy_bn(bb.norm0, m["norm0"])
        for b in range(1, 5):
            blk_t = getattr(bb, f"denseblock{b}")
            blk_f = m[f"denseblock{b}"]
            for name, layer in blk_t.named_children():
                fl = blk_f[name]
                _copy_bn(layer.norm1, fl["norm1"])
                _copy_conv(layer.conv1, fl["conv1"]["kernel"])
                _copy_bn(layer.norm2, fl["norm2"])
                _copy_conv(layer.conv2, fl["conv2"]["kernel"])
            if b < 4:
                tr_t = getattr(bb, f"transition{b}")
                tr_f = m[f"transition{b}"]
                _copy_bn(tr_t.norm, tr_f["norm"])
                _copy_conv(tr_t.conv, tr_f["conv"]["kernel"])
        _copy_bn(bb.norm5, m["norm5"])
        ref_model.model.classifier.weight.copy_(
            _t(m["classifier"]["kernel"]).T)
        ref_model.model.classifier.bias.copy_(_t(m["classifier"]["bias"]))


class _RefClassifier(torch.nn.Module):
    def __init__(self, RefLeaf, dn_mod):
        super().__init__()
        self.features = RefLeaf(use_legacy_complex=False)
        # densenet-121 config, exactly what the dead factory would build
        # (models/densenet.py:267: growth 32, blocks (6,12,24,16), init 64)
        self.model = dn_mod.DenseNet(32, (6, 12, 24, 16), 64,
                                     num_classes=N_CLASSES)

    def forward(self, x):
        out = self.features(x)
        return self.model(out.unsqueeze(1))


def test_full_classifier_forward_matches_torch():
    from leaf_tpu.models import Classifier

    cfg = {
        "frontend": {"name": "leaf", "default_args": True},
        "audio_config": {"sample_rate": SR},
        "model": {"arch": "densenet", "model_depth": 121,
                  "num_classes": N_CLASSES, "type": "multiclass"},
    }
    ours = Classifier(cfg=cfg)
    rng = np.random.RandomState(5)
    wav = rng.randn(BATCH, SR).astype(np.float32) * 0.1
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(wav), train=False)

    ref = _RefClassifier(_load_reference_leaf(), _load_reference_densenet())
    _inject_densenet(variables, ref)
    ref.eval()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(wav).unsqueeze(1)).numpy()
    our_logits = np.asarray(
        ours.apply(variables, jnp.asarray(wav), train=False))
    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(our_logits, ref_logits, atol=5e-4, rtol=1e-3)
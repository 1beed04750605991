"""Leaf + ResNet-18 numeric parity vs the ACTUAL torch reference.

ResNet-18 + LEAF is the reference's second headline recipe (94.05 ± 0.3
SCv2, README.md:76; 44.7 ± 2.9 VoxCeleb1, README.md:78). Same method as
the cifar_resnet20 / EfficientNet-b0 parity suites: initialize OUR Flax
stack, inject the identical tensors into the reference composition
(leaf_pytorch.Leaf + models/resnet.resnet18, reference models/resnet.py:
61-171,226-230), and demand full-classifier forward parity (eval mode)
plus a short Adam trajectory with matching losses.

Covers what the EffNet suite cannot: the torchvision-style stem
(7×7/2 conv + 3×3/2 maxpool padding=1, resnet.py:83-86), BasicBlock
downsample branches (conv1x1 + BN, resnet.py:126-130), and the
N(1, 0.02) BN-scale init flowing through four stages.
"""

import importlib.util
import os
import sys
import types

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

N_CLASSES = 7
BATCH = 8
N_STEPS = 20
LR = 1e-3
WD = 1e-4
WARMUP = 5


def _load_reference_resnet():
    """Import the reference's models/resnet.py (it does
    `from models.netvlad import NetVLAD`, so shim a `models` package
    rooted at the reference's models/ dir)."""
    if "models.resnet" in sys.modules:
        return sys.modules["models.resnet"]
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        sys.modules["models"] = pkg
    spec = importlib.util.spec_from_file_location(
        "models.resnet", f"{REF}/models/resnet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["models.resnet"] = mod
    spec.loader.exec_module(mod)
    return mod


def _copy_bn(dst_bn, fl_bn):
    dst_bn.weight.copy_(_t(fl_bn["BatchNorm_0"]["scale"]))
    dst_bn.bias.copy_(_t(fl_bn["BatchNorm_0"]["bias"]))


def inject_resnet_backbone(m, bb):
    """Copy OUR Flax ResNet params ``m`` (stem + 4 stages + fc) into the
    reference torch backbone ``bb`` (resnet.py:61-171). Shared with the
    NetVLAD/vlad-pool parity suite (test_netvlad_parity.py)."""
    with torch.no_grad():
        bb.conv1.weight.copy_(_t(m["conv1"]["kernel"]).permute(3, 2, 0, 1))
        _copy_bn(bb.bn1, m["bn1"])
        for s, layer in enumerate(
                [bb.layer1, bb.layer2, bb.layer3, bb.layer4], 1):
            for i, blk in enumerate(layer):
                fl = m[f"layer{s}_{i}"]
                blk.conv1.weight.copy_(
                    _t(fl["conv1"]["kernel"]).permute(3, 2, 0, 1))
                blk.conv2.weight.copy_(
                    _t(fl["conv2"]["kernel"]).permute(3, 2, 0, 1))
                _copy_bn(blk.bn1, fl["bn1"])
                _copy_bn(blk.bn2, fl["bn2"])
                if blk.downsample is not None:
                    blk.downsample[0].weight.copy_(
                        _t(fl["downsample_conv"]["kernel"])
                        .permute(3, 2, 0, 1))
                    _copy_bn(blk.downsample[1], fl["downsample_bn"])
        bb.fc.weight.copy_(_t(m["fc"]["kernel"]).T)
        bb.fc.bias.copy_(_t(m["fc"]["bias"]))


def _inject_resnet18(variables, ref_model):
    p = variables["params"]
    inject_frontend_params(p["features"], ref_model.features)
    inject_resnet_backbone(p["model"], ref_model.model)


class _RefClassifier(torch.nn.Module):
    """Reference composition (models/classifier.py:7-18): features →
    unsqueeze(1) → backbone (NCHW (B, 1, F, T'))."""

    def __init__(self, RefLeaf, ref_resnet_mod):
        super().__init__()
        self.features = RefLeaf(use_legacy_complex=False)
        self.model = ref_resnet_mod.resnet18(num_classes=N_CLASSES)

    def forward(self, x):
        out = self.features(x)
        return self.model(out.unsqueeze(1))


@pytest.fixture(scope="module")
def both_models():
    from leaf_tpu.models import Classifier

    cfg = {
        "frontend": {"name": "leaf", "default_args": True},
        "audio_config": {"sample_rate": 16000},
        "model": {"arch": "resnet", "model_depth": 18,
                  "num_classes": N_CLASSES, "type": "multiclass"},
        "opt": {"optimizer": "Adam", "lr": LR, "weight_decay": WD,
                "scheduler": "warmupcosine", "warmup_epochs": 1,
                "batch_size": BATCH},
    }
    ours = Classifier(cfg=cfg)
    rng = np.random.RandomState(0)
    wav0 = jnp.asarray(rng.randn(BATCH, 16000).astype(np.float32) * 0.1)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, wav0,
                          train=False)

    RefLeaf = _load_reference_leaf()
    ref_mod = _load_reference_resnet()
    ref = _RefClassifier(RefLeaf, ref_mod)
    _inject_resnet18(variables, ref)
    return cfg, ours, variables, ref


class TestForwardParity:
    def test_full_classifier_forward_matches_torch(self, both_models):
        """Identical params → the whole Leaf + resnet18 classifier, eval
        mode, must match the torch reference within float tolerance —
        proves the 7×7/2 stem padding, maxpool(3,2,1), BasicBlock
        downsample plumbing, and NHWC↔NCHW layout agree."""
        _, ours, variables, ref = both_models
        rng = np.random.RandomState(1)
        wav = rng.randn(BATCH, 16000).astype(np.float32) * 0.1

        ours_logits = np.asarray(
            ours.apply(variables, jnp.asarray(wav), train=False))
        ref.eval()
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(wav).unsqueeze(1)).numpy()
        assert ours_logits.shape == ref_logits.shape
        np.testing.assert_allclose(ours_logits, ref_logits,
                                   atol=5e-4, rtol=1e-3)

    def test_forward_parity_odd_time_extent(self, both_models):
        """VoxCeleb-style 3 s clips: odd frame counts stress the stride-2
        paddings (stem + three downsampling stages)."""
        _, ours, variables, ref = both_models
        rng = np.random.RandomState(2)
        wav = rng.randn(2, 48000).astype(np.float32) * 0.1
        ours_logits = np.asarray(
            ours.apply(variables, jnp.asarray(wav), train=False))
        ref.eval()
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(wav).unsqueeze(1)).numpy()
        assert ours_logits.shape == ref_logits.shape
        np.testing.assert_allclose(ours_logits, ref_logits,
                                   atol=5e-4, rtol=1e-3)


class TestTrajectoryParity:
    def test_twenty_adam_steps_loss_curve(self, both_models):
        """Same data, same injected init, 20 Adam + warmup-cosine steps in
        both frameworks (the reference hot loop, train_xla.py:259-294):
        per-step losses must agree within 5%."""
        import transformers

        from leaf_tpu.training import (TrainState, make_train_step,
                                       optimization_helper)

        cfg, ours, variables, ref = both_models
        rng = np.random.RandomState(3)
        # 2 fixed batches of separable tones cycled for 20 steps
        n_items = 2 * BATCH
        t = np.arange(16000, dtype=np.float32) / 16000.0
        labels = (np.arange(n_items) % N_CLASSES).astype(np.int64)
        freqs = 300.0 + 350.0 * labels
        waves = 0.2 * np.sin(2 * np.pi * freqs[:, None] * t[None, :])
        waves = (waves + 0.02 * rng.randn(n_items, 16000)).astype(np.float32)

        tx, _, _ = optimization_helper(
            cfg, num_tr_steps_per_epoch=WARMUP, num_epochs=N_STEPS // WARMUP)
        state = TrainState.create(
            apply_fn=ours.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx)
        train_step = make_train_step("multiclass", donate=False)
        key = jax.random.PRNGKey(7)
        our_losses = []
        for step in range(N_STEPS):
            lo = (step % 2) * BATCH
            state, metrics = train_step(
                state, jnp.asarray(waves[lo:lo + BATCH]),
                jnp.asarray(labels[lo:lo + BATCH].astype(np.int32)), key)
            our_losses.append(float(metrics["loss"]))

        # torch side: fresh injection (the fixture's ref was never stepped)
        ref2 = _RefClassifier(_load_reference_leaf(),
                              _load_reference_resnet())
        _inject_resnet18(variables, ref2)
        ref2.train()
        opt = torch.optim.Adam(ref2.parameters(), lr=LR, weight_decay=WD)
        sched = transformers.get_cosine_schedule_with_warmup(
            opt, num_warmup_steps=WARMUP, num_training_steps=N_STEPS)
        loss_fn = torch.nn.CrossEntropyLoss()
        ref_losses = []
        for step in range(N_STEPS):
            lo = (step % 2) * BATCH
            xb = torch.from_numpy(waves[lo:lo + BATCH]).unsqueeze(1)
            yb = torch.from_numpy(labels[lo:lo + BATCH])
            opt.zero_grad()
            loss = loss_fn(ref2(xb), yb)
            loss.backward()
            opt.step()
            sched.step()
            ref_losses.append(float(loss.detach()))

        our_losses = np.asarray(our_losses)
        ref_losses = np.asarray(ref_losses)
        assert abs(our_losses[0] - ref_losses[0]) < 1e-3, \
            (our_losses[0], ref_losses[0])
        diff = np.abs(our_losses - ref_losses)
        scale = np.maximum(np.abs(ref_losses), 0.1)
        assert float((diff / scale).max()) < 0.05, \
            list(zip(our_losses, ref_losses))
        assert our_losses[-1] < our_losses[0]
        assert ref_losses[-1] < ref_losses[0]
"""End-to-end audio classifier: LEAF frontend → 1-channel CNN backbone.

Capability parity with reference models/classifier.py:7-18 and the
string-dispatch backbone factory models/model_helper.py:8-95. Differences:

- Layout: the frontend emits channels-last (B, frames, n_filters); the
  backbone consumes NHWC (B, n_filters, frames, 1) — the same image the
  reference builds with ``out.unsqueeze(1)`` in NCHW (classifier.py:16).
- The reference constructs resnet18 with a hardcoded 309 classes and then
  swaps the fc layer (model_helper.py:34-40) — a quirk, knowingly fixed:
  all factories take num_classes directly.
- Pretrained-checkpoint surgery (model_helper.py:78-94) is a parameter-level
  operation in JAX and lives in ``leaf_tpu.training.checkpoint``
  (``load_pretrained_backbone``), not in the module factory.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.frontend.helper import get_frontend
from leaf_tpu.models import cifar_resnet, densenet, resnet
from leaf_tpu.models.efficientnet import EfficientNet

__all__ = ["Classifier", "get_classifier"]


def get_classifier(opt: dict) -> nn.Module:
    """Backbone factory (reference: models/model_helper.py:8-95).

    ``opt`` is the config's ``model`` section: arch ∈ {densenet, resnet,
    cifar_resnet, efficientnet}, model_depth, num_classes, pool.
    """
    num_classes = opt["num_classes"]
    arch = opt["arch"]
    import jax.numpy as jnp
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        opt.get("compute_dtype", "float32")]
    kw = {"dtype": dtype} if dtype != jnp.float32 else {}

    if "densenet" in arch:
        depth = opt["model_depth"]
        factories = {121: densenet.densenet121, 161: densenet.densenet161,
                     169: densenet.densenet169, 201: densenet.densenet201}
        if depth not in factories:
            raise ValueError(
                f"Invalid value {depth} of depth for densenet arch")
        return factories[depth](num_classes=num_classes, **kw)
    if arch == "resnet":
        depth = opt["model_depth"]
        pool = opt.get("pool", "avgpool")
        factories = {18: resnet.resnet18, 34: resnet.resnet34,
                     50: resnet.resnet50, 101: resnet.resnet101,
                     152: resnet.resnet152}
        if depth not in factories:
            raise ValueError(
                f"Invalid value {depth} of depth for resnet arch")
        if depth in (18, 34, 50):
            return factories[depth](num_classes=num_classes, pool=pool, **kw)
        return factories[depth](num_classes=num_classes, **kw)
    if arch == "cifar_resnet":
        depth = opt["model_depth"]
        factories = {20: cifar_resnet.resnet20, 32: cifar_resnet.resnet32,
                     34: cifar_resnet.resnet34_custom,
                     44: cifar_resnet.resnet44, 56: cifar_resnet.resnet56,
                     110: cifar_resnet.resnet110}
        if depth not in factories:
            raise ValueError(
                f"Invalid value {depth} of depth for cifar_resnet arch")
        return factories[depth](num_classes=num_classes, **kw)
    if arch == "efficientnet":
        variant = opt["model_depth"]  # e.g. 'b0'
        # optional rate overrides, mirroring the reference's from_name
        # override_params (model.py:324-334)
        for k in ("dropout_rate", "drop_connect_rate"):
            if k in opt:
                kw[k] = float(opt[k])
        if "remat" in opt:
            kw["remat"] = bool(opt["remat"])
        return EfficientNet(model_name=f"efficientnet-{variant}",
                            num_classes=num_classes, **kw)
    raise ValueError(f"Unsupported value {arch} for opt['arch']")


class Classifier(nn.Module):
    """LEAF features → (B, n_filters, frames, 1) image → backbone logits.

    ``features`` and ``model`` submodule names mirror the reference so the
    pretrained-frontend extraction story (reference README.md:94-114,
    ``model.features``) carries over: params live under
    ``params['features']`` / ``params['model']``.
    """

    cfg: Any

    def setup(self):
        self.features = get_frontend(self.cfg)
        self.model = get_classifier(self.cfg["model"])

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = self.features(x)  # (B, frames, n_filters)
        out = jnp.swapaxes(out, 1, 2)[..., None]  # (B, n_filters, frames, 1)
        return self.model(out, train=train)

    def features_only(self, x: jnp.ndarray) -> jnp.ndarray:
        """LEAF features without the backbone — the reference's
        ``model.features`` extraction flow (reference README.md:112-113).
        Use via ``model.apply(variables, x, method="features_only")``."""
        return self.features(x)

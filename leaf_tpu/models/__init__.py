"""Classifier model zoo (Flax, NHWC): EfficientNet, ResNet (+NetVLAD),
CIFAR-ResNet, DenseNet, and the LEAF ``Classifier`` wrapper.

Capability parity with reference ``models/`` (~1,440 LoC torch)."""

from leaf_tpu.models.classifier import Classifier, get_classifier
from leaf_tpu.models.efficientnet import EfficientNet, efficientnet_params
from leaf_tpu.models.netvlad import NetVLAD
from leaf_tpu.models.pretrained import load_pretrained_backbone
from leaf_tpu.models.torch_import import import_torch_classifier

__all__ = [
    "Classifier",
    "get_classifier",
    "EfficientNet",
    "efficientnet_params",
    "NetVLAD",
    "import_torch_classifier",
    "load_pretrained_backbone",
]

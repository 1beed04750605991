"""CIFAR-style ResNet (Idelbayev variant) in Flax, NHWC, 1-channel stem.

Capability parity with reference models/vanilla_cifar_resnet.py:56-190:
3 stages of [32, 64, 128] planes, option-A parameter-free shortcuts
(stride-2 spatial subsample + zero channel pad, reference:73-75), a 7×7/2
stem + 3×3/2 maxpool (98-101), global average pool, linear head. Kaiming
conv/dense init via `_weights_init` (reference:20-23).

Factories resnet20/32/44/56/110/1202 + the custom resnet34
(reference:148-175).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.models.common import (
    global_avg_pool,
    kaiming_normal_fan_out,
    max_pool_same,
)

__all__ = [
    "CifarResNet",
    "resnet20",
    "resnet32",
    "resnet44",
    "resnet56",
    "resnet110",
    "resnet1202",
    "resnet34_custom",
]


def _conv3x3(features: int, stride: int = 1, dtype=jnp.float32, name=None):
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=False,
                   kernel_init=kaiming_normal_fan_out, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """3×3+3×3 residual block with option-A shortcut (reference:56-88)."""

    planes: int
    stride: int = 1
    option: str = "A"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_planes = x.shape[-1]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.relu(bn("bn1")(_conv3x3(self.planes, self.stride,
                                         self.dtype, "conv1")(x)))
        out = bn("bn2")(_conv3x3(self.planes, 1, self.dtype, "conv2")(out))

        shortcut = x
        if self.stride != 1 or in_planes != self.planes:
            if self.option == "A":
                # NHWC equivalent of x[:, :, ::2, ::2] + channel zero-pad
                # planes//4 on each side (reference:73-75).
                shortcut = x[:, ::2, ::2, :]
                pad = self.planes // 4
                shortcut = jnp.pad(
                    shortcut, ((0, 0), (0, 0), (0, 0), (pad, pad)))
            else:  # option B: projection shortcut
                shortcut = nn.Conv(
                    self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype, name="shortcut_conv")(x)
                shortcut = bn("shortcut_bn")(shortcut)
        return nn.relu(out + shortcut)


class CifarResNet(nn.Module):
    num_blocks: Sequence[int] = (3, 3, 3)
    num_classes: int = 10
    option: str = "A"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = max_pool_same(nn.relu(x))

        for stage, (planes, blocks) in enumerate(
                zip((32, 64, 128), self.num_blocks)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                x = BasicBlock(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    option=self.option,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)

        x = global_avg_pool(x)
        return nn.Dense(self.num_classes,
                        kernel_init=kaiming_normal_fan_out,
                        dtype=self.dtype, name="linear")(x)


def _factory(blocks):
    def make(num_classes: int = 10, **kw) -> CifarResNet:
        return CifarResNet(num_blocks=blocks, num_classes=num_classes, **kw)
    return make


resnet20 = _factory((3, 3, 3))
resnet32 = _factory((5, 5, 5))
resnet44 = _factory((7, 7, 7))
resnet56 = _factory((9, 9, 9))
resnet110 = _factory((18, 18, 18))
resnet1202 = _factory((200, 200, 200))
resnet34_custom = _factory((4, 6, 6))  # reference:172-173

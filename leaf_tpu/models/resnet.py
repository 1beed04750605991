"""ResNet family in Flax, NHWC, 1-channel audio stem.

Capability parity with the reference's torchvision-style audio ResNet
(reference: models/resnet.py): BasicBlock/Bottleneck (20-58/174-214),
1-channel 7×7/2 stem + 3×3/2 maxpool (83-86), four stages [64,128,256,512],
optional NetVLAD pooling head ('vlad' → fc on 8192·expansion features,
99-101), kaiming fan_out conv init + N(1, 0.02) BN scale init (103-108),
optional zero-init of each block's last BN (zero_init_residual, 113-118),
groups/width_per_group for wide/resnext variants (67, 82).

Factories: resnet18/34/50/101/152, wide_resnet50_2/101_2, resnext50_32x4d,
resnext101_32x8d (reference: models/resnet.py:226-338). The reference's
``pretrained=True`` branch is dead code (undefined load_state_dict_from_url,
217-223) and is intentionally not reproduced.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.models.common import (
    bn_scale_normal,
    global_avg_pool,
    kaiming_normal_fan_out,
    max_pool_same,
)
from leaf_tpu.models.netvlad import NetVLAD

__all__ = [
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "wide_resnet50_2",
    "wide_resnet101_2",
    "resnext50_32x4d",
    "resnext101_32x8d",
]


def _conv(features: int, kernel: int, stride: int = 1, groups: int = 1,
          dtype=jnp.float32, name: Optional[str] = None) -> nn.Conv:
    # torch padding=k//2 (symmetric), bias=False, kaiming fan_out init.
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        feature_group_count=groups,
        use_bias=False,
        kernel_init=kaiming_normal_fan_out,
        dtype=dtype,
        name=name,
    )


class _BN(nn.Module):
    zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        scale_init = (nn.initializers.zeros if self.zero_init
                      else bn_scale_normal(1.0, 0.02))
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=scale_init,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    """Two 3×3 convs (reference: models/resnet.py:20-58). expansion = 1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.planes, 3, self.stride, dtype=self.dtype,
                    name="conv1")(x)
        out = _BN(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, dtype=self.dtype, name="conv2")(out)
        out = _BN(zero_init=self.zero_init_residual, dtype=self.dtype,
                  name="bn2")(out, train)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride,
                             dtype=self.dtype, name="downsample_conv")(x)
            identity = _BN(dtype=self.dtype, name="downsample_bn")(
                identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 (reference: models/resnet.py:174-214). expansion = 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = _conv(width, 1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_BN(dtype=self.dtype, name="bn1")(out, train))
        out = _conv(width, 3, self.stride, groups=self.groups,
                    dtype=self.dtype, name="conv2")(out)
        out = nn.relu(_BN(dtype=self.dtype, name="bn2")(out, train))
        out = _conv(self.planes * self.expansion, 1, dtype=self.dtype,
                    name="conv3")(out)
        out = _BN(zero_init=self.zero_init_residual, dtype=self.dtype,
                  name="bn3")(out, train)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride,
                             dtype=self.dtype, name="downsample_conv")(x)
            identity = _BN(dtype=self.dtype, name="downsample_bn")(
                identity, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    block_cls: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    pool: str = "avgpool"  # 'avgpool' | 'vlad'
    zero_init_residual: bool = False
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_BN(dtype=self.dtype, name="bn1")(x, train))
        x = max_pool_same(x)

        inplanes = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                need_ds = (s != 1
                           or inplanes != planes * self.block_cls.expansion)
                x = self.block_cls(
                    planes=planes,
                    stride=s,
                    downsample=need_ds and i == 0,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
                inplanes = planes * self.block_cls.expansion

        if self.pool == "vlad":
            x = NetVLAD(dim=inplanes, name="vlad")(x)
        else:
            x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def _factory(block_cls, layers):
    def make(num_classes: int = 1000, pool: str = "avgpool", **kw) -> ResNet:
        return ResNet(block_cls=block_cls, layers=layers,
                      num_classes=num_classes, pool=pool, **kw)
    return make


resnet18 = _factory(BasicBlock, (2, 2, 2, 2))
resnet34 = _factory(BasicBlock, (3, 4, 6, 3))
resnet50 = _factory(Bottleneck, (3, 4, 6, 3))
resnet101 = _factory(Bottleneck, (3, 4, 23, 3))
resnet152 = _factory(Bottleneck, (3, 8, 36, 3))


def wide_resnet50_2(num_classes: int = 1000, **kw) -> ResNet:
    return ResNet(block_cls=Bottleneck, layers=(3, 4, 6, 3),
                  num_classes=num_classes, width_per_group=128, **kw)


def wide_resnet101_2(num_classes: int = 1000, **kw) -> ResNet:
    return ResNet(block_cls=Bottleneck, layers=(3, 4, 23, 3),
                  num_classes=num_classes, width_per_group=128, **kw)


def resnext50_32x4d(num_classes: int = 1000, **kw) -> ResNet:
    return ResNet(block_cls=Bottleneck, layers=(3, 4, 6, 3),
                  num_classes=num_classes, groups=32, width_per_group=4, **kw)


def resnext101_32x8d(num_classes: int = 1000, **kw) -> ResNet:
    return ResNet(block_cls=Bottleneck, layers=(3, 4, 23, 3),
                  num_classes=num_classes, groups=32, width_per_group=8, **kw)

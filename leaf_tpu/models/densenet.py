"""DenseNet in Flax, NHWC, 1-channel stem.

Capability parity with reference models/densenet.py: dense layers
(BN→ReLU→1×1 conv (bn_size·k) → BN→ReLU→3×3 conv (k), reference:28-96),
dense blocks with feature concatenation (99-121), transitions halving
channels + 2×2 avg-pool (124-137), 1-channel 7×7/2 stem (173), final BN +
global avg-pool + linear classifier (200-238), optional dropout after each
dense layer (drop_rate, reference:60-63).

The reference's `memory_efficient` gradient checkpointing (densenet.py:64-68)
maps to ``nn.remat`` over the dense layer. The reference's factory functions
are broken (``_densenet`` commented out → NameError, densenet.py:242-309);
here they work.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.models.common import global_avg_pool, max_pool_same

__all__ = [
    "DenseNet",
    "densenet121",
    "densenet161",
    "densenet169",
    "densenet201",
]


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.relu(bn("norm1")(x))
        out = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(out)
        out = nn.relu(bn("norm2")(out))
        out = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        if self.drop_rate > 0:
            out = nn.Dropout(rate=self.drop_rate,
                             deterministic=not train)(out)
        return out


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    drop_rate: float
    memory_efficient: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        layer_cls = DenseLayer
        if self.memory_efficient:
            # Rematerialize each dense layer's activations in the backward
            # pass (reference's torch.utils.checkpoint path, densenet.py:64-68).
            layer_cls = nn.remat(DenseLayer, static_argnums=(2,))
        for i in range(self.num_layers):
            new = layer_cls(
                growth_rate=self.growth_rate,
                bn_size=self.bn_size,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                name=f"denselayer{i + 1}",
            )(x, train)
            x = jnp.concatenate([x, new], axis=-1)
        return x


class Transition(nn.Module):
    num_output_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Conv(self.num_output_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(nn.relu(x))
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    num_classes: int = 1000
    memory_efficient: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm0")(x)
        x = max_pool_same(nn.relu(x))

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers=num_layers,
                growth_rate=self.growth_rate,
                bn_size=self.bn_size,
                drop_rate=self.drop_rate,
                memory_efficient=self.memory_efficient,
                dtype=self.dtype,
                name=f"denseblock{i + 1}",
            )(x, train=train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = Transition(num_output_features=num_features,
                               dtype=self.dtype,
                               name=f"transition{i + 1}")(x, train=train)

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm5")(x)
        x = global_avg_pool(nn.relu(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(x)


def densenet121(num_classes: int = 1000, **kw) -> DenseNet:
    return DenseNet(32, (6, 12, 24, 16), 64, num_classes=num_classes, **kw)


def densenet161(num_classes: int = 1000, **kw) -> DenseNet:
    return DenseNet(48, (6, 12, 36, 24), 96, num_classes=num_classes, **kw)


def densenet169(num_classes: int = 1000, **kw) -> DenseNet:
    return DenseNet(32, (6, 12, 32, 32), 64, num_classes=num_classes, **kw)


def densenet201(num_classes: int = 1000, **kw) -> DenseNet:
    return DenseNet(32, (6, 12, 48, 32), 64, num_classes=num_classes, **kw)

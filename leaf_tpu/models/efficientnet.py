"""EfficientNet (b0–b8, l2) in Flax, NHWC, TF-SAME padding.

Capability parity with the reference's vendored lukemelas EfficientNet
(reference: models/efficientnet/model.py + utils.py): the block-string DSL
(utils.py:361-454), compound scaling ``round_filters``/``round_repeats``
(utils.py:83-126), MBConv with squeeze-excite (model.py:36-140), stochastic
depth scaled by block index (model.py:262-264), BN momentum 0.99 / eps 1e-3
(utils.py:519-521), dropout before the final linear.

TPU-first differences:
- NHWC channels-last; ``padding='SAME'`` in lax IS TF SAME, so the
  reference's Conv2dStaticSamePadding machinery (utils.py:215-276) is
  unnecessary.
- memory-efficient Swish custom autograd (utils.py:64-80) → plain
  ``jax.nn.silu``; XLA rematerializes under ``jax.checkpoint``.
- stochastic depth / dropout via explicit Flax 'dropout' PRNG collection.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from leaf_tpu.models.common import drop_connect, global_avg_pool

__all__ = [
    "BlockArgs",
    "GlobalParams",
    "decode_block_string",
    "round_filters",
    "round_repeats",
    "efficientnet_params",
    "EfficientNet",
]


@dataclass(frozen=True)
class BlockArgs:
    num_repeat: int
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: Optional[float]
    id_skip: bool = True

    def replace(self, **kw) -> "BlockArgs":
        d = self.__dict__.copy()
        d.update(kw)
        return BlockArgs(**d)


@dataclass(frozen=True)
class GlobalParams:
    width_coefficient: Optional[float]
    depth_coefficient: Optional[float]
    dropout_rate: float = 0.2
    drop_connect_rate: float = 0.2
    num_classes: int = 1000
    batch_norm_momentum: float = 0.99
    batch_norm_epsilon: float = 1e-3
    depth_divisor: int = 8
    min_depth: Optional[int] = None
    include_top: bool = True


# The b0 architecture in the reference's block-string DSL
# (reference: models/efficientnet/utils.py:502-510).
B0_BLOCK_STRINGS = (
    "r1_k3_s11_e1_i32_o16_se0.25",
    "r2_k3_s22_e6_i16_o24_se0.25",
    "r2_k5_s22_e6_i24_o40_se0.25",
    "r3_k3_s22_e6_i40_o80_se0.25",
    "r3_k5_s11_e6_i80_o112_se0.25",
    "r4_k5_s22_e6_i112_o192_se0.25",
    "r1_k3_s11_e6_i192_o320_se0.25",
)

# width, depth, resolution, dropout (reference: utils.py:466-479).
_SCALING_COEFFICIENTS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5),
}

VALID_MODELS = tuple(_SCALING_COEFFICIENTS)


def efficientnet_params(model_name: str) -> Tuple[float, float, int, float]:
    return _SCALING_COEFFICIENTS[model_name]


def decode_block_string(block_string: str) -> BlockArgs:
    """Parse e.g. 'r1_k3_s11_e1_i32_o16_se0.25' (reference: utils.py:370-402)."""
    ops = block_string.split("_")
    options = {}
    for op in ops:
        m = re.match(r"(\d.*)", op)
        splits = re.split(r"(\d.*)", op)
        if len(splits) >= 2:
            key, value = splits[:2]
            options[key] = value
    stride = options["s"]
    if not (len(stride) == 1 or (len(stride) == 2 and stride[0] == stride[1])):
        raise ValueError(f"invalid stride in block string: {block_string}")
    return BlockArgs(
        num_repeat=int(options["r"]),
        kernel_size=int(options["k"]),
        stride=int(stride[0]),
        expand_ratio=int(options["e"]),
        input_filters=int(options["i"]),
        output_filters=int(options["o"]),
        se_ratio=float(options["se"]) if "se" in options else None,
        id_skip="noskip" not in block_string,
    )


def round_filters(filters: int, gp: GlobalParams) -> int:
    """Width scaling with divisor snapping (reference: utils.py:83-108)."""
    multiplier = gp.width_coefficient
    if not multiplier:
        return filters
    divisor = gp.depth_divisor
    min_depth = gp.min_depth or divisor
    filters *= multiplier
    new_filters = max(min_depth, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:  # never round down by >10%
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, gp: GlobalParams) -> int:
    """Depth scaling (reference: utils.py:111-126)."""
    if not gp.depth_coefficient:
        return repeats
    return int(math.ceil(gp.depth_coefficient * repeats))


def get_model_params(model_name: str, num_classes: int = 1000,
                     **overrides) -> Tuple[Sequence[BlockArgs], GlobalParams]:
    width, depth, _res, dropout = efficientnet_params(model_name)
    blocks = [decode_block_string(s) for s in B0_BLOCK_STRINGS]
    gp = GlobalParams(
        width_coefficient=width,
        depth_coefficient=depth,
        dropout_rate=dropout,
        num_classes=num_classes,
    )
    if overrides:
        d = gp.__dict__.copy()
        d.update(overrides)
        gp = GlobalParams(**d)
    return blocks, gp


class _PointwiseDense(nn.Module):
    """A 1x1 conv applied to a (B, C) vector as one MXU dot.

    Numerically identical to ``nn.Conv(features, (1, 1))`` on the
    (B, 1, 1, C) squeeze-excite tensor, and the parameter tree is kept
    byte-for-byte compatible (kernel (1, 1, C_in, C_out) + bias (C_out,),
    same initializers) so orbax checkpoints and ``models/torch_import.py``
    need no changes. The 2-D operand layout avoids the 8x sublane padding
    a (B, 1, 1, C) tensor pays on TPU (reference SE: model.py:59-66,111-116).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: (B, C_in)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        return x @ kernel.reshape(cin, self.features) + bias


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with SE (reference: model.py:36-140)."""

    block_args: BlockArgs
    bn_momentum: float
    bn_epsilon: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 drop_connect_rate: Optional[float] = None) -> jnp.ndarray:
        ba = self.block_args
        inputs = x
        inp = ba.input_filters
        oup = ba.input_filters * ba.expand_ratio
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name=name,
        )

        if ba.expand_ratio != 1:
            x = nn.Conv(oup, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = bn("bn0")(x)
            x = nn.silu(x)

        # Depthwise
        x = nn.Conv(
            oup, (ba.kernel_size, ba.kernel_size),
            strides=(ba.stride, ba.stride),
            padding="SAME",
            feature_group_count=oup,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = bn("bn1")(x)
        x = nn.silu(x)

        # Squeeze and excitation
        if ba.se_ratio is not None and 0 < ba.se_ratio <= 1:
            squeezed_ch = max(1, int(inp * ba.se_ratio))
            se = jnp.mean(x, axis=(1, 2))  # (B, C): dense 2-D layout
            se = _PointwiseDense(squeezed_ch, dtype=self.dtype,
                                 name="se_reduce")(se)
            se = nn.silu(se)
            se = _PointwiseDense(oup, dtype=self.dtype, name="se_expand")(se)
            x = jax.nn.sigmoid(se)[:, None, None, :] * x

        # Project
        x = nn.Conv(ba.output_filters, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project_conv")(x)
        x = bn("bn2")(x)

        if ba.id_skip and ba.stride == 1 and ba.input_filters == ba.output_filters:
            if train and drop_connect_rate:
                x = drop_connect(x, self.make_rng("dropout"), drop_connect_rate)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet backbone + classification head, (B, H, W, C) NHWC.

    ``model_name`` ∈ VALID_MODELS; input channel count is inferred from the
    input (the reference reaches in_channels=1 via ``_change_in_channels``,
    model.py:410-419 — unnecessary here).
    """

    model_name: str = "efficientnet-b0"
    num_classes: int = 1000
    include_top: bool = True
    dtype: Any = jnp.float32
    # Override the variant's default rates (the reference's
    # ``from_name(..., **override_params)``, model.py:324-334); None keeps
    # the scaling-table default. dropout_rate/drop_connect_rate=0.0 makes
    # training deterministic (used by the torch trajectory-parity tests).
    dropout_rate: Optional[float] = None
    drop_connect_rate: Optional[float] = None
    # Rematerialize each MBConv block in the backward (jax.checkpoint):
    # trades ~free recompute on the under-utilized MXU for the HBM
    # traffic of the saved 6×-expanded activations. cfg: model.remat.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        overrides = {"include_top": self.include_top}
        if self.dropout_rate is not None:
            overrides["dropout_rate"] = self.dropout_rate
        if self.drop_connect_rate is not None:
            overrides["drop_connect_rate"] = self.drop_connect_rate
        blocks_args, gp = get_model_params(
            self.model_name, num_classes=self.num_classes, **overrides,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=gp.batch_norm_momentum,
            epsilon=gp.batch_norm_epsilon,
            dtype=self.dtype,
            name=name,
        )

        # Stem
        x = nn.Conv(round_filters(32, gp), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv_stem")(x)
        x = nn.silu(bn("bn0")(x))

        # Expand per-stage args into the flat per-block list, mirroring
        # reference model.py:188-203 (first block carries stride/filter jump).
        flat_blocks = []
        for ba in blocks_args:
            ba = ba.replace(
                input_filters=round_filters(ba.input_filters, gp),
                output_filters=round_filters(ba.output_filters, gp),
                num_repeat=round_repeats(ba.num_repeat, gp),
            )
            flat_blocks.append(ba)
            if ba.num_repeat > 1:
                ba = ba.replace(input_filters=ba.output_filters, stride=1)
            for _ in range(ba.num_repeat - 1):
                flat_blocks.append(ba)

        n = len(flat_blocks)
        # Optional per-block rematerialization: recompute the block's
        # activations in the backward instead of saving them. The MXU is
        # ~1% utilized on this backbone (BASELINE.md), so recompute is
        # nearly free, while the saved residuals are the 6×-expanded
        # (B, H, W, 6C) tensors whose HBM traffic bounds the backbone.
        # static_argnums: (self, x, train, drop_connect_rate) → 2, 3.
        block_cls = (nn.remat(MBConvBlock, static_argnums=(2, 3))
                     if self.remat else MBConvBlock)
        for idx, ba in enumerate(flat_blocks):
            rate = gp.drop_connect_rate
            if rate:
                rate *= float(idx) / n  # linearly scaled stochastic depth
            x = block_cls(
                block_args=ba.replace(num_repeat=1),
                bn_momentum=gp.batch_norm_momentum,
                bn_epsilon=gp.batch_norm_epsilon,
                dtype=self.dtype,
                name=f"block_{idx}",
            )(x, train, rate)

        # Head
        x = nn.Conv(round_filters(1280, gp), (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_head")(x)
        x = nn.silu(bn("bn1")(x))

        x = global_avg_pool(x)
        if self.include_top:
            x = nn.Dropout(rate=gp.dropout_rate, deterministic=not train)(x)
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x

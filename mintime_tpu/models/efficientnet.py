"""EfficientNet (B0-B7) feature extractor in Flax, NHWC, TF-SAME padding.

TPU-native rebuild of the reference's vendored backbone
(``models/efficientnet/efficientnet_pytorch/model.py``) with its three local
modifications preserved:

1. ``__call__`` returns the final **feature map** (stem → blocks → head conv
   + BN + swish, no pooling/fc) — reference model.py:267-288. For a 224 input
   on B0 that is ``(N, 7, 7, 1280)``.
2. ``feature tap``: ``tap_block=k`` early-exits after block ``k`` (the head
   conv is applied only when ``k >= num_blocks``) — model.py:301-325.
3. Checkpoint conversion tolerates prefix mismatches via
   :func:`mintime_tpu.utils.torch_convert.strip_prefixes` — model.py:368-378.

Design notes: NHWC layout (TPU conv-friendly); XLA's ``padding='SAME'``
matches the reference's TF-style asymmetric static SAME padding exactly;
depthwise convs use ``feature_group_count``; squeeze-excite stays NHWC with
keepdims mean. BatchNorm uses the TF defaults the reference mirrors
(momentum 0.99, eps 1e-3, utils.py:584+). Stochastic depth (drop-connect)
scales linearly over block index like model.py:279-282.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Any


@dataclass(frozen=True)
class BlockArgs:
    repeats: int
    kernel: int
    stride: int
    expand: int
    in_filters: int
    out_filters: int
    se_ratio: float = 0.25


# B0 baseline architecture (BlockDecoder strings r/k/s/e/i/o in the reference,
# models/efficientnet/efficientnet_pytorch/utils.py:361-455)
B0_BLOCKS: tuple[BlockArgs, ...] = (
    BlockArgs(1, 3, 1, 1, 32, 16),
    BlockArgs(2, 3, 2, 6, 16, 24),
    BlockArgs(2, 5, 2, 6, 24, 40),
    BlockArgs(3, 3, 2, 6, 40, 80),
    BlockArgs(3, 5, 1, 6, 80, 112),
    BlockArgs(4, 5, 2, 6, 112, 192),
    BlockArgs(1, 3, 1, 6, 192, 320),
)

# (width_coefficient, depth_coefficient, resolution, dropout)
SCALING = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """TF channel rounding (reference utils.py round_filters)."""
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def expand_blocks(variant: str) -> list[BlockArgs]:
    """Apply width/depth scaling; one entry per physical block."""
    width, depth, _, _ = SCALING[variant]
    out = []
    for ba in B0_BLOCKS:
        infilt = round_filters(ba.in_filters, width)
        outfilt = round_filters(ba.out_filters, width)
        reps = round_repeats(ba.repeats, depth)
        for r in range(reps):
            out.append(
                BlockArgs(
                    repeats=1,
                    kernel=ba.kernel,
                    stride=ba.stride if r == 0 else 1,
                    expand=ba.expand,
                    in_filters=infilt if r == 0 else outfilt,
                    out_filters=outfilt,
                    se_ratio=ba.se_ratio,
                )
            )
    return out


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with SE (reference model.py:36-135)."""

    args: BlockArgs
    drop_rate: float = 0.0
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dtype: Any = None  # compute dtype (e.g. bf16 on TPU); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.args
        inputs = x
        expanded = a.in_filters * a.expand

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name=name,
            )

        if a.expand != 1:
            x = nn.Conv(expanded, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(x)
            x = jax.nn.silu(bn("bn0")(x))

        x = nn.Conv(
            expanded,
            (a.kernel, a.kernel),
            strides=(a.stride, a.stride),
            padding="SAME",
            feature_group_count=expanded,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = jax.nn.silu(bn("bn1")(x))

        if a.se_ratio and 0 < a.se_ratio <= 1:
            se_ch = max(1, int(a.in_filters * a.se_ratio))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
            s = jax.nn.silu(s)
            s = nn.Conv(expanded, (1, 1), dtype=self.dtype, name="se_expand")(s)
            x = jax.nn.sigmoid(s) * x

        x = nn.Conv(a.out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(x)
        x = bn("bn2")(x)

        if a.stride == 1 and a.in_filters == a.out_filters:
            if train and self.drop_rate > 0:
                # drop-connect / stochastic depth (reference utils.py:129)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x / keep * mask
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """Feature-map EfficientNet. ``__call__`` mirrors the reference's modified
    ``forward`` (model.py:267-288); ``tap_block`` (when set) mirrors
    ``extract_features_at_block`` (model.py:301-325)."""

    variant: str = "efficientnet-b0"
    drop_connect_rate: float = 0.2
    tap_block: int | None = None
    dtype: Any = None  # compute dtype (e.g. bf16 on TPU); params stay fp32

    @property
    def feature_dim(self) -> int:
        width = SCALING[self.variant][0]
        return round_filters(1280, width)

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = SCALING[self.variant][0]
        blocks = expand_blocks(self.variant)
        nblocks = len(blocks)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name=name,
            )

        x = nn.Conv(
            round_filters(32, width),
            (3, 3),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="conv_stem",
        )(x)
        x = jax.nn.silu(bn("bn_stem")(x))

        for idx, ba in enumerate(blocks):
            rate = self.drop_connect_rate * idx / nblocks
            x = MBConvBlock(
                ba, drop_rate=rate, dtype=self.dtype, name=f"block_{idx}"
            )(x, train=train)
            # reference model.py:316-317: stop once idx exceeds the tap
            if self.tap_block is not None and idx > self.tap_block:
                break

        if self.tap_block is None or self.tap_block >= nblocks:
            x = nn.Conv(
                self.feature_dim, (1, 1), use_bias=False, dtype=self.dtype,
                name="conv_head",
            )(x)
            x = jax.nn.silu(bn("bn_head")(x))
        return x

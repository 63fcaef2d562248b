"""Xception feature extractor in Flax, NHWC — the MINTIME-XC backbone.

Rebuild of the reference's SenseTime Xception (``models/xception.py:82-229``)
whose ``forward`` returns the final **pre-ReLU 2048-channel feature map**
(the classifier path is disabled in the reference, xception.py:215-229).
For a 299/224 input the output grid is 10x10/7x7.

Geometry matches torch exactly: entry convs are VALID (pad 0), separable
convs pad 1, and the strided blocks end in a 3x3/stride-2 max-pool with
explicit (1,1) padding (torch's implicit -inf padding == XLA's -inf pad).
BatchNorm uses torch defaults (eps 1e-5; flax momentum 0.9 == torch 0.1).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, both bias-free (reference :17-27)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        return nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pointwise"
        )(x)


class XceptionBlock(nn.Module):
    """Residual block of separable convs (reference :30-79)."""

    in_filters: int
    out_filters: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        inp = x
        layers: list[tuple[int, int]] = []  # (in_ch, out_ch) per separable conv
        if self.grow_first:
            layers.append((self.in_filters, self.out_filters))
            layers += [(self.out_filters, self.out_filters)] * (self.reps - 1)
        else:
            layers += [(self.in_filters, self.in_filters)] * (self.reps - 1)
            layers.append((self.in_filters, self.out_filters))

        for i, (_, out_ch) in enumerate(layers):
            if i > 0 or self.start_with_relu:
                x = jax.nn.relu(x)
            x = SeparableConv(out_ch, dtype=self.dtype, name=f"sep_{i}")(x)
            x = bn(f"bn_{i}")(x)

        if self.stride != 1:
            x = nn.max_pool(
                x,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
            )

        if self.out_filters != self.in_filters or self.stride != 1:
            skip = nn.Conv(
                self.out_filters,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="skip_conv",
            )(inp)
            skip = bn("skip_bn")(skip)
        else:
            skip = inp
        return x + skip


#: (in, out, reps, stride, start_with_relu, grow_first) — reference :111-128
BLOCK_SPECS: tuple[tuple, ...] = (
    (64, 128, 2, 2, False, True),
    (128, 256, 2, 2, True, True),
    (256, 728, 2, 2, True, True),
    *[(728, 728, 3, 1, True, True)] * 8,
    (728, 1024, 2, 2, True, False),
)


class Xception(nn.Module):
    """Feature-map Xception; ``__call__`` mirrors the reference's modified
    ``forward`` (xception.py:161-217): entry flow → 12 blocks → two separable
    exit convs, returning the pre-ReLU ``(N, h, w, 2048)`` map."""

    dtype: Any = None  # compute dtype (e.g. bf16 on TPU); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(bn("bn1")(x))
        x = nn.Conv(64, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = jax.nn.relu(bn("bn2")(x))

        for i, (cin, cout, reps, stride, swr, gf) in enumerate(BLOCK_SPECS):
            x = XceptionBlock(
                cin, cout, reps, stride, swr, gf, dtype=self.dtype, name=f"block_{i + 1}"
            )(x, train=train)

        x = SeparableConv(1536, dtype=self.dtype, name="conv3")(x)
        x = jax.nn.relu(bn("bn3")(x))
        x = SeparableConv(2048, dtype=self.dtype, name="conv4")(x)
        x = bn("bn4")(x)
        return x

"""SlowFast R-50 video classifier in Flax, NTHWC.

The reference pulls this model whole from torch.hub
(``train.py:143-147``: ``facebookresearch/pytorchvideo slowfast_r50`` with
its head replaced by ``Linear(2304, 1)``) — it is the only model family
whose body the reference does not contain (SURVEY.md §2.3). This is a
from-scratch Flax implementation of the standard SlowFast R-50
(Feichtenhofer et al., arXiv:1812.03982) matching pytorchvideo's
configuration so its checkpoints can be ported:

* slow pathway: T/α frames, widths 64→2048; temporal conv (3,1,1) only in
  res4/res5; fast pathway: T frames, β=1/8 widths 8→256, temporal conv in
  every stage.
* lateral fusion after stem/res2/res3/res4: fast → conv(7,1,1) stride
  (α,1,1) to 2·fast_ch, concatenated onto slow.
* head: global avg-pool both pathways → concat 2048+256=2304 → Dense.

Input packing (``slowfast_input_pack``) mirrors the reference transform
(utils.py:144-186): uniform temporal subsample, /255, normalize (0.45,
0.225), short-side scale + center crop, slow = every α-th frame.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ALPHA = 4  # fast/slow frame-rate ratio (utils.py:144)
BETA_INV = 8  # slow/fast channel ratio


class ConvBn3d(nn.Module):
    features: int
    kernel: tuple  # (t, h, w)
    stride: tuple = (1, 1, 1)
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, h, w = self.kernel
        x = nn.Conv(
            self.features,
            (t, h, w),
            strides=self.stride,
            padding=((t // 2, t // 2), (h // 2, h // 2), (w // 2, w // 2)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return jax.nn.relu(x) if self.relu else x


class Bottleneck3d(nn.Module):
    """1x1x1 (optionally temporal) → 1x3x3 → 1x1x1 with residual."""

    inner: int
    out: int
    temporal_a: int  # temporal kernel of conv_a (1 or 3)
    spatial_stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBn3d(self.inner, (self.temporal_a, 1, 1), dtype=self.dtype,
                     name="conv_a")(x, train)
        y = ConvBn3d(
            self.inner, (1, 3, 3), stride=(1, self.spatial_stride, self.spatial_stride),
            dtype=self.dtype, name="conv_b",
        )(y, train)
        y = ConvBn3d(self.out, (1, 1, 1), relu=False, dtype=self.dtype,
                     name="conv_c")(y, train)
        if residual.shape[-1] != self.out or self.spatial_stride != 1:
            residual = ConvBn3d(
                self.out, (1, 1, 1),
                stride=(1, self.spatial_stride, self.spatial_stride),
                relu=False, dtype=self.dtype, name="shortcut",
            )(x, train)
        return jax.nn.relu(y + residual)


class ResStage3d(nn.Module):
    blocks: int
    inner: int
    out: int
    temporal_a: int
    spatial_stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.blocks):
            x = Bottleneck3d(
                self.inner,
                self.out,
                self.temporal_a,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train)
        return x


class LateralFusion(nn.Module):
    """fast → conv(7,1,1)/stride(α,1,1) to 2x channels, concat onto slow."""

    fast_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        lat = ConvBn3d(
            self.fast_channels * 2, (7, 1, 1), stride=(ALPHA, 1, 1),
            dtype=self.dtype, name="fuse",
        )(fast, train)
        return jnp.concatenate([slow, lat], axis=-1)


class SlowFastR50(nn.Module):
    """(slow (B,T/α,H,W,3), fast (B,T,H,W,3)) → logits (B, num_classes)."""

    num_classes: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        d = self.dtype
        # stems
        s = ConvBn3d(64, (1, 7, 7), stride=(1, 2, 2), dtype=d, name="slow_stem")(slow, train)
        f = ConvBn3d(8, (5, 7, 7), stride=(1, 2, 2), dtype=d, name="fast_stem")(fast, train)

        def pool(x):
            return nn.max_pool(
                x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
            )

        s, f = pool(s), pool(f)
        s = LateralFusion(8, dtype=d, name="fuse_stem")(s, f, train)

        # (blocks, slow_inner, slow_out, fast_inner, fast_out, slow_temporal)
        stages = (
            (3, 64, 256, 8, 32, 1),
            (4, 128, 512, 16, 64, 1),
            (6, 256, 1024, 32, 128, 3),
            (3, 512, 2048, 64, 256, 3),
        )
        for idx, (blocks, s_in, s_out, f_in, f_out, s_t) in enumerate(stages):
            stride = 1 if idx == 0 else 2
            s = ResStage3d(blocks, s_in, s_out, s_t, spatial_stride=stride,
                           dtype=d, name=f"slow_res{idx + 2}")(s, train)
            f = ResStage3d(blocks, f_in, f_out, 3, spatial_stride=stride,
                           dtype=d, name=f"fast_res{idx + 2}")(f, train)
            if idx < 3:
                s = LateralFusion(f_out, dtype=d, name=f"fuse_res{idx + 2}")(s, f, train)

        s = jnp.mean(s, axis=(1, 2, 3))
        f = jnp.mean(f, axis=(1, 2, 3))
        x = jnp.concatenate([s, f], axis=-1)  # 2304
        x = nn.Dense(self.num_classes, dtype=d, name="proj")(x)
        return x.astype(jnp.float32)


class SlowFastClassifier(nn.Module):
    """Face-sequence front end for SlowFast (the reference trains SlowFast on
    the same DeepFakesDataset crop sequences, train.py:143-147 + 335-337):
    raw 0..255 frames (B, F, H, W, 3) → normalize → uniform temporal
    upsample to ``num_frames`` → pathway packing → SlowFastR50 logits.

    Keeps the driver-level transform (utils.py:144-186) on device so the
    whole step is one XLA program. The ``head`` attribute mirrors
    MintimeVideoClassifier so the shared train step can route inputs.
    """

    num_classes: int = 1
    num_frames: int = 32
    mean: float = 0.45
    std: float = 0.225
    side_size: int = 256
    crop_size: int = 256
    dtype: Any = None
    head: str = "slowfast"

    @nn.compact
    def __call__(self, frames, train: bool = False):
        B, F, H, W = frames.shape[:4]
        x = frames.astype(jnp.float32) / 255.0
        x = (x - self.mean) / self.std
        # short-side scale + center crop on device (utils.py:144-186 applies
        # ShortSideScale(256) + CenterCrop(256) after normalize)
        if min(H, W) != self.side_size:
            # pytorchvideo ShortSideScale: short side = size, long side
            # floored (functional.py int(math.floor(...))), bilinear
            if H < W:
                nh, nw = self.side_size, int(np.floor(W * self.side_size / H))
            else:
                nh, nw = int(np.floor(H * self.side_size / W)), self.side_size
            x = jax.image.resize(x, (B, F, nh, nw, 3), method="bilinear")
            H, W = nh, nw
        if (H, W) != (self.crop_size, self.crop_size):
            y0 = max(0, (H - self.crop_size) // 2)
            x0 = max(0, (W - self.crop_size) // 2)
            x = x[:, :, y0 : y0 + self.crop_size, x0 : x0 + self.crop_size]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # pytorchvideo UniformTemporalSubsample / PackPathway index with
        # .long() — TRUNCATION, not rounding (transforms/functional.py;
        # utils.py:169,181)
        idx = jnp.linspace(0, F - 1, self.num_frames).astype(jnp.int32)
        fast = jnp.take(x, idx, axis=1)
        slow_idx = jnp.linspace(
            0, self.num_frames - 1, self.num_frames // ALPHA
        ).astype(jnp.int32)
        slow = jnp.take(fast, slow_idx, axis=1)
        return SlowFastR50(self.num_classes, dtype=self.dtype, name="slowfast")(
            slow, fast, train=train
        )


def uniform_temporal_subsample(frames: np.ndarray, num: int) -> np.ndarray:
    """pytorchvideo UniformTemporalSubsample semantics (utils.py:169):
    ``linspace(0, t-1, num).long()`` — truncation, not rounding."""
    t = frames.shape[0]
    idx = np.linspace(0, t - 1, num).astype(int)
    return frames[idx]


def short_side_scale(frames: np.ndarray, size: int) -> np.ndarray:
    """pytorchvideo ShortSideScale: the long side is FLOORed (functional.py
    ``int(math.floor(...))``), bilinear."""
    import cv2

    t, h, w = frames.shape[:3]
    if min(h, w) == size:
        return frames
    if h < w:
        nh, nw = size, int(np.floor(w * size / h))
    else:
        nh, nw = int(np.floor(h * size / w)), size
    return np.stack(
        [cv2.resize(fr, (nw, nh), interpolation=cv2.INTER_LINEAR) for fr in frames]
    )


def center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    h, w = frames.shape[1:3]
    y = max(0, (h - size) // 2)
    x = max(0, (w - size) // 2)
    return frames[:, y : y + size, x : x + size]


def slowfast_input_pack(
    frames: np.ndarray,
    num_frames: int = 32,
    crop_size: int = 256,
    side_size: int = 256,
    mean: float = 0.45,
    std: float = 0.225,
):
    """Video frames (T,H,W,3 uint8) → (slow, fast) model inputs
    (utils.py:144-186: subsample, /255, normalize, scale, crop, PackPathway)."""
    x = uniform_temporal_subsample(frames, num_frames).astype(np.float32) / 255.0
    x = (x - mean) / std
    x = short_side_scale(x, side_size)
    x = center_crop(x, crop_size)
    fast = x
    slow = uniform_temporal_subsample(x, num_frames // ALPHA)
    return slow[None], fast[None]

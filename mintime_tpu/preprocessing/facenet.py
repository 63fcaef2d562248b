"""InceptionResnetV1 face embedder in Flax (facenet-pytorch architecture).

TPU-native replacement for the reference's identity-clustering embedder
(``preprocessing/cluster_faces.py:84-92``: crops resized to 128x128,
``fixed_image_standardization`` = (x-127.5)/128, InceptionResnetV1
pretrained on VGGFace2, L2-normalized 512-d embeddings). Weights load from
facenet-pytorch state_dicts via :func:`facenet_params_from_torch`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBn(nn.Module):
    """conv(no bias) + BN(eps 1e-3) + ReLU — facenet-pytorch BasicConv2d."""

    features: int
    kernel: tuple
    stride: int = 1
    pad: Any = "VALID"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=self.pad,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return jax.nn.relu(x)


class Block35(nn.Module):
    """Inception-ResNet-A (facenet-pytorch Block35), scale 0.17."""

    scale: float = 0.17
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBn(32, (1, 1), dtype=self.dtype, name="branch0")(x, train)
        b1 = ConvBn(32, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = ConvBn(32, (3, 3), pad="SAME", dtype=self.dtype, name="branch1_1")(b1, train)
        b2 = ConvBn(32, (1, 1), dtype=self.dtype, name="branch2_0")(x, train)
        b2 = ConvBn(32, (3, 3), pad="SAME", dtype=self.dtype, name="branch2_1")(b2, train)
        b2 = ConvBn(32, (3, 3), pad="SAME", dtype=self.dtype, name="branch2_2")(b2, train)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(256, (1, 1), dtype=self.dtype, name="conv2d")(mixed)
        return jax.nn.relu(x + up * self.scale)


class Block17(nn.Module):
    """Inception-ResNet-B, scale 0.10."""

    scale: float = 0.10
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBn(128, (1, 1), dtype=self.dtype, name="branch0")(x, train)
        b1 = ConvBn(128, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = ConvBn(128, (1, 7), pad="SAME", dtype=self.dtype, name="branch1_1")(b1, train)
        b1 = ConvBn(128, (7, 1), pad="SAME", dtype=self.dtype, name="branch1_2")(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(896, (1, 1), dtype=self.dtype, name="conv2d")(mixed)
        return jax.nn.relu(x + up * self.scale)


class Block8(nn.Module):
    """Inception-ResNet-C, scale 0.20."""

    scale: float = 0.20
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBn(192, (1, 1), dtype=self.dtype, name="branch0")(x, train)
        b1 = ConvBn(192, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = ConvBn(192, (1, 3), pad="SAME", dtype=self.dtype, name="branch1_1")(b1, train)
        b1 = ConvBn(192, (3, 1), pad="SAME", dtype=self.dtype, name="branch1_2")(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(1792, (1, 1), dtype=self.dtype, name="conv2d")(mixed)
        out = x + up * self.scale
        return jax.nn.relu(out) if self.relu else out


class Mixed6a(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBn(384, (3, 3), stride=2, dtype=self.dtype, name="branch0")(x, train)
        b1 = ConvBn(192, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = ConvBn(192, (3, 3), pad="SAME", dtype=self.dtype, name="branch1_1")(b1, train)
        b1 = ConvBn(256, (3, 3), stride=2, dtype=self.dtype, name="branch1_2")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed7a(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBn(256, (1, 1), dtype=self.dtype, name="branch0_0")(x, train)
        b0 = ConvBn(384, (3, 3), stride=2, dtype=self.dtype, name="branch0_1")(b0, train)
        b1 = ConvBn(256, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = ConvBn(256, (3, 3), stride=2, dtype=self.dtype, name="branch1_1")(b1, train)
        b2 = ConvBn(256, (1, 1), dtype=self.dtype, name="branch2_0")(x, train)
        b2 = ConvBn(256, (3, 3), pad="SAME", dtype=self.dtype, name="branch2_1")(b2, train)
        b2 = ConvBn(256, (3, 3), stride=2, dtype=self.dtype, name="branch2_2")(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    """512-d face embedding network; output is L2-normalized like
    facenet-pytorch with ``classify=False``."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBn(32, (3, 3), stride=2, dtype=d, name="conv2d_1a")(x, train)
        x = ConvBn(32, (3, 3), dtype=d, name="conv2d_2a")(x, train)
        x = ConvBn(64, (3, 3), pad="SAME", dtype=d, name="conv2d_2b")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBn(80, (1, 1), dtype=d, name="conv2d_3b")(x, train)
        x = ConvBn(192, (3, 3), dtype=d, name="conv2d_4a")(x, train)
        x = ConvBn(256, (3, 3), stride=2, dtype=d, name="conv2d_4b")(x, train)
        for i in range(5):
            x = Block35(dtype=d, name=f"repeat_1_{i}")(x, train)
        x = Mixed6a(dtype=d, name="mixed_6a")(x, train)
        for i in range(10):
            x = Block17(dtype=d, name=f"repeat_2_{i}")(x, train)
        x = Mixed7a(dtype=d, name="mixed_7a")(x, train)
        for i in range(5):
            x = Block8(dtype=d, name=f"repeat_3_{i}")(x, train)
        x = Block8(relu=False, scale=1.0, dtype=d, name="block8")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool
        x = nn.Dense(512, use_bias=False, dtype=d, name="last_linear")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            use_scale=True,
            use_bias=True,
            dtype=d,
            name="last_bn",
        )(x)
        x = x.astype(jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def fixed_image_standardization(x):
    """(x - 127.5) / 128 — facenet-pytorch normalization used by the
    reference clustering step (cluster_faces.py:88)."""
    return (jnp.asarray(x, jnp.float32) - 127.5) / 128.0


def facenet_params_from_torch(state_dict) -> dict:
    """Map a facenet-pytorch InceptionResnetV1 state_dict to our variables."""
    from mintime_tpu.utils.torch_convert import _bn, _conv, _np, strip_prefixes

    sd = strip_prefixes(state_dict)
    params: dict = {}
    stats: dict = {}

    def convbn(flax_name, torch_name):
        p = {"conv": _conv(sd, f"{torch_name}.conv")}
        p["bn"], s = _bn(sd, f"{torch_name}.bn")
        params_level[flax_name] = p
        stats_level[flax_name] = {"bn": s}

    # top-level stem
    params_level, stats_level = params, stats
    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b", "conv2d_4a", "conv2d_4b"):
        convbn(name, name)

    def block(flax_name, torch_name, branches, features):
        p: dict = {}
        s: dict = {}
        for fl, tn in branches.items():
            sub = {"conv": _conv(sd, f"{torch_name}.{tn}.conv")}
            bnp, bns = _bn(sd, f"{torch_name}.{tn}.bn")
            sub["bn"] = bnp
            p[fl] = sub
            s[fl] = {"bn": bns}
        if features:
            p["conv2d"] = _conv(sd, f"{torch_name}.conv2d")
        params[flax_name] = p
        stats[flax_name] = s

    b35 = {"branch0": "branch0", "branch1_0": "branch1.0", "branch1_1": "branch1.1",
           "branch2_0": "branch2.0", "branch2_1": "branch2.1", "branch2_2": "branch2.2"}
    for i in range(5):
        block(f"repeat_1_{i}", f"repeat_1.{i}", b35, True)
    block("mixed_6a", "mixed_6a",
          {"branch0": "branch0", "branch1_0": "branch1.0", "branch1_1": "branch1.1",
           "branch1_2": "branch1.2"}, False)
    b17 = {"branch0": "branch0", "branch1_0": "branch1.0", "branch1_1": "branch1.1",
           "branch1_2": "branch1.2"}
    for i in range(10):
        block(f"repeat_2_{i}", f"repeat_2.{i}", b17, True)
    block("mixed_7a", "mixed_7a",
          {"branch0_0": "branch0.0", "branch0_1": "branch0.1", "branch1_0": "branch1.0",
           "branch1_1": "branch1.1", "branch2_0": "branch2.0", "branch2_1": "branch2.1",
           "branch2_2": "branch2.2"}, False)
    b8 = {"branch0": "branch0", "branch1_0": "branch1.0", "branch1_1": "branch1.1",
          "branch1_2": "branch1.2"}
    for i in range(5):
        block(f"repeat_3_{i}", f"repeat_3.{i}", b8, True)
    block("block8", "block8", b8, True)

    params["last_linear"] = {"kernel": _np(sd["last_linear.weight"]).T}
    bnp, bns = _bn(sd, "last_bn")
    params["last_bn"] = bnp
    stats["last_bn"] = {}  # placed below
    stats["last_bn"] = bns
    return {"params": params, "batch_stats": stats}

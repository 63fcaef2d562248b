"""Frame-level EfficientNet-B0 + MLP baseline head (reference
``models/baseline.py:15-37``).

Global-average-pools the backbone feature map and applies two stacked Linear
layers (the reference has no nonlinearity between them — kept faithfully).
The video-level logit is the mean over the F per-face logits, which the
reference computes in the driver (train.py:350-352, test.py:243-244) and we
expose as :func:`video_logits`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mintime_tpu.config import ModelConfig


class Baseline(nn.Module):
    """Per-face MLP head over NHWC feature maps ``(N, h, w, C)``."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, mask=None):
        x = jnp.mean(x, axis=(1, 2))  # adaptive-avg-pool to (N, C)
        x = nn.Dense(self.config.mlp_dim, name="mlp_0")(x)
        return nn.Dense(self.config.num_classes, name="mlp_1")(x)


def video_logits(face_logits: jnp.ndarray, batch: int, num_frames: int) -> jnp.ndarray:
    """Mean per-face logits into one video logit (train.py:350-352)."""
    return face_logits.reshape(batch, num_frames, -1).mean(axis=1)

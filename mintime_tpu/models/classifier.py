"""End-to-end video classifier: CNN backbone + head in ONE XLA program.

The reference runs the extractor and the transformer as two separate torch
calls with a host round-trip between them (train.py:344-355). Here the whole
per-step compute — per-face backbone over ``(B*F, H, W, 3)``, reshape, and
the video head — is a single jitted function, so XLA fuses the feature
hand-off and nothing touches the host.

``backbone='none'`` accepts pre-extracted feature maps directly (the
reference's offline ``extract_features.py`` path).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mintime_tpu.config import ModelConfig
from mintime_tpu.models.baseline import Baseline, video_logits
from mintime_tpu.models.efficientnet import EfficientNet
from mintime_tpu.models.timesformer import SizeInvariantTimeSformer
from mintime_tpu.models.xception import Xception

BACKBONES = ("efficientnet-b0", "xception", "none")
HEADS = ("timesformer", "baseline")


class MintimeVideoClassifier(nn.Module):
    """Flagship model: frames ``(B, F, H, W, 3)`` → video logits ``(B, 1)``.

    Mirrors the driver-level composition in the reference (train.py:120-148:
    extractor choice 0/1 + model choice 0/1) as one Flax module.
    """

    config: ModelConfig
    backbone: str = "efficientnet-b0"
    head: str = "timesformer"
    require_attention: bool = False
    freeze_backbone: bool = False
    dtype: Any = None  # compute dtype; bf16 recommended on TPU
    use_pallas: bool = False  # fused Pallas attention in the TimeSformer head

    @nn.compact
    def __call__(
        self,
        frames,  # (B, F, H, W, 3) normalized images, or feature maps if backbone='none'
        mask=None,
        identities_mask=None,
        size_embedding=None,
        positions=None,
        train: bool = False,
    ):
        B, F = frames.shape[:2]
        if self.backbone == "none":
            feats = frames
        else:
            x = frames.reshape((B * F,) + frames.shape[2:])
            if self.dtype is not None:
                x = x.astype(self.dtype)
            elif not jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(jnp.float32)  # uint8 batches from the loader
            bb_train = train and not self.freeze_backbone
            if self.backbone == "efficientnet-b0":
                bb = EfficientNet("efficientnet-b0", dtype=self.dtype, name="extractor")
            elif self.backbone == "xception":
                bb = Xception(dtype=self.dtype, name="extractor")
            else:
                raise ValueError(f"unknown backbone {self.backbone}")
            feats = bb(x, train=bb_train)
            if self.freeze_backbone:
                feats = jax.lax.stop_gradient(feats)
            feats = feats.reshape((B, F) + feats.shape[1:])

        if self.head == "baseline":
            face_logits = Baseline(self.config, name="head")(
                feats.reshape((B * F,) + feats.shape[2:])
            )
            return video_logits(face_logits, B, F).astype(jnp.float32)

        out = SizeInvariantTimeSformer(
            self.config,
            require_attention=self.require_attention,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="head",
        )(
            feats,
            mask=mask,
            identities_mask=identities_mask,
            size_embedding=size_embedding,
            positions=positions,
            deterministic=not train,
        )
        if self.require_attention:
            logits, attns = out
            return logits.astype(jnp.float32), attns
        return out.astype(jnp.float32)

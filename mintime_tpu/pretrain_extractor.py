"""Frame-level extractor pretraining recipe.

Replacement for the reference's vendored (and non-runnable — it imports a
module absent from its tree, cross-efficient-vit/train.py:16) prior-work
subproject used to pretrain the EfficientNet-B0 feature extractor on
DFDC/FF++ at frame level (SURVEY.md §L7). Provides:

* a frame-level binary classifier = EfficientNet-B0 + pooled linear head;
* class rebalancing by sampling fraction (``rebalancing_real`` /
  ``rebalancing_fake``, cross-efficient-vit/configs/architecture.yaml:9-11);
* ``custom_video_round`` video aggregation: any frame prob > 0.55 ⇒ fake,
  else mean (cross-efficient-vit/utils.py:79-83);
* export of the trained backbone in our checkpoint format, loadable as the
  MINTIME extractor.
"""

from __future__ import annotations

import random
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class FrameClassifier(nn.Module):
    """EfficientNet-B0 features → global pool → 1 logit per frame."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mintime_tpu.models.efficientnet import EfficientNet

        feats = EfficientNet("efficientnet-b0", dtype=self.dtype, name="extractor")(
            x, train=train
        )
        pooled = jnp.mean(feats, axis=(1, 2))
        return nn.Dense(1, name="fc")(pooled).astype(jnp.float32)


def rebalance_frames(
    paths: Sequence[str],
    labels: Sequence[int],
    rebalancing_real: float = 1.0,
    rebalancing_fake: float = 0.3,
    seed: int = 42,
) -> tuple[list[str], list[int]]:
    """Subsample each class by its rebalancing fraction
    (cross-efficient-vit/train.py:44-122 sampling behavior)."""
    rnd = random.Random(seed)
    out_p, out_l = [], []
    by_class = {0: [], 1: []}
    for p, l in zip(paths, labels):
        by_class[int(l)].append(p)
    for cls, frac in ((0, rebalancing_real), (1, rebalancing_fake)):
        keep = rnd.sample(by_class[cls], int(len(by_class[cls]) * frac))
        out_p += keep
        out_l += [cls] * len(keep)
    order = list(range(len(out_p)))
    rnd.shuffle(order)
    return [out_p[i] for i in order], [out_l[i] for i in order]


def custom_video_round(frame_probs: Sequence[float], threshold: float = 0.55) -> float:
    """Any frame above threshold ⇒ that prob; else mean
    (cross-efficient-vit/utils.py:79-83)."""
    probs = np.asarray(frame_probs, dtype=np.float64)
    for p in probs:
        if p > threshold:
            return float(p)
    return float(probs.mean()) if len(probs) else 0.0


def export_extractor(params: dict, batch_stats: dict, path: str):
    """Save just the backbone variables in our orbax layout so train_loop's
    ``--extractor_weights`` can consume them."""
    import orbax.checkpoint as ocp
    import os

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {
                "params": params["extractor"],
                "batch_stats": batch_stats.get("extractor", {}),
            },
            force=True,
        )

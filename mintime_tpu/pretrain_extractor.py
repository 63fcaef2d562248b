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
    """EfficientNet-B0 features → global pool → 1 logit per frame.

    ``head = "frame"`` lets the shared train-step machinery
    (:func:`mintime_tpu.train.model_inputs`) route frame-only batches.
    """

    dtype: jnp.dtype | None = None
    head: str = "frame"

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
    """Save the trained backbone as a reference-format torch state dict
    (``Extractor_checkpoint*`` keys) so both our ``--extractor_weights``
    path (utils/checkpoint.load_model_variables) and the reference's
    ``load_matching_state_dict`` can consume it."""
    import torch

    from mintime_tpu.utils.torch_convert import efficientnet_params_to_torch

    sd = efficientnet_params_to_torch(
        {
            "params": params["extractor"],
            "batch_stats": batch_stats.get("extractor", {}),
        }
    )
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        path,
    )


# ---------------------------------------------------------------------------
# Frame sampling + pipeline (cross-efficient-vit/train.py:44-122)
# ---------------------------------------------------------------------------


def collect_frames(
    videos: Sequence[str],
    labels: Sequence[float],
    data_path: str,
    frames_per_video: int = 30,
    rebalancing_real: float = 1.0,
    rebalancing_fake: float = 0.3,
    validation: bool = False,
) -> tuple[list[str], list[float]]:
    """Per-video frame-path sampling with class rebalancing.

    Reference semantics (cross-efficient-vit/train.py:85-117): per video,
    ``min_frames = max(int(frames_per_video * rebalancing[label]), 1)``
    (validation: ``int(max(min_frames / 8, 2))``), then an interval
    subsample of the face-0 crops. NB the reference's stride condition
    compares against the dict length (train.py:105, always 1 face group) so
    its stride never actually applies and it keeps the FIRST ``min_frames``
    crops; we spread them uniformly instead — documented in PARITY.md.
    """
    import glob
    import os

    out_p: list[str] = []
    out_l: list[float] = []
    for video, label in zip(videos, labels):
        rebal = rebalancing_real if int(label) == 0 else rebalancing_fake
        min_frames = max(int(frames_per_video * rebal), 1)
        if validation:
            min_frames = int(max(min_frames / 8, 2))
        faces = sorted(
            glob.glob(os.path.join(data_path, video, "**", "*_0.png"),
                      recursive=True)
        )
        if not faces:
            continue
        interval = len(faces) // min_frames
        if interval > 1:
            faces = faces[::interval]
        faces = faces[:min_frames]
        out_p += faces
        out_l += [float(label)] * len(faces)
    return out_p, out_l


class FramesDataset:
    """Frame-level dataset over face-crop paths; batches via the shared
    loader collate contract (frames/labels keys)."""

    def __init__(self, paths, labels, image_size: int, mode: str = "train",
                 augmentation: str = "min", seed: int = 42):
        from mintime_tpu.data.augment import (
            create_train_transforms,
            create_val_transform,
        )

        self.paths = list(paths)
        self.labels = list(labels)
        self.image_size = image_size
        self.mode = mode
        self._transform = (
            create_train_transforms(image_size, augmentation)
            if mode == "train"
            else create_val_transform(image_size)
        )
        self.seed = seed

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> dict:
        import cv2

        img = cv2.imread(self.paths[index])
        if img is None:
            raise FileNotFoundError(self.paths[index])
        rng = np.random.default_rng((self.seed, index))
        frame = self._transform([img], rng)[0]
        return {
            "frames": frame.astype(np.uint8),
            "labels": np.float32(self.labels[index]),
        }


def main(argv=None):
    """Frame-level extractor pretraining CLI
    (cross-efficient-vit/train.py:126-322 parity on the jitted SPMD step).

    Consumes the MINTIME manifests + faces layout, trains
    :class:`FrameClassifier` with BCE/pos_weight + SGD/StepLR, early-stops
    on validation loss, reports ``custom_video_round`` video-level accuracy,
    and exports the best backbone as a reference-format
    ``Extractor_checkpoint`` consumable by ``--extractor_weights``.
    """
    import argparse
    import math
    import os

    import jax

    from mintime_tpu.config import load_config
    from mintime_tpu.data.loader import DataLoader
    from mintime_tpu.data.manifest import load_manifest
    from mintime_tpu.parallel.mesh import make_mesh
    from mintime_tpu.train import create_train_state, jit_steps

    p = argparse.ArgumentParser("mintime-tpu extractor pretraining")
    p.add_argument("--config", default="configs/extractor_pretraining.yaml")
    p.add_argument("--train_list_file", required=True)
    p.add_argument("--validation_list_file", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--num_epochs", type=int, default=300)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--max_videos", type=int, default=-1)
    p.add_argument("--models_output_path", default="models_out")
    p.add_argument("--random_state", type=int, default=42)
    opt = p.parse_args(argv)

    cfg = load_config(opt.config)
    t = cfg.training
    train_man = load_manifest(opt.train_list_file, data_path=opt.data_path,
                              max_videos=opt.max_videos)
    val_man = load_manifest(opt.validation_list_file, data_path=opt.data_path,
                            max_videos=opt.max_videos)
    tr_p, tr_l = collect_frames(
        train_man.videos, train_man.labels, opt.data_path,
        t.frames_per_video, t.rebalancing_real, t.rebalancing_fake,
    )
    va_p, va_l = collect_frames(
        val_man.videos, val_man.labels, opt.data_path,
        t.frames_per_video, t.rebalancing_real, t.rebalancing_fake,
        validation=True,
    )
    pos = sum(1 for l in tr_l if l == 1)
    neg = len(tr_l) - pos
    pos_weight = neg / max(pos, 1)  # class_weights (train.py:203)
    print(f"Train images: {len(tr_p)} Validation images: {len(va_p)} "
          f"(0s: {neg} 1s: {pos}) pos_weight {pos_weight:.4f}")

    # the batch axis must divide the data-parallel mesh
    ndev = len(jax.devices())
    import math as _math

    mesh = make_mesh(jax.devices()[: _math.gcd(t.bs, ndev)])
    mk = lambda paths, labels, mode: FramesDataset(
        paths, labels, cfg.model.image_size, mode=mode,
        augmentation=t.augmentation, seed=opt.random_state,
    )
    train_loader = DataLoader(mk(tr_p, tr_l, "train"), t.bs,
                              num_workers=opt.workers, mesh=mesh,
                              seed=opt.random_state, drop_last=True)
    val_loader = DataLoader(mk(va_p, va_l, "val"), t.bs, shuffle=False,
                            num_workers=opt.workers, mesh=mesh, drop_last=True)

    import jax.numpy as jnp

    model = FrameClassifier(dtype=jnp.bfloat16)
    example = next(iter(DataLoader(mk(va_p, va_l, "val"), t.bs, shuffle=False,
                                   num_workers=1, drop_last=True)))
    state = create_train_state(
        jax.random.key(opt.random_state), model, example, cfg,
        steps_per_epoch=len(train_loader), num_epochs=opt.num_epochs,
    )
    train_step, eval_step = jit_steps(model, mesh, pos_weight)

    from mintime_tpu.utils.checkpoint import save_train_state

    os.makedirs(opt.models_output_path, exist_ok=True)
    rng = jax.random.key(opt.random_state)
    not_improved, previous = 0, math.inf
    best_path = None
    with jax.set_mesh(mesh):
        for epoch in range(opt.num_epochs + 1):
            if not_improved == opt.patience:
                break
            tot = correct = count = 0.0
            for batch in train_loader:
                state, m = train_step(state, batch, rng)
                tot += float(m["loss"])
                correct += int(m["correct"])
                count += int(m["count"])
            train_loss = tot / max(len(train_loader), 1)
            train_acc = correct / max(count, 1)

            # frame-level val loss + custom_video_round video accuracy
            vtot, all_probs = 0.0, []
            for batch in val_loader:
                out = eval_step(state, batch)
                vtot += float(out["loss"])
                all_probs += (1 / (1 + np.exp(-np.asarray(out["logits"])))).tolist()
            val_loss = vtot / max(len(val_loader), 1)
            vids, vcorrect = 0, 0
            by_video: dict = {}
            vlabels = dict(zip(val_man.videos, val_man.labels))
            # Manifest video names may be nested ('method/video_id', common
            # for DFDC/FF++ lists): match each frame path against the known
            # names component-prefix-wise instead of assuming one component.
            depths = sorted({len(v.split(os.sep)) for v in vlabels} or {1})
            for path, prob in zip(va_p[: len(all_probs)], all_probs):
                rel = os.path.relpath(path, opt.data_path)
                parts = rel.split(os.sep)
                key = next(
                    (os.sep.join(parts[:d]) for d in depths
                     if os.sep.join(parts[:d]) in vlabels),
                    parts[0],
                )
                by_video.setdefault(key, []).append(prob)
            if by_video and not (by_video.keys() & vlabels.keys()):
                print("warning: no frame path maps to a manifest video name; "
                      "video_round_acc will be 0 (check --data_path layout)")
            for key, probs in by_video.items():
                if key not in vlabels:
                    continue
                pred = custom_video_round(probs)
                vids += 1
                vcorrect += int((pred > 0.55) == (vlabels[key] == 1))
            video_acc = vcorrect / max(vids, 1)
            print(f"#{epoch}/{opt.num_epochs} loss:{train_loss:.4f} "
                  f"accuracy:{train_acc:.4f} val_loss:{val_loss:.4f} "
                  f"video_round_acc:{video_acc:.4f}")

            if previous <= val_loss:
                not_improved += 1
            else:
                not_improved = 0
                save_train_state(opt.models_output_path, state, step=epoch)
                best_path = os.path.join(
                    opt.models_output_path, f"Extractor_checkpoint{epoch}"
                )
                export_extractor(state.params, state.batch_stats, best_path)
            previous = val_loss
    if best_path:
        print(f"best extractor exported: {best_path}")
    return best_path


if __name__ == "__main__":
    main()

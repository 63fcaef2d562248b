"""Dataset: reference on-disk face-crop layout → fixed-shape device batches.

Consumes the exact layout the preprocessing chain produces
(``faces/<split>/<class>/<video>/<identity_k>/<frame>_<face>.png`` with
unclustered "discarded" crops loose in the video folder — SURVEY.md §L1/L2),
so datasets prepared for the reference drop in unchanged.

Everything ragged happens here on the host via the pure
:mod:`mintime_tpu.data.assembler`; a sample is a dict of fixed-shape numpy
arrays ready for ``jax.device_put`` with the batch axis sharded on the
``data`` mesh axis.

Divergences from ``deepfakes_dataset.py`` (documented, intended-behavior):
* mask is 0 for dummy pads (predict.py:300-306 semantics; the reference
  train dataset accidentally emits all-ones, :284-287) — set
  ``legacy_all_ones_mask=True`` for bit-compat.
* identity mean face size is read from the crop file header via cv2
  (reference uses python-magic, deepfakes_dataset.py:114).
* video frame dimensions for the size buckets come from (in priority order)
  an explicit ``video_dims`` mapping, a ``video_dims.json`` sidecar written
  by :mod:`mintime_tpu.preprocessing.extract_crops` into the video's crop
  folder, or probing the original .mp4 under ``video_path`` with the
  reference's ``<root>/<mode>/<video_id>.mp4`` layout and val→train fallback
  (deepfakes_dataset.py:202-206,250-253 — the reference re-opens the video
  per identity per sample; we probe once and cache). If none is available
  the dataset raises, since wrong dimensions silently corrupt the size
  embedding — the model's namesake feature; pass ``default_video_dims`` to
  opt into a fixed assumption (synthetic data).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Mapping, Sequence

import cv2
import numpy as np

from mintime_tpu.data.assembler import (
    IdentityFaces,
    SequencePlan,
    build_sequence_plan,
    size_bucket,
)
from mintime_tpu.data.augment import Compose, create_train_transforms, create_val_transform

_FRAME_RE = re.compile(r"^(\d+)_(\d+)")
_CROP_EXTS = (".png", ".jpg", ".jpeg", ".bmp")
DIMS_SIDECAR = "video_dims.json"
MODES = ("train", "val", "test")


def _frame_of(path: str) -> int:
    m = _FRAME_RE.match(os.path.basename(path))
    return int(m.group(1)) if m else 0


def _frame_face_of(name: str) -> tuple[int, int]:
    """(frame_idx, face_idx) from a ``<frame>_<face>.png`` crop name."""
    m = _FRAME_RE.match(os.path.basename(name))
    return (int(m.group(1)), int(m.group(2))) if m else (0, 0)


def read_sidecar_json(video_dir: str) -> dict | None:
    """Raw ``video_dims.json`` sidecar dict extract_crops writes."""
    import json

    p = os.path.join(video_dir, DIMS_SIDECAR)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def read_dims_sidecar(video_dir: str) -> tuple[int, int] | None:
    """Read the ``video_dims.json`` sidecar extract_crops writes (w, h)."""
    d = read_sidecar_json(video_dir)
    if not d:
        return None
    try:
        return int(d["width"]), int(d["height"])
    except (KeyError, ValueError, TypeError):
        return None


def resolve_original_video(video_root: str, faces_dir: str) -> str | None:
    """Locate the original ``.mp4`` for a faces folder the reference way:
    ``<video_root>/<mode>/<video_id>[.mp4]`` where ``video_id`` is the part
    of the faces path after the split folder, with the val→train fallback
    (deepfakes_dataset.py:194-206)."""
    norm = faces_dir.replace("\\", os.sep)
    mode = next((m for m in MODES if m + os.sep in norm or norm.startswith(m + os.sep)), None)
    if mode is None:
        candidates = [os.path.join(video_root, norm)]
    else:
        video_id = norm.split(mode + os.sep, 1)[1]
        candidates = [os.path.join(video_root, mode, video_id)]
        if mode == "val":
            candidates.append(os.path.join(video_root, "train", video_id))
    for c in candidates:
        for p in (c if c.endswith(".mp4") else c + ".mp4", c):
            if os.path.exists(p) and not os.path.isdir(p):
                return p
    return None


def probe_video_dims(video_file: str) -> tuple[int, int] | None:
    """(width, height) from the container header (deepfakes_dataset.py:250-252)."""
    capture = cv2.VideoCapture(video_file)
    try:
        w = capture.get(cv2.CAP_PROP_FRAME_WIDTH)
        h = capture.get(cv2.CAP_PROP_FRAME_HEIGHT)
    finally:
        capture.release()
    if not w or not h:
        return None
    return int(w), int(h)


@dataclass
class VideoFaces:
    """All face crops of one video, grouped by identity.

    A face *ref* is either a crop-image path (PNG layout) or an int entry
    index into the video's :class:`~mintime_tpu.data.crop_store.CropPack`.
    """

    video_dir: str
    identities: list[IdentityFaces]
    #: face refs per identity, time-sorted to align with IdentityFaces.frames
    faces: dict[str, list]
    #: (frame_idx, ref) of unclustered crops loose in the video folder
    discarded: list


def _image_width(path: str) -> int | None:
    """Crop width from the file header (a few bytes — the TPU-native stand-in
    for the reference's libmagic sniff, deepfakes_dataset.py:114); falls back
    to a full decode only for unparsable headers."""
    from mintime_tpu.data.crop_store import image_dims_header

    dims = image_dims_header(path)
    if dims is not None:
        return dims[0]
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    return img.shape[1] if img is not None else None


def scan_video_dir(video_dir: str) -> VideoFaces:
    """Scan one video folder into identity groups + discarded faces.

    Mirrors deepfakes_dataset.get_sorted_identities' directory walk
    (:123-139) including the discarded-crop merge into the first identity
    (:227-235, applied later at plan time via :func:`merge_discarded`).
    ``mean_side`` is the mean header width over ALL crops, exactly the
    reference's ``magic.from_file`` loop (deepfakes_dataset.py:112-119) at
    ~8 bytes read per file instead of a decode.
    """
    identities: list[IdentityFaces] = []
    faces: dict[str, list] = {}
    discarded: list = []
    for entry in sorted(os.listdir(video_dir)):
        p = os.path.join(video_dir, entry)
        if not os.path.isdir(p):
            if entry.lower().endswith(_CROP_EXTS):
                discarded.append((_frame_of(entry), p))
            continue
        # frame-number order, filename as a deterministic tiebreak (the
        # reference keeps os.listdir order on ties, which is fs-dependent;
        # the pack path sorts the same way — crop_store.pack_video_dir)
        crops = sorted(
            (
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.lower().endswith(_CROP_EXTS)
            ),
            key=lambda c: (_frame_of(c), os.path.basename(c)),
        )
        if not crops:
            continue
        sides = [w for c in crops if (w := _image_width(c)) is not None]
        identities.append(
            IdentityFaces(
                key=entry,
                frames=[_frame_of(c) for c in crops],
                mean_side=float(np.mean(sides)) if sides else 0.0,
            )
        )
        faces[entry] = crops
    if not identities and discarded:
        # no clustered identities: treat the loose crops as one identity
        crops = sorted(
            (p for _, p in discarded),
            key=lambda c: (_frame_of(c), os.path.basename(c)),
        )
        identities.append(
            IdentityFaces(
                key=os.path.basename(video_dir),
                frames=[_frame_of(c) for c in crops],
                mean_side=0.0,
            )
        )
        faces[identities[0].key] = crops
        discarded = []
    return VideoFaces(video_dir, identities, faces, discarded)


def video_faces_from_pack(pack, video_dir: str) -> VideoFaces:
    """Build the identity index straight from a ``crops.pack`` header —
    no directory walk, no image header reads (widths are in the index)."""
    groups: dict[str, list[tuple[int, int, int]]] = {}  # key → (frame, idx, w)
    discarded: list = []
    for i, (ident, frame, face, h, w, off) in enumerate(pack.entries):
        if ident is None:
            discarded.append((int(frame), i))
        else:
            groups.setdefault(ident, []).append((int(frame), i, int(w)))
    identities: list[IdentityFaces] = []
    faces: dict[str, list] = {}
    for key in sorted(groups):
        items = sorted(groups[key], key=lambda t: t[0])
        identities.append(
            IdentityFaces(
                key=key,
                frames=[t[0] for t in items],
                mean_side=float(np.mean([t[2] for t in items])),
            )
        )
        faces[key] = [t[1] for t in items]
    if not identities and discarded:
        items = sorted(discarded, key=lambda t: t[0])
        identities.append(
            IdentityFaces(
                key=os.path.basename(video_dir),
                frames=[t[0] for t in items],
                mean_side=0.0,
            )
        )
        faces[identities[0].key] = [t[1] for t in items]
        discarded = []
    return VideoFaces(video_dir, identities, faces, discarded)


def merge_discarded(vf: VideoFaces) -> VideoFaces:
    """Merge discarded crops into identity 0 for frames it is missing
    (deepfakes_dataset.py:227-235)."""
    if not vf.discarded or not vf.identities:
        return vf
    first = vf.identities[0]
    have = set(first.frames)
    # ONE crop per missing frame — the reference indexes the discarded list
    # by frame and takes the first hit (deepfakes_dataset.py:231-232)
    extra = []
    for f, r in vf.discarded:
        if f not in have:
            extra.append((f, r))
            have.add(f)
    if not extra:
        return vf
    pairs = sorted(
        list(zip(first.frames, vf.faces[first.key])) + extra, key=lambda t: t[0]
    )
    new_first = IdentityFaces(
        key=first.key,
        frames=[f for f, _ in pairs],
        mean_side=first.mean_side,
    )
    identities = [new_first] + vf.identities[1:]
    faces = dict(vf.faces)
    faces[first.key] = [r for _, r in pairs]
    return VideoFaces(vf.video_dir, identities, faces, vf.discarded)


@dataclass
class VideoIndex:
    """Cached per-video state: the identity index (post discarded-merge),
    the optional crop pack, and the resolved original-video dims. Built once
    per video per dataset and reused across epochs — the reference re-walks
    the directory and re-sniffs every crop header on every sample of every
    epoch (deepfakes_dataset.py:123-139); nothing in that walk changes
    between epochs (file moves only happen in offline preprocessing), so
    caching is behavior-preserving.
    """

    vf: VideoFaces
    pack: object | None
    dims: tuple[int, int] | None

    def read(self, identity_key: str, face_index: int) -> np.ndarray | None:
        ref = self.vf.faces[identity_key][face_index]
        if isinstance(ref, int):
            return self.pack.read(ref)
        return cv2.imread(ref)


class DeepfakesDataset:
    """Map-style dataset with the reference's sample contract
    (deepfakes_dataset.py:338-341): returns a dict with

    ``frames (F,H,W,3) float32`` raw 0..255, ``size_embedding (F,) int32``,
    ``mask (F,) bool``, ``identities_mask (F,F) bool``,
    ``positions (1+F*P,) int32``, ``label``, plus ``video_id``,
    ``multiclass_label`` and ``tokens_per_identity`` in test mode.
    """

    def __init__(
        self,
        videos: Sequence[str],
        labels: Sequence[float],
        data_path: str = "",
        image_size: int = 224,
        num_frames: int = 16,
        num_patches: int = 49,
        max_identities: int = 2,
        mode: str = "train",
        augmentation: str = "max",
        identities_ordering: int = 0,
        multiclass_labels: Sequence[float] | None = None,
        video_dims: Mapping[str, tuple[int, int]] | None = None,
        video_path: str | None = None,
        default_video_dims: tuple[int, int] | None = None,
        legacy_all_ones_mask: bool = False,
        seed: int = 42,
    ):
        self.videos = list(videos)
        self.labels = list(labels)
        self.multiclass_labels = multiclass_labels
        self.data_path = data_path
        self.image_size = image_size
        self.num_frames = num_frames
        self.num_patches = num_patches
        self.max_identities = max_identities
        self.mode = mode
        self.identities_ordering = identities_ordering
        self.video_dims = dict(video_dims or {})
        self.video_path = video_path
        self.default_video_dims = default_video_dims
        self.legacy_all_ones_mask = legacy_all_ones_mask
        self.seed = seed
        if mode == "train":
            self.transform: Compose = create_train_transforms(image_size, augmentation)
        else:
            self.transform = create_val_transform(image_size)
        #: per-video index, built lazily (or via preload_index) and reused
        #: across epochs; loader workers forked after preload inherit it.
        self._index: dict[int, VideoIndex] = {}

    def __len__(self):
        return len(self.videos)

    def _build_index(self, index: int) -> VideoIndex:
        from mintime_tpu.data.crop_store import CropPack, find_pack

        video_rel = self.videos[index]
        video_dir = os.path.join(self.data_path, video_rel)
        pack_path = find_pack(video_dir)
        pack = CropPack(pack_path) if pack_path else None
        if pack is not None:
            vf = video_faces_from_pack(pack, video_dir)
        else:
            vf = scan_video_dir(video_dir)
        # original-video dims for the size buckets, in priority order:
        # explicit mapping → pack header → sidecar → probe the .mp4 → default
        dims = self.video_dims.get(video_rel)
        if dims is None and pack is not None and pack.dims:
            dims = (int(pack.dims["width"]), int(pack.dims["height"]))
        if dims is None:
            dims = read_dims_sidecar(video_dir)
        if dims is None and self.video_path:
            orig = resolve_original_video(self.video_path, video_rel)
            if orig is not None:
                dims = probe_video_dims(orig)
        if dims is None:
            dims = self.default_video_dims
        if dims is not None:
            self.video_dims[video_rel] = dims  # probe/sidecar once, cached
        return VideoIndex(vf=merge_discarded(vf), pack=pack, dims=dims)

    def get_index(self, index: int) -> VideoIndex:
        vi = self._index.get(index)
        if vi is None:
            vi = self._build_index(index)
            self._index[index] = vi
        return vi

    def preload_index(self, workers: int = 8) -> None:
        """Build the whole per-video index up front (thread pool — the work
        is listdir/header IO). Called by the DataLoader before forking
        workers so every epoch's forked children inherit it for free."""
        from concurrent.futures import ThreadPoolExecutor

        missing = [i for i in range(len(self.videos)) if i not in self._index]
        if not missing:
            return
        with ThreadPoolExecutor(max(1, workers)) as pool:
            for i, vi in zip(missing, pool.map(self._build_index, missing)):
                self._index[i] = vi

    def _video_area(self, video_rel: str, vi: VideoIndex) -> float:
        """video_area = w*h/2 (deepfakes_dataset.py:253), from original video
        dimensions — sourced at index time and never silently defaulted."""
        if vi.dims is None:
            raise ValueError(
                f"unknown original video dimensions for {video_rel!r}: size "
                "embeddings need the frame area (deepfakes_dataset.py:250-253)."
                " Provide video_dims, a video_dims.json sidecar (written by"
                " extract_crops), --video_path to the original videos, or"
                " default_video_dims to opt into a fixed assumption."
            )
        return float(vi.dims[0]) * float(vi.dims[1]) / 2.0

    def __getitem__(self, index: int) -> dict:
        video_rel = self.videos[index]
        vi = self.get_index(index)
        vf = vi.vf
        rng = np.random.default_rng((self.seed, index))
        import random as _random

        plan = build_sequence_plan(
            vf.identities,
            num_frames=self.num_frames,
            num_patches=self.num_patches,
            max_identities=self.max_identities,
            ordering=self.identities_ordering,
            parity=index,
            rng=_random.Random(int(rng.integers(2**31))),
            legacy_all_ones_mask=self.legacy_all_ones_mask,
        )

        video_area = None
        frames = []
        size_embeddings = np.zeros(self.num_frames, np.int32)
        for slot in range(self.num_frames):
            fi = plan.face_index[slot]
            if fi < 0:
                frames.append(
                    np.zeros((self.image_size, self.image_size, 3), np.uint8)
                )
                continue
            ident_key = plan.identity_keys[plan.identity_index[slot]]
            img = vi.read(ident_key, fi)
            if img is None:
                img = np.zeros((self.image_size, self.image_size, 3), np.uint8)
            if video_area is None:
                video_area = self._video_area(video_rel, vi)
            # size bucket from face/frame area ratio (deepfakes_dataset:250-263)
            face_area = img.shape[0] * img.shape[1] / 2.0
            ratio = int(face_area * 100.0 / video_area)
            size_embeddings[slot] = _bucket_of(ratio)
            frames.append(img)

        frames = self.transform(frames, rng)
        # frames travel as uint8 (augments are uint8 end-to-end) — 4× less
        # worker→device transport than float32; the model casts on device.
        # The reference feeds raw 0..255 floats (its albumentations stacks
        # contain no Normalize), so uint8 is value-exact.
        sample = {
            # Compose already returns a stacked (F, S, S, 3) array;
            # np.asarray is a no-op there (np.stack would re-copy)
            "frames": np.asarray(frames),
            "size_embedding": size_embeddings,
            "mask": plan.mask,
            "identities_mask": plan.identities_mask,
            "positions": plan.positions,
            "labels": np.float32(self.labels[index]),
        }
        if self.mode == "test":
            sample["video_id"] = video_rel.replace("/", "_")
            sample["tokens_per_identity"] = plan.tokens_per_identity
            if self.multiclass_labels is not None:
                sample["multiclass_label"] = self.multiclass_labels[index]
        return sample


def _bucket_of(ratio: int) -> int:
    """1-based 5%-bucket of an integer percentage ratio (SIZE_EMB_DICT)."""
    from mintime_tpu.data.assembler import SIZE_EMB_RANGES, NUM_SIZE_BUCKETS

    for i, (lo, hi) in enumerate(SIZE_EMB_RANGES):
        if lo <= ratio <= hi:
            return i + 1
    return NUM_SIZE_BUCKETS


def collate(samples: Sequence[dict]) -> dict:
    """Stack samples into a fixed-shape batch dict. Side tensors are
    optional so frame-level datasets (pretrain_extractor) ride the same
    loader."""
    keys = [
        k
        for k in ("frames", "size_embedding", "mask", "identities_mask", "positions")
        if k in samples[0]
    ]
    batch = {k: np.stack([s[k] for s in samples]) for k in keys}
    batch["labels"] = np.asarray([s["labels"] for s in samples], np.float32)
    if "video_id" in samples[0]:
        batch["video_id"] = [s["video_id"] for s in samples]
        batch["tokens_per_identity"] = [s["tokens_per_identity"] for s in samples]
    if "multiclass_label" in samples[0]:
        batch["multiclass_label"] = np.asarray(
            [s["multiclass_label"] for s in samples], np.float32
        )
    return batch

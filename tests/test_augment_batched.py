"""Batched augmentation path equals the per-frame path byte-for-byte.

The one-param-per-video semantics (reference deepfakes_dataset.py:293-312,
albumentations ``additional_targets``) make every transform a pure map of
the same params over each frame, so the vectorized ``apply_batch`` overrides
must be bit-identical to looping ``apply``. These tests pin that contract
per transform and for the full presets under a shared RNG stream.
"""

from __future__ import annotations

import numpy as np
import pytest

from mintime_tpu.data import augment as A


def _frames(rng, n=16, h=224, w=224):
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


# every transform that appears in a preset, constructed as the presets do
ALL_TRANSFORMS = [
    A.IsotropicResize(224),
    A.PadIfNeeded(224, 224),
    A.Resize(224, 224),
    A.HorizontalFlip(),
    A.ShiftScaleRotate(0.1, 0.2, 5),
    A.ImageCompression(60, 100),
    A.GaussNoise(),
    A.MultiplicativeNoise(),
    A.ISONoise(),
    A.GaussianBlur(blur_limit=3),
    A.MedianBlur(),
    A.MotionBlur(),
    A.GlassBlur(),
    A.InvertImg(),
    A.RandomBrightnessContrast(),
    A.RandomGamma(),
    A.HueSaturationValue(),
    A.RGBShift(),
    A.FancyPCA(),
    A.ColorJitter(),
    A.ToGray(),
    A.ToSepia(),
    A.CLAHE(),
    A.CoarseDropout(),
    A.RandomShadow(),
    A.RandomFog(),
    A.RandomRain(),
    A.RandomSunFlare(),
]


@pytest.mark.parametrize("t", ALL_TRANSFORMS, ids=lambda t: type(t).__name__)
def test_apply_batch_matches_per_frame(t):
    rng = np.random.default_rng(7)
    frames = _frames(rng, n=5, h=96, w=96)
    stack = np.stack(frames)
    params = t.sample(np.random.default_rng(3), frames[0].shape)
    ref = np.stack([t.apply(f, **params) for f in frames])
    got = t.apply_batch(stack, **params)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("t", ALL_TRANSFORMS, ids=lambda t: type(t).__name__)
def test_apply_batch_does_not_mutate_input(t):
    rng = np.random.default_rng(11)
    stack = np.stack(_frames(rng, n=3, h=64, w=64))
    before = stack.copy()
    params = t.sample(np.random.default_rng(5), stack[0].shape)
    t.apply_batch(stack, **params)
    np.testing.assert_array_equal(stack, before)


def _run_legacy(transform, frames, rng):
    """The pre-batching pipeline: frames stay a Python list throughout."""

    def run(t, frames):
        if isinstance(t, A.Compose):
            for sub in t.transforms:
                frames = run(sub, frames)
            return frames
        if isinstance(t, A.OneOf):
            if rng.random() >= t.p:
                return frames
            chosen = t.transforms[rng.integers(len(t.transforms))]
            params = chosen.sample(rng, frames[0].shape)
            return [chosen.apply(f, **params) for f in frames]
        if rng.random() >= t.p:
            return frames
        params = t.sample(rng, frames[0].shape)
        return [t.apply(f, **params) for f in frames]

    return run(transform, frames)


@pytest.mark.parametrize("preset", ["min", "max"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_full_train_pipeline_bit_identical(preset, seed):
    tr = A.create_train_transforms(96, preset)
    base = np.random.default_rng(100 + seed)
    frames = []
    for _ in range(8):
        h, w = base.integers(40, 120, size=2)
        frames.append(base.integers(0, 256, size=(h, w, 3), dtype=np.uint8))

    got = tr([f.copy() for f in frames], np.random.default_rng(seed))
    want = _run_legacy(tr, [f.copy() for f in frames], np.random.default_rng(seed))
    np.testing.assert_array_equal(np.asarray(got), np.stack(want))


def test_val_pipeline_bit_identical():
    tr = A.create_val_transform(96)
    base = np.random.default_rng(42)
    frames = [
        base.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(50, 70), (120, 80), (96, 96)]
    ]
    got = tr([f.copy() for f in frames], np.random.default_rng(0))
    want = _run_legacy(tr, [f.copy() for f in frames], np.random.default_rng(0))
    np.testing.assert_array_equal(np.asarray(got), np.stack(want))


def test_heterogeneous_frames_stay_listed_until_uniform():
    """The stack forms only once shapes agree; heterogeneous crops keep the
    per-frame path (IsotropicResize needs each frame's own geometry)."""
    tr = A.create_val_transform(64)
    base = np.random.default_rng(1)
    frames = [
        base.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(30, 90), (80, 40)]
    ]
    out = tr(frames, np.random.default_rng(0))
    out = np.asarray(out)
    assert out.shape == (2, 64, 64, 3)

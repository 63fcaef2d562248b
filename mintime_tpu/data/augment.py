"""Host-side image augmentation pipeline (numpy/cv2).

Native re-implementation of the reference's albumentations stacks
(``deepfakes_dataset.py:57-108``) — albumentations itself is not a
dependency of this framework. Key semantic carried over: ONE parameter
sample is applied identically to **every** face of a video (albumentations
``additional_targets``, deepfakes_dataset.py:293-312), so temporal coherence
survives augmentation.

Each transform maps ``(frames: list[HxWx3 uint8], rng)`` → frames with the
same sampled parameters; :class:`Compose`/:class:`OneOf` mirror the
albumentations combinators, and :class:`Compose` returns the frames stacked
as one contiguous ``(F, H, W, 3)`` array. The ``min``/``max`` presets mirror
``create_train_transforms`` and ``create_val_transform`` mirrors the eval
path (IsotropicResize → PadIfNeeded → Resize only).

Performance: value-wise transforms (brightness/contrast, gamma, RGB shift,
HSV shift, FancyPCA's final add) run as 256-entry ``cv2.LUT`` table passes
that are bit-identical to their float-arithmetic definitions — one SIMD
uint8 pass instead of several full-image float32 passes. Every transform
also exposes ``apply_batch`` for callers holding a uniform ``(F, H, W, 3)``
stack; equivalence to the per-frame path is pinned by
``tests/test_augment_batched.py``.

Images stay uint8 0..255 end to end — the reference feeds raw 0..255 floats
to the extractor (train.py:341-348; no Normalize in the training transform).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import cv2
import numpy as np


# ---------------------------------------------------------------- combinators
class Transform:
    p: float = 1.0

    def sample(self, rng: np.random.Generator, shape) -> dict:
        return {}

    def apply(self, img: np.ndarray, **params) -> np.ndarray:
        raise NotImplementedError

    def apply_batch(self, stack: np.ndarray, **params) -> np.ndarray:
        """Apply to a stacked ``(F, H, W, 3)`` uint8 array of same-size frames.

        Default falls back to the per-frame path; hot transforms override
        with a single vectorized numpy/cv2 call that is bit-identical to
        looping :meth:`apply` (the one-param-per-video semantics make most
        ops pure elementwise/per-pixel maps, so the batched form is exact).
        """
        return np.stack([self.apply(f, **params) for f in stack])

    def __call__(self, frames, rng: np.random.Generator):
        if rng.random() >= self.p:
            return frames
        params = self.sample(rng, frames[0].shape)
        if isinstance(frames, np.ndarray):
            return self.apply_batch(frames, **params)
        return [self.apply(f, **params) for f in frames]


def _stack_if_uniform(frames):
    """List of same-shaped frames → one contiguous (F, H, W, 3) stack.

    ndarray input passes through untouched; heterogeneous lists stay lists.
    """
    if isinstance(frames, np.ndarray) or not frames:
        return frames
    shape = frames[0].shape
    if all(f.shape == shape for f in frames):
        return np.stack(frames)
    return frames


class Compose(Transform):
    """Sequential combinator. Transforms run per-frame — measured faster
    than whole-stack vectorization on cache-limited hosts, because each
    ~150 KB frame stays L2-resident across an op's float passes while a
    16-frame stack spills (stacked max-preset 24.7 ms vs per-frame 23.9 ms
    per video, 2026-08-19) — and the result is stacked once at the end,
    saving the consumer's ``np.stack``. The per-op wins live in the
    ``apply`` overrides (cv2.LUT value maps, cv2.flip). ``apply_batch``
    remains on every transform for callers that already hold a stack.
    """

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, frames, rng):
        for t in self.transforms:
            frames = t(frames, rng)
        return _stack_if_uniform(frames)


class OneOf(Transform):
    def __init__(self, transforms: Sequence[Transform], p: float = 0.5):
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, frames, rng):
        if rng.random() >= self.p:
            return frames
        t = self.transforms[rng.integers(len(self.transforms))]
        params = t.sample(rng, frames[0].shape)
        if isinstance(frames, np.ndarray):
            return t.apply_batch(frames, **params)
        return [t.apply(f, **params) for f in frames]


# ---------------------------------------------------------------- geometry
class IsotropicResize(Transform):
    """Aspect-preserving resize to ``max_side``, interpolation chosen by
    up/down scale (reference transforms/albu.py:9-45)."""

    def __init__(self, max_side, interpolation_down=cv2.INTER_AREA,
                 interpolation_up=cv2.INTER_CUBIC, p=1.0):
        self.max_side = max_side
        self.down = interpolation_down
        self.up = interpolation_up
        self.p = p

    def apply(self, img, **_):
        h, w = img.shape[:2]
        if max(h, w) == self.max_side:
            return img
        scale = self.max_side / max(h, w)
        interp = self.up if scale > 1 else self.down
        nh, nw = int(round(h * scale)), int(round(w * scale))
        return cv2.resize(img, (nw, nh), interpolation=interp)

    def apply_batch(self, stack, **_):
        if max(stack.shape[1:3]) == self.max_side:
            return stack
        return np.stack([self.apply(f) for f in stack])


class PadIfNeeded(Transform):
    """Center-pad to at least (min_h, min_w) with constant black borders."""

    def __init__(self, min_height, min_width, p=1.0):
        self.min_h = min_height
        self.min_w = min_width
        self.p = p

    def apply(self, img, **_):
        h, w = img.shape[:2]
        ph, pw = max(0, self.min_h - h), max(0, self.min_w - w)
        if ph == 0 and pw == 0:
            return img
        top, left = ph // 2, pw // 2
        return cv2.copyMakeBorder(
            img, top, ph - top, left, pw - left, cv2.BORDER_CONSTANT, value=0
        )

    def apply_batch(self, stack, **_):
        h, w = stack.shape[1:3]
        ph, pw = max(0, self.min_h - h), max(0, self.min_w - w)
        if ph == 0 and pw == 0:
            return stack
        top, left = ph // 2, pw // 2
        return np.pad(
            stack, ((0, 0), (top, ph - top), (left, pw - left), (0, 0))
        )


class Resize(Transform):
    def __init__(self, height, width, p=1.0):
        self.h, self.w = height, width
        self.p = p

    def apply(self, img, **_):
        if img.shape[:2] == (self.h, self.w):
            return img
        return cv2.resize(img, (self.w, self.h), interpolation=cv2.INTER_LINEAR)

    def apply_batch(self, stack, **_):
        if stack.shape[1:3] == (self.h, self.w):
            return stack
        return np.stack([self.apply(f) for f in stack])


class HorizontalFlip(Transform):
    def __init__(self, p=0.5):
        self.p = p

    def apply(self, img, **_):
        # cv2.flip is an exact pixel permutation and ~20x the strided
        # numpy reverse-copy on this host
        return cv2.flip(img, 1)

    def apply_batch(self, stack, **_):
        out = np.empty_like(stack)
        for i in range(len(stack)):
            cv2.flip(stack[i], 1, dst=out[i])
        return out


class ShiftScaleRotate(Transform):
    def __init__(self, shift_limit=0.1, scale_limit=0.2, rotate_limit=5, p=0.5):
        self.shift = shift_limit
        self.scale = scale_limit
        self.rot = rotate_limit
        self.p = p

    def sample(self, rng, shape):
        return {
            "dx": rng.uniform(-self.shift, self.shift),
            "dy": rng.uniform(-self.shift, self.shift),
            "scale": 1 + rng.uniform(-self.scale, self.scale),
            "angle": rng.uniform(-self.rot, self.rot),
        }

    def apply(self, img, dx=0.0, dy=0.0, scale=1.0, angle=0.0):
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        m[0, 2] += dx * w
        m[1, 2] += dy * h
        return cv2.warpAffine(img, m, (w, h), borderMode=cv2.BORDER_CONSTANT)

    def apply_batch(self, stack, dx=0.0, dy=0.0, scale=1.0, angle=0.0):
        f, h, w = stack.shape[:3]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        m[0, 2] += dx * w
        m[1, 2] += dy * h
        out = np.empty_like(stack)
        for i in range(f):
            # warp straight into the contiguous per-frame slice — skips the
            # extra np.stack copy of the default batch path
            cv2.warpAffine(
                stack[i], m, (w, h), dst=out[i], borderMode=cv2.BORDER_CONSTANT
            )
        return out


# ---------------------------------------------------------------- photometric
class ImageCompression(Transform):
    def __init__(self, quality_lower=60, quality_upper=100, p=0.2):
        self.lo, self.hi = quality_lower, quality_upper
        self.p = p

    def sample(self, rng, shape):
        return {"quality": int(rng.integers(self.lo, self.hi + 1))}

    def apply(self, img, quality=90):
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
        return cv2.imdecode(enc, cv2.IMREAD_COLOR) if ok else img


class GaussNoise(Transform):
    def __init__(self, var_limit=(10.0, 50.0), p=0.3):
        self.var = var_limit
        self.p = p

    def sample(self, rng, shape):
        sigma = math.sqrt(rng.uniform(*self.var))
        # native float32 gaussian generation — ~2x the float64 + astype path
        return {"noise": rng.standard_normal(shape, dtype=np.float32) * np.float32(sigma)}

    def apply(self, img, noise=None):
        return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


class MultiplicativeNoise(Transform):
    def __init__(self, mult=(0.9, 1.1), p=1.0):
        self.mult = mult
        self.p = p

    def sample(self, rng, shape):
        return {"m": rng.uniform(*self.mult, size=shape).astype(np.float32)}

    def apply(self, img, m=None):
        return np.clip(img.astype(np.float32) * m, 0, 255).astype(np.uint8)


class ISONoise(Transform):
    """Sensor noise: luminance gaussian + hue shift (albumentations semantics)."""

    def __init__(self, color_shift=(0.01, 0.05), intensity=(0.1, 0.5), p=1.0):
        self.color_shift = color_shift
        self.intensity = intensity
        self.p = p

    def sample(self, rng, shape):
        return {
            "shift": rng.uniform(*self.color_shift),
            "intensity": rng.uniform(*self.intensity),
            "seed": int(rng.integers(2**31)),
        }

    def apply(self, img, shift=0.02, intensity=0.3, seed=0):
        r = np.random.default_rng(seed)
        hls = cv2.cvtColor(img, cv2.COLOR_BGR2HLS).astype(np.float32)
        stddev = img.astype(np.float32).std()
        luminance_noise = r.poisson(stddev * intensity, size=img.shape[:2])
        color_noise = r.normal(0, shift * 360 * intensity, size=img.shape[:2])
        hls[..., 0] = (hls[..., 0] + color_noise) % 360
        hls[..., 1] = np.clip(
            hls[..., 1] + luminance_noise * (1 - hls[..., 1] / 255), 0, 255
        )
        return cv2.cvtColor(hls.astype(np.uint8), cv2.COLOR_HLS2BGR)

class GaussianBlur(Transform):
    def __init__(self, blur_limit=3, p=0.05):
        self.limit = blur_limit
        self.p = p

    def sample(self, rng, shape):
        k = int(rng.integers(1, self.limit // 2 + 2)) * 2 + 1
        return {"k": k}

    def apply(self, img, k=3):
        return cv2.GaussianBlur(img, (k, k), 0)


class MedianBlur(Transform):
    def __init__(self, blur_limit=7, p=1.0):
        self.limit = blur_limit
        self.p = p

    def sample(self, rng, shape):
        return {"k": int(rng.integers(1, self.limit // 2 + 1)) * 2 + 1}

    def apply(self, img, k=3):
        return cv2.medianBlur(img, k)


class MotionBlur(Transform):
    def __init__(self, blur_limit=7, p=1.0):
        self.limit = blur_limit
        self.p = p

    def sample(self, rng, shape):
        k = int(rng.integers(3, self.limit + 1))
        kernel = np.zeros((k, k), np.float32)
        angle = rng.uniform(0, 180)
        c = (k - 1) / 2
        dx, dy = math.cos(math.radians(angle)), math.sin(math.radians(angle))
        for t in np.linspace(-c, c, k * 2):
            x, y = int(round(c + t * dx)), int(round(c + t * dy))
            if 0 <= x < k and 0 <= y < k:
                kernel[y, x] = 1
        return {"kernel": kernel / max(kernel.sum(), 1)}

    def apply(self, img, kernel=None):
        return cv2.filter2D(img, -1, kernel)


class GlassBlur(Transform):
    """Local pixel shuffling + blur (cheap variant of albumentations')."""

    def __init__(self, sigma=0.7, max_delta=2, p=1.0):
        self.sigma = sigma
        self.max_delta = max_delta
        self.p = p

    def sample(self, rng, shape):
        return {"seed": int(rng.integers(2**31))}

    def apply(self, img, seed=0):
        r = np.random.default_rng(seed)
        h, w = img.shape[:2]
        out = cv2.GaussianBlur(img, (0, 0), self.sigma)
        dy, dx = r.integers(-self.max_delta, self.max_delta + 1, size=(2, h, w))
        ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
        xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
        return cv2.GaussianBlur(out[ys, xs], (0, 0), self.sigma)


class Downscale(Transform):
    def __init__(self, scale_min=0.25, scale_max=0.5, p=1.0):
        self.lo, self.hi = scale_min, scale_max
        self.p = p

    def sample(self, rng, shape):
        return {"scale": rng.uniform(self.lo, self.hi)}

    def apply(self, img, scale=0.5):
        h, w = img.shape[:2]
        small = cv2.resize(img, (max(1, int(w * scale)), max(1, int(h * scale))),
                           interpolation=cv2.INTER_AREA)
        return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)


class InvertImg(Transform):
    def apply(self, img, **_):
        return 255 - img

    def apply_batch(self, stack, **_):
        return 255 - stack


class RandomBrightnessContrast(Transform):
    def __init__(self, brightness_limit=0.2, contrast_limit=0.2, p=1.0):
        self.b, self.c = brightness_limit, contrast_limit
        self.p = p

    def sample(self, rng, shape):
        return {
            "alpha": 1 + rng.uniform(-self.c, self.c),
            "beta": rng.uniform(-self.b, self.b) * 255,
        }

    def apply(self, img, alpha=1.0, beta=0.0):
        # per-value LUT — bit-identical to clip(f32(img)*alpha+beta).astype(u8)
        # (same float32-array × python-float op per value) without
        # materializing the float32 image: one SIMD table pass instead of
        # four full-image float passes.
        return cv2.LUT(img, self._table(alpha, beta))

    def apply_batch(self, stack, alpha=1.0, beta=0.0):
        f, h, w = stack.shape[:3]
        return cv2.LUT(
            stack.reshape(f * h, w, 3), self._table(alpha, beta)
        ).reshape(stack.shape)

    @staticmethod
    def _table(alpha, beta):
        return np.clip(
            np.arange(256, dtype=np.float32) * alpha + beta, 0, 255
        ).astype(np.uint8)


class RandomGamma(Transform):
    def __init__(self, gamma_limit=(80, 120), p=0.1):
        self.lim = gamma_limit
        self.p = p

    def sample(self, rng, shape):
        return {"gamma": rng.uniform(*self.lim) / 100.0}

    def apply(self, img, gamma=1.0):
        table = (np.linspace(0, 1, 256) ** gamma * 255).astype(np.uint8)
        return cv2.LUT(img, table)

    def apply_batch(self, stack, gamma=1.0):
        f, h, w = stack.shape[:3]
        table = (np.linspace(0, 1, 256) ** gamma * 255).astype(np.uint8)
        return cv2.LUT(stack.reshape(f * h, w, 3), table).reshape(stack.shape)


class HueSaturationValue(Transform):
    def __init__(self, hue=20, sat=30, val=20, p=1.0):
        self.h, self.s, self.v = hue, sat, val
        self.p = p

    def sample(self, rng, shape):
        return {
            "dh": rng.uniform(-self.h, self.h),
            "ds": rng.uniform(-self.s, self.s),
            "dv": rng.uniform(-self.v, self.v),
        }

    @staticmethod
    def _tables(dh, ds, dv):
        # per-channel value maps on the uint8 HSV planes — bit-identical to
        # the float32 hsv arithmetic + final astype(uint8) per value, without
        # materializing a float32 HSV image
        v = np.arange(256, dtype=np.float32)
        # the float64 params round through float32 before the uint8 cast,
        # matching the original in-place float32-plane assignment exactly
        return (
            ((v + dh) % 180).astype(np.float32).astype(np.uint8),
            np.clip(v + ds, 0, 255).astype(np.float32).astype(np.uint8),
            np.clip(v + dv, 0, 255).astype(np.float32).astype(np.uint8),
        )

    def apply(self, img, dh=0.0, ds=0.0, dv=0.0):
        th, ts, tv = self._tables(dh, ds, dv)
        lut = np.stack([th, ts, tv], axis=-1).reshape(1, 256, 3)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        return cv2.cvtColor(cv2.LUT(hsv, lut), cv2.COLOR_HSV2BGR)

    def apply_batch(self, stack, dh=0.0, ds=0.0, dv=0.0):
        f, h, w = stack.shape[:3]
        return self.apply(stack.reshape(f * h, w, 3), dh=dh, ds=ds, dv=dv).reshape(
            stack.shape
        )


class RGBShift(Transform):
    def __init__(self, limit=20, p=1.0):
        self.limit = limit
        self.p = p

    def sample(self, rng, shape):
        return {"shift": rng.uniform(-self.limit, self.limit, size=3)}

    def apply(self, img, shift=None):
        # (1, 256, 3) per-channel LUT — bit-identical to the float64-upcast
        # clip(f32(img) + shift) per value, one SIMD table pass instead of
        # full-image float passes.
        lut = np.clip(
            np.arange(256, dtype=np.float32)[:, None] + np.asarray(shift)[None, :],
            0,
            255,
        ).astype(np.uint8)
        return cv2.LUT(img, lut.reshape(1, 256, 3))

    def apply_batch(self, stack, shift=None):
        f, h, w = stack.shape[:3]
        return self.apply(stack.reshape(f * h, w, 3), shift=shift).reshape(stack.shape)


class FancyPCA(Transform):
    """AlexNet-style PCA color jitter over the video's first frame stats."""

    def __init__(self, alpha=0.1, p=1.0):
        self.alpha = alpha
        self.p = p

    def sample(self, rng, shape):
        return {"coeffs": rng.normal(0, self.alpha, size=3)}

    def apply(self, img, coeffs=None):
        # 3x3 covariance via the Gram identity on the raw 0..255 pixels —
        # ONE float32 BLAS matmul, no centered copy, no /255 pass (the
        # eigenvectors are scale-invariant and the eigenvalues carry the
        # 255² factor, folded into delta below). np.cov's float64 pipeline
        # here was ~40% of the whole augment stack's CPU time.
        flat = img.reshape(-1, 3).astype(np.float32)
        n = flat.shape[0]
        gram = flat.T @ flat
        mu = np.asarray(cv2.mean(img)[:3], np.float64)
        cov = (gram - n * np.outer(mu, mu)) / (max(n - 1, 1) * 255.0 * 255.0)
        w, v = np.linalg.eigh(cov)
        delta = (v @ (coeffs * w)) * 255.0
        # per-channel LUT for the final add — bit-identical to
        # clip(flat + f32(delta)).astype(u8) per value, one SIMD table
        # pass instead of a full float32 add/clip/cast pass
        lut = np.clip(
            np.arange(256, dtype=np.float32)[:, None]
            + delta[None, :].astype(np.float32),
            0,
            255,
        ).astype(np.uint8)
        return cv2.LUT(img, lut.reshape(1, 256, 3))


class ColorJitter(Transform):
    def __init__(self, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.02, p=1.0):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue
        self.p = p

    def sample(self, rng, shape):
        return {
            "b": 1 + rng.uniform(-self.b, self.b),
            "c": 1 + rng.uniform(-self.c, self.c),
            "s": 1 + rng.uniform(-self.s, self.s),
            "h": rng.uniform(-self.h, self.h) * 180,
        }

    def apply(self, img, b=1.0, c=1.0, s=1.0, h=0.0):
        out = np.clip(img.astype(np.float32) * b, 0, 255)
        mean = out.mean()
        out = np.clip((out - mean) * c + mean, 0, 255)
        hsv = cv2.cvtColor(out.astype(np.uint8), cv2.COLOR_BGR2HSV).astype(np.float32)
        hsv[..., 0] = (hsv[..., 0] + h) % 180
        hsv[..., 1] = np.clip(hsv[..., 1] * s, 0, 255)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)



class ToGray(Transform):
    def __init__(self, p=0.2):
        self.p = p

    def apply(self, img, **_):
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)

    def apply_batch(self, stack, **_):
        f, h, w = stack.shape[:3]
        g = cv2.cvtColor(stack.reshape(f * h, w, 3), cv2.COLOR_BGR2GRAY)
        return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR).reshape(stack.shape)


class ToSepia(Transform):
    MATRIX = np.array(
        [[0.272, 0.534, 0.131], [0.349, 0.686, 0.168], [0.393, 0.769, 0.189]],
        dtype=np.float32,
    )  # BGR rows

    def __init__(self, p=0.05):
        self.p = p

    def apply(self, img, **_):
        return np.clip(img.astype(np.float32) @ self.MATRIX.T, 0, 255).astype(np.uint8)



class CLAHE(Transform):
    def __init__(self, clip_limit=4.0, p=0.05):
        self.clip = clip_limit
        self.p = p

    def sample(self, rng, shape):
        return {"clip": rng.uniform(1, self.clip)}

    def apply(self, img, clip=2.0):
        lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
        clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))
        lab[..., 0] = clahe.apply(lab[..., 0])
        return cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)


class CoarseDropout(Transform):
    """Cutout/CoarseDropout: zero out random rectangles."""

    def __init__(self, max_holes=8, max_height=8, max_width=8, p=1.0):
        self.n, self.h, self.w = max_holes, max_height, max_width
        self.p = p

    def sample(self, rng, shape):
        h, w = shape[:2]
        holes = []
        for _ in range(int(rng.integers(1, self.n + 1))):
            hh = int(rng.integers(1, self.h + 1))
            ww = int(rng.integers(1, self.w + 1))
            y = int(rng.integers(0, max(1, h - hh)))
            x = int(rng.integers(0, max(1, w - ww)))
            holes.append((y, x, hh, ww))
        return {"holes": holes}

    def apply(self, img, holes=()):
        img = img.copy()
        for y, x, hh, ww in holes:
            img[y : y + hh, x : x + ww] = 0
        return img

    def apply_batch(self, stack, holes=()):
        stack = stack.copy()
        for y, x, hh, ww in holes:
            stack[:, y : y + hh, x : x + ww] = 0
        return stack


class RandomShadow(Transform):
    def __init__(self, p=0.05):
        self.p = p

    def sample(self, rng, shape):
        h, w = shape[:2]
        pts = rng.integers(0, [w, h], size=(4, 2)).astype(np.int32)
        return {"pts": pts, "strength": rng.uniform(0.3, 0.7)}

    def apply(self, img, pts=None, strength=0.5):
        overlay = np.ones(img.shape[:2], np.float32)
        cv2.fillPoly(overlay, [pts.reshape(-1, 1, 2)], strength)
        return np.clip(img.astype(np.float32) * overlay[..., None], 0, 255).astype(np.uint8)



class RandomFog(Transform):
    def __init__(self, p=1.0):
        self.p = p

    def sample(self, rng, shape):
        return {"coef": rng.uniform(0.1, 0.4)}

    def apply(self, img, coef=0.2):
        fog = np.full_like(img, 255)
        return cv2.addWeighted(img, 1 - coef, fog, coef, 0)

    def apply_batch(self, stack, coef=0.2):
        f, h, w = stack.shape[:3]
        flat = stack.reshape(f * h, w, 3)
        fog = np.full_like(flat, 255)
        return cv2.addWeighted(flat, 1 - coef, fog, coef, 0).reshape(stack.shape)


class RandomRain(Transform):
    def __init__(self, p=1.0):
        self.p = p

    def sample(self, rng, shape):
        h, w = shape[:2]
        n = max(1, (h * w) // 600)
        return {
            "drops": rng.integers(0, [w, h], size=(n, 2)),
            "length": int(rng.integers(5, 15)),
        }

    def apply(self, img, drops=None, length=10):
        img = img.copy()
        for x, y in drops:
            cv2.line(img, (int(x), int(y)), (int(x), int(y) + length), (200, 200, 200), 1)
        return cv2.blur(img, (3, 3))


class RandomSunFlare(Transform):
    def __init__(self, p=1.0):
        self.p = p

    def sample(self, rng, shape):
        h, w = shape[:2]
        return {
            "center": (int(rng.integers(0, w)), int(rng.integers(0, h // 2 + 1))),
            "radius": int(rng.integers(min(h, w) // 6 + 1, min(h, w) // 3 + 2)),
        }

    def apply(self, img, center=(0, 0), radius=20):
        overlay = img.copy()
        cv2.circle(overlay, center, radius, (255, 255, 255), -1)
        return cv2.addWeighted(img, 0.7, overlay, 0.3, 0)


# ---------------------------------------------------------------- presets
def create_train_transforms(size: int, augmentation: str = "max") -> Compose:
    """Mirror of deepfakes_dataset.create_train_transforms (:57-100)."""
    resize_chain = [
        OneOf(
            [
                IsotropicResize(size, cv2.INTER_AREA, cv2.INTER_CUBIC),
                IsotropicResize(size, cv2.INTER_AREA, cv2.INTER_LINEAR),
                IsotropicResize(size, cv2.INTER_LINEAR, cv2.INTER_LINEAR),
            ],
            p=1.0,
        ),
        PadIfNeeded(size, size),
        Resize(size, size),
    ]
    if augmentation == "min":
        return Compose(
            resize_chain
            + [
                ImageCompression(60, 100, p=0.2),
                GaussNoise(p=0.3),
                GaussianBlur(blur_limit=3, p=0.05),
                HorizontalFlip(p=0.5),
                OneOf([RandomBrightnessContrast(), FancyPCA(), HueSaturationValue()], p=0.4),
                ToGray(p=0.2),
                ShiftScaleRotate(0.1, 0.2, 5, p=0.5),
            ]
        )
    return Compose(
        resize_chain
        + [
            ImageCompression(60, 100, p=0.2),
            OneOf([GaussianBlur(blur_limit=3), MedianBlur(), GlassBlur(), MotionBlur()], p=0.1),
            OneOf([HorizontalFlip(p=1.0), InvertImg()], p=0.5),
            OneOf(
                [RandomBrightnessContrast(), FancyPCA(), HueSaturationValue()], p=0.5
            ),
            OneOf([RGBShift(), ColorJitter()], p=0.1),
            OneOf([MultiplicativeNoise(), ISONoise(), GaussNoise()], p=0.3),
            OneOf([CoarseDropout(), CoarseDropout(max_holes=4, max_height=12, max_width=12)], p=0.1),
            OneOf([RandomFog(), RandomRain(), RandomSunFlare()], p=0.02),
            RandomShadow(p=0.05),
            RandomGamma(p=0.1),
            CLAHE(p=0.05),
            ToGray(p=0.2),
            ToSepia(p=0.05),
            ShiftScaleRotate(0.1, 0.2, 5, p=0.5),
        ]
    )


def create_val_transform(size: int) -> Compose:
    """Mirror of deepfakes_dataset.create_val_transform (:102-108)."""
    return Compose(
        [
            IsotropicResize(size, cv2.INTER_AREA, cv2.INTER_CUBIC),
            PadIfNeeded(size, size),
            Resize(size, size),
        ]
    )

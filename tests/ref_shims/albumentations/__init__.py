"""Test-only shim of the albumentations API surface the REFERENCE
predict.py / transforms/albu.py import, faithful for the deterministic val
transform actually executed there (Compose → IsotropicResize → PadIfNeeded →
Resize, predict.py:247-254). Augmentation classes that predict.py imports
but never runs are inert placeholders.

Semantics replicated from albumentations' documented behavior:
* ``Compose(transforms, additional_targets=...)``: every ``image*`` kwarg
  gets the same transform chain; result dict preserves kwarg order (the
  reference iterates it to rebuild the sequence, predict.py:330).
* ``DualTransform.__call__`` invokes ``apply(img)`` with NO constructor
  params forwarded — the real library only forwards params produced by
  ``get_params``, which ``IsotropicResize`` does not override, so its
  ``interpolation_down/up`` ctor args are ignored at apply time (a known
  reference quirk; transforms/albu.py:37-39).
* ``PadIfNeeded``: center padding, top = (min_h - h) // 2 (cv2 constant 0).
* ``Resize``: cv2.resize to (width, height), INTER_LINEAR.
"""

import cv2
import numpy as np


class BasicTransform:
    def __init__(self, always_apply=False, p=1.0):
        self.always_apply = always_apply
        self.p = p

    def apply(self, img, **params):
        return img

    def __call__(self, force_apply=False, **data):
        out = {}
        for key, value in data.items():
            if key == "image" or key.startswith("image"):
                out[key] = self.apply(value)
            else:
                out[key] = value
        return out


class DualTransform(BasicTransform):
    pass


class ImageOnlyTransform(BasicTransform):
    pass


class Compose:
    def __init__(self, transforms, additional_targets=None, p=1.0):
        self.transforms = transforms
        self.additional_targets = additional_targets or {}

    def __call__(self, force_apply=False, **data):
        for t in self.transforms:
            data = t(**data)
        return data


class PadIfNeeded(DualTransform):
    def __init__(self, min_height, min_width, border_mode=cv2.BORDER_CONSTANT,
                 value=None, always_apply=False, p=1.0):
        super().__init__(always_apply, p)
        self.min_height = min_height
        self.min_width = min_width
        self.border_mode = border_mode
        self.value = value if value is not None else 0

    def apply(self, img, **params):
        h, w = img.shape[:2]
        pad_top = max((self.min_height - h) // 2, 0)
        pad_bottom = max(self.min_height - h - pad_top, 0)
        pad_left = max((self.min_width - w) // 2, 0)
        pad_right = max(self.min_width - w - pad_left, 0)
        if not any((pad_top, pad_bottom, pad_left, pad_right)):
            return img
        return cv2.copyMakeBorder(
            img, pad_top, pad_bottom, pad_left, pad_right,
            self.border_mode, value=self.value,
        )


class Resize(DualTransform):
    def __init__(self, height, width, interpolation=cv2.INTER_LINEAR,
                 always_apply=False, p=1.0):
        super().__init__(always_apply, p)
        self.height = height
        self.width = width
        self.interpolation = interpolation

    def apply(self, img, **params):
        return cv2.resize(img, (self.width, self.height),
                          interpolation=self.interpolation)


class _Inert(BasicTransform):
    """Imported by the reference but never executed on the val path."""

    def __init__(self, *args, **kwargs):
        super().__init__()


class RandomBrightnessContrast(_Inert):
    pass


class HorizontalFlip(_Inert):
    pass


class FancyPCA(_Inert):
    pass


class HueSaturationValue(_Inert):
    pass


class OneOf(_Inert):
    pass


class ToGray(_Inert):
    pass


class ShiftScaleRotate(_Inert):
    pass


class ImageCompression(_Inert):
    pass


class GaussNoise(_Inert):
    pass


class GaussianBlur(_Inert):
    pass


class Rotate(_Inert):
    pass


class Normalize(_Inert):
    pass


# names deepfakes_dataset.py additionally imports for its TRAIN transform
# stacks — never constructed on the deterministic val path the golden
# dataset test drives
class Cutout(_Inert):
    pass


class CoarseDropout(_Inert):
    pass


class RandomGamma(_Inert):
    pass


class MedianBlur(_Inert):
    pass


class ToSepia(_Inert):
    pass


class RandomShadow(_Inert):
    pass


class MultiplicativeNoise(_Inert):
    pass


class RandomSunFlare(_Inert):
    pass


class GlassBlur(_Inert):
    pass


class RandomBrightness(_Inert):
    pass


class MotionBlur(_Inert):
    pass


class RandomRain(_Inert):
    pass


class RGBShift(_Inert):
    pass


class RandomFog(_Inert):
    pass


class RandomContrast(_Inert):
    pass


class Downscale(_Inert):
    pass


class InvertImg(_Inert):
    pass


class ColorJitter(_Inert):
    pass


class CLAHE(_Inert):
    pass


class ISONoise(_Inert):
    pass


class JpegCompression(_Inert):
    pass

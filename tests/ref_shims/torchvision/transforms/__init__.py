"""Test-only torchvision.transforms shim for the reference parity harness.

``Resize`` replicates torchvision's PIL path: ``img.resize((w, h),
PIL BILINEAR)`` — exactly what the reference's ``preprocess_images``
(preprocessing/utils.py:32-34) executes on each face crop before embedding.
"""

from PIL import Image


class Resize:
    def __init__(self, size, interpolation=None):
        self.size = size if isinstance(size, (list, tuple)) else [size, size]

    def __call__(self, img):
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class ToPILImage:
    def __call__(self, pic):
        import numpy as np

        return Image.fromarray(np.asarray(pic))


class ToTensor:
    def __call__(self, pic):
        import numpy as np
        import torch

        arr = np.asarray(pic, dtype=np.float32) / 255.0
        return torch.from_numpy(arr).permute(2, 0, 1)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)

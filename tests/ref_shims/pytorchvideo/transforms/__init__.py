"""Shims of the pytorchvideo transforms the reference utils.py imports.
ShortSideScale / UniformTemporalSubsample are implemented faithfully (used
by slowfast_input_transform parity checks); the rest are import placeholders.
"""

import torch


class ApplyTransformToKey:
    def __init__(self, key, transform):
        self.key = key
        self.transform = transform

    def __call__(self, d):
        d[self.key] = self.transform(d[self.key])
        return d


class UniformTemporalSubsample:
    def __init__(self, num_samples):
        self.num_samples = num_samples

    def __call__(self, x):  # (C, T, H, W)
        t = x.shape[1]
        idx = torch.linspace(0, t - 1, self.num_samples)
        idx = torch.clamp(idx, 0, t - 1).long()
        return torch.index_select(x, 1, idx)


class ShortSideScale:
    def __init__(self, size):
        self.size = size

    def __call__(self, x):  # (C, T, H, W)
        c, t, h, w = x.shape
        if w < h:
            new_w, new_h = self.size, int(self.size * h / w)
        else:
            new_w, new_h = int(self.size * w / h), self.size
        return torch.nn.functional.interpolate(
            x, size=(new_h, new_w), mode="bilinear", align_corners=False
        )


class UniformCropVideo:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("pytorchvideo shim: not used by the harness")

"""Video-transform shims (imported by the reference utils.py; used only by
its SlowFast input path)."""


class NormalizeVideo:
    def __init__(self, mean, std, inplace=False):
        import torch

        self.mean = torch.tensor(mean).view(-1, 1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1, 1)

    def __call__(self, clip):  # clip (C, T, H, W)
        return (clip - self.mean) / self.std


class CenterCropVideo:
    def __init__(self, crop_size):
        self.crop_size = (crop_size, crop_size) if isinstance(crop_size, int) else crop_size

    def __call__(self, clip):  # clip (C, T, H, W)
        th, tw = self.crop_size
        h, w = clip.shape[-2:]
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return clip[..., i:i + th, j:j + tw]

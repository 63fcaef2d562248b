"""Shim of albumentations.augmentations.functional.crop (imported by the
reference transforms/albu.py; unused on the val path)."""


def crop(img, x_min, y_min, x_max, y_max):
    return img[y_min:y_max, x_min:x_max]

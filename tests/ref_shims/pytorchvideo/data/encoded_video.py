"""Shim: the reference utils.py imports EncodedVideo at module scope but the
parity harness never decodes through it."""


class EncodedVideo:
    @classmethod
    def from_path(cls, path):
        raise NotImplementedError("pytorchvideo shim: not used by the harness")

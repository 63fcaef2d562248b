"""Shim: reference baseline.py imports torchsummary.summary (debug-only)."""


def summary(*args, **kwargs):
    raise NotImplementedError("torchsummary shim")

"""Shim: the reference baseline.py imports timm at module scope but the
harness never constructs a timm model."""


def __getattr__(name):
    raise NotImplementedError(f"timm shim: {name} not available in the harness")

"""Shim for the pip `efficientnet_pytorch` the reference baseline.py imports:
re-export the reference's own vendored copy (identical upstream code)."""

from models.efficientnet.efficientnet_pytorch import EfficientNet  # noqa: F401

"""Submodule shim: the reference face_detector.py imports MTCNN from here."""

from facenet_pytorch import MTCNN  # noqa: F401

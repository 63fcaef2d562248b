"""CSV manifest handling (``video label 8_cls`` rows, train.py:197-224).

Loads the reference's space-separated split files, prunes entries whose
face folders are missing on disk, and supports the method-exclusion filter
(train.py:205-224 drops rows whose 8_cls manipulation id is listed).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

COLUMNS = ["video", "label", "8_cls"]


@dataclass
class Manifest:
    videos: list[str]
    labels: list[float]
    multiclass: list[float]

    def __len__(self):
        return len(self.videos)


def load_manifest(
    csv_path: str,
    data_path: str | None = None,
    excluded_methods: list[int] | None = None,
) -> Manifest:
    df = pd.read_csv(csv_path, sep=" ", names=COLUMNS)
    videos, labels, multiclass = [], [], []
    for _, row in df.iterrows():
        video = str(row["video"])
        if data_path is not None and not os.path.isdir(os.path.join(data_path, video)):
            continue  # prune missing videos (train.py:202-204)
        cls8 = row["8_cls"]
        if excluded_methods and not (
            isinstance(cls8, float) and np.isnan(cls8)
        ) and int(cls8) in excluded_methods:
            continue
        videos.append(video)
        labels.append(float(row["label"]))
        multiclass.append(float(cls8) if not pd.isna(cls8) else float("nan"))
    return Manifest(videos, labels, multiclass)

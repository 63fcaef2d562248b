"""CSV manifest handling (``video label 8_cls`` rows, train.py:197-224).

Loads the reference's space-separated split files, prunes entries whose
face folders are missing on disk, and supports the ``--deepfake_methods``
keep-only filter (train.py:217-224 drops every row whose 8_cls manipulation
id is NOT listed — pass 0 to keep pristine videos) plus ``--max_videos``
truncation (train.py:233-236).
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
    deepfake_methods: list[int] | None = None,
    max_videos: int = -1,
    shuffle_seed: int | None = None,
) -> Manifest:
    """``shuffle_seed`` permutes rows before the ``max_videos`` cut — the
    reference shuffles its dataframe with ``random_state`` ahead of
    truncation (test.py:156 + :159), so the kept subset is random, not the
    file head. A numpy permutation, not pandas' sampler: metrics are
    order-independent, only which rows survive the cut differs."""
    df = pd.read_csv(csv_path, sep=" ", names=COLUMNS)
    videos, labels, multiclass = [], [], []
    for _, row in df.iterrows():
        video = str(row["video"])
        if data_path is not None and not os.path.isdir(os.path.join(data_path, video)):
            continue  # prune missing videos (train.py:202-204)
        cls8 = row["8_cls"]
        if deepfake_methods:
            # keep-only filter (train.py:217-224): rows whose 8_cls is not
            # listed are dropped (NaN 8_cls counts as not listed)
            if (isinstance(cls8, float) and np.isnan(cls8)) or int(
                cls8
            ) not in deepfake_methods:
                continue
        videos.append(video)
        labels.append(float(row["label"]))
        multiclass.append(float(cls8) if not pd.isna(cls8) else float("nan"))
    if shuffle_seed is not None and max_videos > -1:
        perm = np.random.RandomState(shuffle_seed).permutation(len(videos))
        videos = [videos[i] for i in perm]
        labels = [labels[i] for i in perm]
        multiclass = [multiclass[i] for i in perm]
    if max_videos > -1:
        videos = videos[:max_videos]
        labels = labels[:max_videos]
        multiclass = multiclass[:max_videos]
    return Manifest(videos, labels, multiclass)

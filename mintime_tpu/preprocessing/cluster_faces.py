"""Identity clustering: embeddings → similarity graph → connected components.

Re-implements the reference chain (``preprocessing/cluster_faces.py:31-120``
+ ``preprocessing/utils.py:16-29``): per video, embed every crop (sorted by
``(frame, face_idx)``), dot-product similarity, build connected components
over edges with sim > threshold (default 0.45, the value both
``cluster_faces.py`` and ``predict.py:144-176`` use), and assign crops to
``<identity_index>/`` folders.

TPU-first design: the embedder is a jitted Flax InceptionResnetV1 batched
over all crops of a video (bucket-padded for executable reuse); the graph
step is a host-side union-find (O(N²) on N = faces/video, which is tiny)
instead of networkx. NOTE the reference computes ``valid_cluster_size``
but never applies it (cluster_faces.py:95; README.md:343 claims otherwise)
— we expose ``min_cluster_size`` with default 0 to match actual reference
behavior while making the documented behavior available.
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass
from typing import Sequence

import numpy as np


def connected_components(similarities: np.ndarray, threshold: float = 0.45) -> list[list[int]]:
    """Union-find over edges with sim > threshold.

    Matches ``_generate_connected_components`` (preprocessing/utils.py:16-29):
    only nodes with at least one over-threshold edge appear in the output
    (isolated crops stay unclustered, i.e. "discarded").
    """
    n = len(similarities)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    has_edge = [False] * n
    for i in range(n):
        row = similarities[i]
        for j in range(i + 1, n):
            if row[j] > threshold:
                union(i, j)
                has_edge[i] = has_edge[j] = True

    groups: dict[int, list[int]] = {}
    for i in range(n):
        if has_edge[i]:
            groups.setdefault(find(i), []).append(i)
    return [sorted(g) for g in groups.values()]


@dataclass
class FaceEmbedder:
    """Batched jitted embedding of face crops (cluster_faces.py:84-92)."""

    variables: dict
    image_size: int = 128

    def __post_init__(self):
        import jax

        from mintime_tpu.preprocessing.facenet import (
            InceptionResnetV1,
            fixed_image_standardization,
        )

        import jax.numpy as jnp

        model = InceptionResnetV1()
        # uint8 in, cast on device: the host→device transfer is 4× smaller
        # (on the bench rig's tunnel that is most of the embed stage) and
        # uint8→f32 cast before standardization is value-identical
        self._fn = jax.jit(
            lambda v, x: model.apply(
                v, fixed_image_standardization(x.astype(jnp.float32))
            )
        )

    @staticmethod
    def init_variables(rng=None):
        import jax
        import jax.numpy as jnp

        from mintime_tpu.preprocessing.facenet import InceptionResnetV1

        rng = rng if rng is not None else jax.random.key(0)
        return InceptionResnetV1().init(
            rng, jnp.zeros((1, 128, 128, 3)), train=False
        )

    def __call__(self, crops: Sequence[np.ndarray]) -> np.ndarray:
        from PIL import Image

        n = len(crops)
        if n == 0:
            return np.zeros((0, 512), np.float32)
        # PIL bilinear resize — matches the reference's torchvision
        # Resize([128,128]) on PIL crops (preprocessing/utils.py:32-34);
        # cv2.INTER_LINEAR is NOT antialiased on downscale and diverges
        size = (self.image_size, self.image_size)
        resized = np.stack(
            [
                np.asarray(Image.fromarray(c).resize(size, Image.BILINEAR))
                for c in crops
            ]
        )  # uint8 — cast to f32 happens device-side inside the jitted fn
        # pad to a multiple of 8 up to 64 (predict clips carry ~10-40 crops
        # and the upload is the stage's wall-clock on a slow link: 20→24
        # ships 25% fewer bytes than 20→32), powers of 2 beyond (bounds the
        # program count for the offline clustering CLI's large folders)
        if n <= 64:
            b = -(-n // 8) * 8
        else:
            b = 64
            while b < n:
                b *= 2
        if b > n:
            resized = np.concatenate(
                [resized, np.zeros((b - n,) + resized.shape[1:], resized.dtype)]
            )
        emb = np.asarray(self._fn(self.variables, resized))
        return emb[:n]


_CROP_RE = re.compile(r"^(\d+)_(\d+)")


def cluster_video_dir(
    video_dir: str,
    embedder: FaceEmbedder,
    similarity_threshold: float = 0.45,
    min_cluster_size: int = 0,
    move_files: bool = True,
) -> dict[str, int]:
    """Cluster the loose crops of one video folder into identity subfolders.

    Crops are sorted by (frame, face_idx) like the reference
    (cluster_faces.py:70). Returns {crop_path: identity_index}; crops in no
    cluster are left in place ("discarded" — later merged by the data layer).
    """
    import cv2

    crops = [
        os.path.join(video_dir, f)
        for f in os.listdir(video_dir)
        if os.path.isfile(os.path.join(video_dir, f)) and _CROP_RE.match(f)
    ]
    crops.sort(
        key=lambda p: tuple(int(g) for g in _CROP_RE.match(os.path.basename(p)).groups())
    )
    if not crops:
        return {}
    images = [cv2.imread(p) for p in crops]
    valid = [i for i, im in enumerate(images) if im is not None]
    embeddings = embedder([images[i] for i in valid])
    sims = embeddings @ embeddings.T
    components = connected_components(sims, similarity_threshold)
    components = [c for c in components if len(c) >= min_cluster_size]

    assignment: dict[str, int] = {}
    for identity_index, comp in enumerate(components):
        for local in comp:
            src = crops[valid[local]]
            assignment[src] = identity_index
            if move_files:
                dst_dir = os.path.join(video_dir, str(identity_index))
                os.makedirs(dst_dir, exist_ok=True)
                shutil.move(src, os.path.join(dst_dir, os.path.basename(src)))
    return assignment


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("mintime-tpu cluster_faces")
    p.add_argument("--faces_path", required=True, help="root of extracted crops")
    p.add_argument("--similarity_threshold", type=float, default=0.45)
    p.add_argument("--valid_cluster_size_ratio", type=float, default=0.0)
    p.add_argument("--facenet_weights", default=None, help="facenet-pytorch state_dict")
    opt = p.parse_args(argv)

    if opt.facenet_weights:
        import torch

        from mintime_tpu.preprocessing.facenet import facenet_params_from_torch

        variables = facenet_params_from_torch(
            torch.load(opt.facenet_weights, map_location="cpu")
        )
    else:
        print("WARNING: no --facenet_weights; using random embedder (structural run)")
        variables = FaceEmbedder.init_variables()
    embedder = FaceEmbedder(variables)

    n_done = 0
    for root, dirs, files in os.walk(opt.faces_path):
        crop_files = [f for f in files if _CROP_RE.match(f)]
        if not crop_files:
            continue
        if any(d.isdigit() for d in dirs):
            continue  # already clustered (idempotence, cluster_faces.py:57-63)
        cluster_video_dir(root, embedder, opt.similarity_threshold)
        n_done += 1
    print(f"clustered {n_done} videos")


if __name__ == "__main__":
    main()

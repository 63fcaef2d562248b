"""Size-bucket correctness: original-video dimensions must reach the dataset.

The reference opens the original video per identity to get width*height for
the face/frame area ratio (deepfakes_dataset.py:250-263). These tests pin:
* dims sidecar (extract_crops contract) and --video_path probing both work,
* mixed-resolution datasets produce the reference's bucket indices,
* unknown dims are a hard error, never a silent 720p guess.
"""

import json
import os

import cv2
import numpy as np
import pytest

from mintime_tpu.data.dataset import (
    DeepfakesDataset,
    probe_video_dims,
    read_dims_sidecar,
    resolve_original_video,
)


def _make_video_dir(root, name, face_side, dims=None):
    vdir = root / name / "0"
    vdir.mkdir(parents=True)
    img = np.full((face_side, face_side, 3), 128, np.uint8)
    for frame in range(0, 120, 30):
        cv2.imwrite(str(vdir / f"{frame}_0.png"), img)
    if dims is not None:
        (root / name / "video_dims.json").write_text(
            json.dumps({"width": dims[0], "height": dims[1], "fps": 30})
        )
    return str(root / name)


def _ds(root, videos, **kw):
    return DeepfakesDataset(
        videos, [0.0] * len(videos), data_path=str(root),
        image_size=64, num_frames=8, num_patches=4, max_identities=2,
        mode="val", **kw,
    )


def _expected_bucket(face_side, vw, vh):
    # deepfakes_dataset.py:250-263: both areas halved, integer percent,
    # 5%-wide inclusive ranges, 1-based
    ratio = int((face_side * face_side / 2) * 100 / (vw * vh / 2))
    return min(ratio // 5 + 1, 20)


def test_sidecar_buckets_mixed_resolution(tmp_path):
    # same face size in two videos of different resolution ⇒ different buckets
    _make_video_dir(tmp_path, "vid_hd", 200, dims=(1920, 1080))
    _make_video_dir(tmp_path, "vid_sd", 200, dims=(480, 360))
    ds = _ds(tmp_path, ["vid_hd", "vid_sd"])
    b_hd = ds[0]["size_embedding"]
    b_sd = ds[1]["size_embedding"]
    assert b_hd[0] == _expected_bucket(200, 1920, 1080)
    assert b_sd[0] == _expected_bucket(200, 480, 360)
    assert b_hd[0] != b_sd[0]


def test_unknown_dims_is_hard_error(tmp_path):
    _make_video_dir(tmp_path, "vid", 100, dims=None)
    ds = _ds(tmp_path, ["vid"])
    with pytest.raises(ValueError, match="original video dimensions"):
        ds[0]

    # explicit opt-in restores the fixed assumption
    ds2 = _ds(tmp_path, ["vid"], default_video_dims=(1280, 720))
    assert ds2[0]["size_embedding"][0] == _expected_bucket(100, 1280, 720)


def test_video_path_probing_with_val_fallback(tmp_path):
    faces = tmp_path / "faces"
    _make_video_dir(faces, os.path.join("val", "real", "clip"), 100, dims=None)
    # original video lives under train/ (reference val→train fallback,
    # deepfakes_dataset.py:204-206)
    vdir = tmp_path / "videos" / "train" / "real"
    vdir.mkdir(parents=True)
    vw, vh = 320, 240
    writer = cv2.VideoWriter(
        str(vdir / "clip.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30, (vw, vh)
    )
    for _ in range(3):
        writer.write(np.zeros((vh, vw, 3), np.uint8))
    writer.release()

    resolved = resolve_original_video(str(tmp_path / "videos"), "val/real/clip")
    assert resolved and resolved.endswith(os.path.join("train", "real", "clip.mp4"))
    assert probe_video_dims(resolved) == (vw, vh)

    ds = _ds(faces, ["val/real/clip"], video_path=str(tmp_path / "videos"))
    assert ds[0]["size_embedding"][0] == _expected_bucket(100, vw, vh)
    # probed once, cached
    assert ds.video_dims["val/real/clip"] == (vw, vh)


def test_sidecar_not_scanned_as_discarded_crop(tmp_path):
    from mintime_tpu.data.dataset import scan_video_dir

    vdir = _make_video_dir(tmp_path, "vid", 50, dims=(640, 480))
    vf = scan_video_dir(vdir)
    assert vf.discarded == []
    assert read_dims_sidecar(vdir) == (640, 480)

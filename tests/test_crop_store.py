"""Packed crop store: format roundtrip, PNG⇔pack sample equivalence, and
the cached dataset index (VERDICT r2 missing#1 — the host-pipeline rebuild).
"""

import json
import os
import shutil

import cv2
import numpy as np
import pytest

from mintime_tpu.data.crop_store import (
    CropPack,
    find_pack,
    image_dims_header,
    pack_video_dir,
    write_pack,
)
from mintime_tpu.data.dataset import DeepfakesDataset, scan_video_dir, video_faces_from_pack


def _make_png_video(root, name="vid", identities=2, frames=(0, 30, 60, 90),
                    loose=(120,), dims=(640, 360), seed=0):
    """Reference layout: identity folders + loose discarded crops + sidecar."""
    rng = np.random.default_rng(seed)
    vdir = os.path.join(root, name)
    for ident in range(identities):
        idir = os.path.join(vdir, str(ident))
        os.makedirs(idir, exist_ok=True)
        for f in frames:
            img = rng.integers(0, 255, (64 + 8 * ident, 64 + 8 * ident, 3),
                               dtype=np.uint8)
            cv2.imwrite(os.path.join(idir, f"{f}_0.png"), img)
    os.makedirs(vdir, exist_ok=True)
    for f in loose:
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(vdir, f"{f}_0.png"), img)
    with open(os.path.join(vdir, "video_dims.json"), "w") as fh:
        json.dump({"width": dims[0], "height": dims[1], "fps": 30}, fh)
    return vdir


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    crops = [
        ("0", 0, 0, rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)),
        ("0", 30, 0, rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)),
        (None, 60, 1, rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)),
    ]
    path = str(tmp_path / "crops.pack")
    n = write_pack(path, iter(crops), dims={"width": 640, "height": 360})
    assert n == 3
    pack = CropPack(path)
    assert pack.dims == {"width": 640, "height": 360}
    assert len(pack) == 3
    for i, (ident, frame, face, crop) in enumerate(crops):
        ident_r, frame_r, face_r, h, w, _ = pack.entries[i]
        assert (ident_r, frame_r, face_r) == (ident, frame, face)
        assert (h, w) == crop.shape[:2]
        np.testing.assert_array_equal(pack.read(i), crop)


def test_image_dims_header_matches_decode(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    for ext in (".png", ".jpg", ".bmp"):
        p = str(tmp_path / f"x{ext}")
        cv2.imwrite(p, img)
        dims = image_dims_header(p)
        decoded = cv2.imread(p)
        assert dims == (decoded.shape[1], decoded.shape[0]), ext


def test_pack_video_dir_preserves_index(tmp_path):
    vdir = _make_png_video(str(tmp_path), loose=(120, 150))
    scan = scan_video_dir(vdir)
    pack_path = pack_video_dir(vdir)
    assert pack_path == find_pack(vdir)
    pack = CropPack(pack_path)
    packed = video_faces_from_pack(pack, vdir)
    assert [i.key for i in packed.identities] == [i.key for i in scan.identities]
    for a, b in zip(packed.identities, scan.identities):
        assert a.frames == b.frames
        assert a.mean_side == pytest.approx(b.mean_side)
    assert [f for f, _ in packed.discarded] == [f for f, _ in scan.discarded]
    # pixel equality per ref
    for key in scan.faces:
        for ref_png, ref_pack in zip(scan.faces[key], packed.faces[key]):
            np.testing.assert_array_equal(cv2.imread(ref_png), pack.read(ref_pack))
    # idempotent second call
    assert pack_video_dir(vdir) == pack_path


def _sample_dict(ds, i):
    s = ds[i]
    return {k: v for k, v in s.items()}


def test_dataset_samples_identical_packed_vs_png(tmp_path):
    png_root = str(tmp_path / "png")
    pack_root = str(tmp_path / "pack")
    for v in range(3):
        _make_png_video(png_root, f"video_{v}", identities=1 + v % 3,
                        loose=(120,) if v else (), seed=v)
    shutil.copytree(png_root, pack_root)
    for v in range(3):
        pack_video_dir(os.path.join(pack_root, f"video_{v}"),
                       remove_images=True)
        # remove_images leaves no crop PNGs behind
        for dirpath, _, files in os.walk(os.path.join(pack_root, f"video_{v}")):
            assert not any(f.endswith(".png") for f in files)

    mk = lambda root: DeepfakesDataset(
        [f"video_{v}" for v in range(3)], [0.0, 1.0, 1.0], data_path=root,
        image_size=64, num_frames=8, num_patches=4, max_identities=2,
        mode="train", augmentation="min", seed=7,
    )
    ds_png, ds_pack = mk(png_root), mk(pack_root)
    for i in range(3):
        a, b = _sample_dict(ds_png, i), _sample_dict(ds_pack, i)
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"video {i} {k}")


def test_index_cached_across_epochs(tmp_path):
    vdir = _make_png_video(str(tmp_path), "video_0")
    ds = DeepfakesDataset(
        ["video_0"], [1.0], data_path=str(tmp_path), image_size=64,
        num_frames=8, num_patches=4, mode="val",
    )
    ds.preload_index(workers=2)
    first = ds[0]
    # nuke the on-disk crops: a cached index must not re-scan
    shutil.rmtree(os.path.join(vdir, "0"))
    second = ds[0]
    # frames for identity "0" now decode as None→zeros if re-read from disk;
    # equality proves the INDEX is cached (paths for identity 1 still valid)
    np.testing.assert_array_equal(first["mask"], second["mask"])
    np.testing.assert_array_equal(first["positions"], second["positions"])


def test_pack_crops_cli(tmp_path):
    from mintime_tpu.preprocessing.pack_crops import main as pack_main

    faces = str(tmp_path / "faces")
    for split in ("train", "val"):
        for v in range(2):
            _make_png_video(os.path.join(faces, split), f"video_{v}", seed=v)
    pack_main(["--faces_dir", faces, "--workers", "2"])
    for split in ("train", "val"):
        for v in range(2):
            assert find_pack(os.path.join(faces, split, f"video_{v}"))


def test_extract_crops_packed(tmp_path):
    """--packed writes a pack whose single-identity fallback matches the
    loose-PNG pre-clustering layout."""
    from mintime_tpu.preprocessing.extract_crops import extract_video

    video = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    rng = np.random.default_rng(3)
    for _ in range(61):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()
    boxes = {"1": [[4, 4, 20, 20]], "31": [[6, 6, 22, 22]]}
    bpath = str(tmp_path / "v.json")
    with open(bpath, "w") as f:
        json.dump(boxes, f)

    out_png = str(tmp_path / "png_out")
    out_pack = str(tmp_path / "pack_out")
    crops_a = extract_video(video, bpath, out_png)
    crops_b = extract_video(video, bpath, out_pack, packed=True)
    assert len(crops_a) == len(crops_b) > 0
    assert not any(f.endswith(".png") for f in os.listdir(out_pack))
    a = video_faces_from_pack(CropPack(find_pack(out_pack)), out_pack)
    b = scan_video_dir(out_png)
    assert len(a.identities) == len(b.identities) == 1
    assert a.identities[0].frames == b.identities[0].frames

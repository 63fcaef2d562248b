"""Golden parity of the TRAIN-TIME dataset against the reference's own
``DeepFakesDataset`` (deepfakes_dataset.py), driven directly via the test
shims (magic + albumentations val path).

The predict-side assembly is already golden-proven (test_golden_examples);
this closes the dataset path the training loop actually consumes: directory
scan + magic-width identity ordering, the DISCARDED-crop merge into
identity 0 (deepfakes_dataset.py:227-235), quota/deficit/backfill rows,
the alternating even/odd uniform subsample (:239-246), size buckets from
the probed original .mp4 (with the val→train fallback, :202-206), the
(accidentally all-ones) mask, identities mask, and temporal positions.
Val mode — its transform chain is deterministic; train-mode augmentation
parity is distribution-level by design (PARITY #11-12).
"""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_shims")

pytestmark = [pytest.mark.parity, pytest.mark.slow]

F, P = 8, 4
IMG = 64
DIMS = (640, 360)


@pytest.fixture(scope="module")
def ref_dataset_module():
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    for p in (SHIMS, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import deepfakes_dataset as rdd

    return rdd


def _write_video(path, dims=DIMS):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, dims)
    for _ in range(3):
        w.write(np.zeros((dims[1], dims[0], 3), np.uint8))
    w.release()


def _crop(rng, side):
    return rng.integers(0, 255, (side, side, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """faces/val/0/<vid>/... + videos/{val,train}/0/<vid>.mp4.

    * vid_a: 2 identities (12 and 5 faces, distinct mean sizes) + 2 loose
      discarded crops, one covering a frame identity 0 misses (merge path)
      and one colliding with an existing frame (must be ignored).
    * vid_b: 1 identity, fewer faces than F (dummy padding path).
    * vid_c: 3 identities (quota rows at max_identities=3); its original
      .mp4 exists only under train/ (val→train fallback).
    """
    root = tmp_path_factory.mktemp("golden_ds")
    faces = str(root / "faces")
    videos = str(root / "videos")
    rng = np.random.default_rng(0)

    a = os.path.join(faces, "val", "0", "vid_a")
    for frame in range(0, 360, 30):  # 12 faces, side 80
        os.makedirs(os.path.join(a, "identity_0"), exist_ok=True)
        cv2.imwrite(os.path.join(a, "identity_0", f"{frame}_0.png"),
                    _crop(rng, 80))
    for frame in range(0, 150, 30):  # 5 faces, side 48
        os.makedirs(os.path.join(a, "identity_1"), exist_ok=True)
        cv2.imwrite(os.path.join(a, "identity_1", f"{frame}_0.png"),
                    _crop(rng, 48))
    cv2.imwrite(os.path.join(a, "390_0.png"), _crop(rng, 100))  # missing frame
    cv2.imwrite(os.path.join(a, "0_1.png"), _crop(rng, 100))  # frame collides
    _write_video(os.path.join(videos, "val", "0", "vid_a.mp4"))

    b = os.path.join(faces, "val", "0", "vid_b")
    os.makedirs(os.path.join(b, "identity_0"), exist_ok=True)
    for frame in range(0, 150, 30):  # 5 faces < F
        cv2.imwrite(os.path.join(b, "identity_0", f"{frame}_0.png"),
                    _crop(rng, 64))
    _write_video(os.path.join(videos, "val", "0", "vid_b.mp4"))

    # named like ForgeryNet faces dirs ("<id>.mp4"): the reference's
    # val->train fallback re-uses the id VERBATIM (no ".mp4" append,
    # deepfakes_dataset.py:205-206), so it only resolves for such names
    c = os.path.join(faces, "val", "0", "vid_c.mp4")
    for ident, (side, n) in enumerate(((96, 6), (72, 4), (56, 3))):
        idir = os.path.join(c, f"identity_{ident}")
        os.makedirs(idir, exist_ok=True)
        for frame in range(0, n * 30, 30):
            cv2.imwrite(os.path.join(idir, f"{frame}_0.png"), _crop(rng, side))
    _write_video(os.path.join(videos, "train", "0", "vid_c.mp4"))  # fallback

    return faces, videos


VIDS = ["val/0/vid_a", "val/0/vid_b", "val/0/vid_c.mp4"]
MAXID = {"val/0/vid_a": 2, "val/0/vid_b": 2, "val/0/vid_c.mp4": 3}


def _our_dataset(faces, videos, vids, max_identities):
    from mintime_tpu.data.dataset import DeepfakesDataset

    return DeepfakesDataset(
        vids, [1.0] * len(vids), data_path=faces, image_size=IMG,
        num_frames=F, num_patches=P, max_identities=max_identities,
        mode="val", video_path=videos, legacy_all_ones_mask=True,
    )


@pytest.mark.parametrize("vid", VIDS)
@pytest.mark.parametrize("index_parity", [0, 1])
def test_dataset_sample_matches_reference(ref_dataset_module, tree, vid,
                                          index_parity):
    faces, videos = tree
    # put the target video at the desired index so both sides take the same
    # even/odd subsample branch (deepfakes_dataset.py:241-246)
    vids = [vid] if index_parity == 0 else [VIDS[(VIDS.index(vid) + 1) % 3], vid]
    index = index_parity

    ref_ds = ref_dataset_module.DeepFakesDataset(
        vids, [1.0] * len(vids), data_path=faces, video_path=videos,
        image_size=IMG, mode="val", num_frames=F,
        max_identities=MAXID[vid], num_patches=P,
    )
    r_seq, r_sizes, r_mask, r_idm, r_pos, _y = ref_ds[index]

    ours = _our_dataset(faces, videos, vids, MAXID[vid])[index]

    np.testing.assert_array_equal(r_mask.numpy(), ours["mask"], err_msg=vid)
    np.testing.assert_array_equal(
        r_sizes.numpy().astype(np.int32), ours["size_embedding"], err_msg=vid
    )
    np.testing.assert_array_equal(r_idm.numpy(), ours["identities_mask"],
                                  err_msg=vid)
    np.testing.assert_array_equal(r_pos.numpy(), ours["positions"],
                                  err_msg=vid)
    np.testing.assert_array_equal(
        r_seq.numpy(), ours["frames"].astype(np.float32), err_msg=vid
    )


def test_packed_dataset_matches_reference_too(ref_dataset_module, tree,
                                              tmp_path):
    """The crops.pack fast path reproduces the reference sample bit-for-bit
    as well (pack → index → read, no directory scan or PNG decode)."""
    import shutil

    from mintime_tpu.data.crop_store import pack_video_dir

    faces, videos = tree
    packed = str(tmp_path / "faces_packed")
    shutil.copytree(faces, packed)
    for vid in VIDS:
        pack_video_dir(os.path.join(packed, vid), remove_images=True)

    vid = "val/0/vid_a"
    ref_ds = ref_dataset_module.DeepFakesDataset(
        [vid], [1.0], data_path=faces, video_path=videos, image_size=IMG,
        mode="val", num_frames=F, max_identities=2, num_patches=P,
    )
    r_seq, r_sizes, r_mask, r_idm, r_pos, _ = ref_ds[0]
    ours = _our_dataset(packed, videos, [vid], 2)[0]
    np.testing.assert_array_equal(r_mask.numpy(), ours["mask"])
    np.testing.assert_array_equal(r_sizes.numpy().astype(np.int32),
                                  ours["size_embedding"])
    np.testing.assert_array_equal(r_pos.numpy(), ours["positions"])
    np.testing.assert_array_equal(r_seq.numpy(),
                                  ours["frames"].astype(np.float32))

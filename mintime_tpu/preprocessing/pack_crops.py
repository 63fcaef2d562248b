"""Pack a preprocessed faces tree into per-video crop shards.

Run AFTER the offline chain (detect → extract_crops → split → cluster) to
convert each video's PNG crop folder into one ``crops.pack`` binary shard
(format: :mod:`mintime_tpu.data.crop_store`). The dataset layer
auto-detects packs and then never touches PNG decode or directory walks on
the training hot path — SURVEY §2.1's "sharded array store instead of
millions of PNGs" design; the reference instead decodes PNGs per sample
per epoch (deepfakes_dataset.py:248).

Identity structure (subfolder names) and loose discarded crops are
preserved in the pack header, so packed and unpacked datasets produce
bit-identical samples. ``--remove_images`` deletes the PNGs after packing
(the pack keeps the same pixels, cv2-decoded BGR uint8); by default both
coexist and the pack wins.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor


def iter_video_dirs(faces_root: str):
    """Yield every directory that holds crops directly or via identity
    subfolders — i.e. the dataset's per-video folders at any nesting depth
    (``faces/<split>/<class>/<video>/<identity_k>/*.png``)."""
    from mintime_tpu.data.dataset import _CROP_EXTS

    for dirpath, dirnames, filenames in os.walk(faces_root):
        has_crops = any(f.lower().endswith(_CROP_EXTS) for f in filenames)
        child_has_crops = False
        for d in dirnames:
            try:
                child = os.listdir(os.path.join(dirpath, d))
            except OSError:
                continue
            if any(f.lower().endswith(_CROP_EXTS) for f in child) and not any(
                os.path.isdir(os.path.join(dirpath, d, f)) for f in child
            ):
                child_has_crops = True
        if child_has_crops or (has_crops and not dirnames):
            yield dirpath
            dirnames[:] = []  # don't descend into identity folders


def main(argv=None):
    import argparse

    from mintime_tpu.data.crop_store import pack_video_dir

    p = argparse.ArgumentParser("mintime-tpu pack_crops")
    p.add_argument("--faces_dir", required=True,
                   help="root of the clustered faces tree to pack")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--remove_images", action="store_true", default=False,
                   help="delete the source PNGs after packing")
    opt = p.parse_args(argv)

    dirs = list(iter_video_dirs(opt.faces_dir))
    with ThreadPoolExecutor(max(1, opt.workers)) as pool:
        done = sum(
            1
            for r in pool.map(
                lambda d: pack_video_dir(d, remove_images=opt.remove_images), dirs
            )
            if r
        )
    print(f"packed {done}/{len(dirs)} video folders under {opt.faces_dir}")


if __name__ == "__main__":
    main()

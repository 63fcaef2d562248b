"""Face-crop extraction: boxes JSON + video → square face crops on disk.

Same geometry as the reference (``preprocessing/extract_crops.py:24-123``):
one detection per second of video, detector boxes scaled x2 back to full
resolution (detection ran at half-res, face_detector.py:78), each side
padded by w/3 / h/3 to catch background, then squared by trimming the long
axis. Crops are written ``<frame>_<faceidx>.png`` into one folder per video
— the exact layout the data layer and clustering consume.

The reference decodes the whole video into RAM and uses a 40-process Pool
(extract_crops.py:154-157); here decoding is streaming (frame-seek) and
parallelism is a thread pool (cv2 releases the GIL).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Mapping, Sequence

import numpy as np


def square_crop(frame: np.ndarray, bbox_half_res: Sequence[float]) -> np.ndarray:
    """Crop one face with the reference's exact geometry
    (extract_crops.py:76-109)."""
    xmin, ymin, xmax, ymax = [int(b * 2) for b in bbox_half_res]
    w = xmax - xmin
    h = ymax - ymin
    p_h = h // 3
    p_w = w // 3
    crop_h = (ymax + p_h) - max(ymin - p_h, 0)
    crop_w = (xmax + p_w) - max(xmin - p_w, 0)
    if crop_h > crop_w:
        p_h -= int((crop_h - crop_w) / 2)
    else:
        p_w -= int((crop_w - crop_h) / 2)
    crop = frame[max(ymin - p_h, 0) : ymax + p_h, max(xmin - p_w, 0) : xmax + p_w]
    h, w = crop.shape[:2]
    if h > w:
        diff = int((h - w) / 2)
        crop = crop[diff:-diff, :] if diff > 0 else crop[1:, :]
    elif h < w:
        diff = int((w - h) / 2)
        crop = crop[:, diff:-diff] if diff > 0 else crop[:, :-1]
    return crop


def pick_detection_frame(
    boxes: Mapping[str, list | None], second_start: int, fps: int
) -> int | None:
    """First frame in (start, start+fps-1) — EXCLUSIVE of both ends — with
    detections (extract_crops.py:60-71 index walk; a hit at exactly
    ``limit = start+fps-1`` breaks the reference's loop with ``index ==
    limit`` and is then discarded by the ``continue`` guard, so the last
    index of the window never yields a crop; same quirk in
    predict.py:95-100)."""
    limit = second_start + fps - 1
    index = second_start
    keys = {int(k) for k in boxes}
    while index + 1 < limit:
        index += 1
        if index in keys and boxes[str(index)] is not None:
            return index
    return None


def extract_video(
    video_path: str,
    boxes_path: str,
    output_dir: str,
    write: bool = True,
    packed: bool = False,
) -> list[tuple[int, int, np.ndarray]]:
    """Extract ~1 crop set per second. Returns [(frame_idx, face_idx, crop)].

    ``packed=True`` writes one ``crops.pack`` shard (crop_store format,
    identity=None for every entry since clustering hasn't run yet) instead
    of per-crop PNGs — the low-IO path for fresh datasets; ``pack_crops``
    re-packs after clustering assigns identities.
    """
    import cv2

    with open(boxes_path) as f:
        boxes = json.load(f)
    capture = cv2.VideoCapture(video_path)
    fps = int(capture.get(cv2.CAP_PROP_FPS)) or 30
    frames: list[np.ndarray] = []
    while True:
        ok, frame = capture.read()
        if not ok:
            break
        frames.append(frame)
    capture.release()

    out = []
    if write:
        os.makedirs(output_dir, exist_ok=True)
        if frames:
            # original-video dimensions sidecar: lets the data layer compute
            # size buckets (deepfakes_dataset.py:250-253 re-opens the .mp4
            # per sample for width*height) without the original videos.
            with open(os.path.join(output_dir, "video_dims.json"), "w") as f:
                json.dump(
                    {"width": frames[0].shape[1], "height": frames[0].shape[0],
                     "fps": fps},
                    f,
                )
    for i in range(0, len(frames), fps):
        det = pick_detection_frame(boxes, i, fps)
        if det is None:
            continue
        for j, bbox in enumerate(boxes[str(det)] or []):
            crop = square_crop(frames[i], bbox)
            if crop.size == 0:
                continue
            out.append((i, j, crop))
            if write and not packed:
                cv2.imwrite(os.path.join(output_dir, f"{i}_{j}.png"), crop)
    if write and packed and out:
        from mintime_tpu.data.crop_store import PACK_NAME, write_pack

        dims = None
        if frames:
            dims = {"width": frames[0].shape[1], "height": frames[0].shape[0],
                    "fps": fps}
        write_pack(
            os.path.join(output_dir, PACK_NAME),
            ((None, f, j, c) for f, j, c in out),
            dims=dims,
        )
    return out


def main(argv=None):
    import argparse
    import glob

    p = argparse.ArgumentParser("mintime-tpu extract_crops")
    p.add_argument("--video_path", required=True, help="root of .mp4 videos")
    p.add_argument("--boxes_path", required=True, help="root of per-video boxes json")
    p.add_argument("--output_path", required=True)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--packed", action="store_true", default=False,
                   help="write one crops.pack shard per video instead of "
                        "PNGs (see mintime_tpu.data.crop_store)")
    opt = p.parse_args(argv)

    videos = sorted(glob.glob(os.path.join(opt.video_path, "**", "*.mp4"), recursive=True))

    def job(video):
        rel = os.path.relpath(video, opt.video_path)
        stem = os.path.splitext(rel)[0]
        bpath = os.path.join(opt.boxes_path, stem + ".json")
        if not os.path.exists(bpath):
            return 0
        outdir = os.path.join(opt.output_path, stem)
        if os.path.isdir(outdir) and os.listdir(outdir):
            return 0  # idempotent skip
        return len(extract_video(video, bpath, outdir, packed=opt.packed))

    with ThreadPoolExecutor(opt.workers) as pool:
        total = sum(pool.map(job, videos))
    print(f"wrote {total} crops from {len(videos)} videos")


if __name__ == "__main__":
    main()

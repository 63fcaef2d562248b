"""Face-detection driver: videos → per-video boxes JSON.

Same contract as the reference (``preprocessing/detect_faces.py:18-68``):
every frame is decoded and downscaled 2x (face_detector.py:78), the MTCNN
cascade runs per frame, and a ``<video>.json`` of
``{frame_idx: [[x1,y1,x2,y2], ...] | null}`` (half-resolution coordinates)
is written next to the dataset. Videos with an existing JSON are skipped
(idempotence, detect_faces.py:36-37); videos where no frame had a face are
reported as missed (detect_faces.py:59-68).

Unlike the reference's strictly serial video loop, ``process_videos``
pipelines three stages across consecutive videos: a decode thread reads
video ``i+2`` while the device runs video ``i+1``'s P-Net pyramid
(``MTCNNDetector.detect_videos_iter``'s one-video-deep dispatch lookahead)
while the host finishes video ``i``'s NMS + R/O-Net stages and writes its
JSON. Results are bit-identical to the serial path
(``tests/test_preprocessing.py`` covers the driver equivalence).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np


def _validate_channel_order(channel_order: str) -> None:
    if channel_order not in ("rgb", "bgr"):
        raise ValueError(
            f"channel_order must be 'rgb' or 'bgr', got {channel_order!r}"
        )


def decode_half_res(
    video_path: str, channel_order: str = "rgb", with_dims: bool = False
):
    """Decode all frames at half resolution (face_detector.py:59-83).

    The BGR→RGB swap is a pure channel permutation, so it commutes
    bit-identically with the resize — done at half res it touches 4× fewer
    pixels, and with ``channel_order="bgr"`` it is skipped entirely for a
    detector that swaps on device (``MTCNNDetector(channel_order="bgr")``);
    cv2.cvtColor over a 300-frame clip costs ~0.7 s on a 1-core host.

    ``with_dims=True`` additionally returns the ORIGINAL-resolution dims
    dict (read from the open capture, saving the extra cv2.VideoCapture
    the dims sidecar used to pay)."""
    import cv2

    _validate_channel_order(channel_order)
    capture = cv2.VideoCapture(video_path)
    fps = int(capture.get(cv2.CAP_PROP_FPS)) or 30
    dims = {
        "width": int(capture.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(capture.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        "fps": fps,
    }
    frames = []
    while True:
        ok, frame = capture.read()
        if not ok:
            break
        frame = cv2.resize(frame, (frame.shape[1] // 2, frame.shape[0] // 2))
        if channel_order == "rgb":
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        frames.append(frame)
    capture.release()
    if with_dims:
        return frames, fps, dims
    return frames, fps


def detect_video(video_path: str, detector, every_n: int = 1) -> dict:
    """Run the cascade over (a stride of) the frames → boxes dict.

    Uses the batched cascade (``detect_batch``): one P-Net dispatch per
    pyramid level over ALL selected frames instead of a per-frame loop
    (SURVEY §2.1 "batched MTCNN").
    """
    frames, _ = decode_half_res(
        video_path, channel_order=getattr(detector, "channel_order", "rgb")
    )
    indices = list(range(0, len(frames), every_n))
    per_frame = detector.detect_batch([frames[i] for i in indices])
    return {
        str(i): boxes[:, :4].tolist() if len(boxes) else None
        for i, boxes in zip(indices, per_frame)
    }


def _decode_to_shm(path: str, channel_order: str):
    """Decode worker body for ``decode_workers`` mode: half-res frames land
    in a POSIX shared-memory block so the hand-off to the parent is
    zero-copy (a 300-frame 360p clip is ~200 MB — piping that through a
    pickle per video would eat the multi-process win).

    Returns ``(shm_name | None, shape, fps, dims, frames | None)`` — the
    pickled-``frames`` fallback covers containers whose frame-count
    metadata undershoots the real stream (CAP_PROP_FRAME_COUNT is an
    estimate for some codecs)."""
    import cv2
    from multiprocessing import shared_memory

    _validate_channel_order(channel_order)
    cap = cv2.VideoCapture(path)
    fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
    dims = {
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        "fps": fps,
    }
    n_est = max(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)), 0) + 8
    h2, w2 = dims["height"] // 2, dims["width"] // 2
    shm = None
    buf = None
    tried_alloc = False
    overflow: list = []
    t = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.resize(frame, (frame.shape[1] // 2, frame.shape[0] // 2))
        if channel_order == "rgb":
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if not tried_alloc:
            tried_alloc = True
            h2, w2 = frame.shape[:2]  # authoritative (metadata can lie)
            try:
                shm = shared_memory.SharedMemory(
                    create=True, size=max(n_est, 1) * h2 * w2 * 3
                )
                buf = np.ndarray((n_est, h2, w2, 3), np.uint8, buffer=shm.buf)
            except OSError:
                pass  # no /dev/shm capacity: fall back to pickled frames
        # once ANY frame lands in overflow, everything after must too —
        # interleaving buf and overflow frames would scramble the order
        if (buf is not None and not overflow and t < n_est
                and frame.shape[:2] == (h2, w2)):
            buf[t] = frame
        else:
            overflow.append(frame)
        t += 1
    cap.release()
    if overflow or shm is None:
        # metadata undershot (or no shm): ship everything pickled instead.
        # unlink() below also UNregisters with the resource tracker, which
        # pairs with the registration from create=True — no manual
        # bookkeeping here (a second unregister would KeyError the tracker)
        in_buf = 0 if buf is None else t - len(overflow)
        frames = [np.array(buf[i]) for i in range(in_buf)] + overflow
        if shm is not None:
            buf = None
            shm.close()
            shm.unlink()
        return None, (len(frames), h2, w2, 3), fps, dims, frames
    # ownership moves to the parent (which unlinks after detection consumes
    # the frames): take the WORKER's resource tracker out of it so it does
    # not unlink the segment when this worker process exits
    try:
        from multiprocessing import resource_tracker

        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass
    buf = None
    shm.close()  # parent re-opens by name; creator must close its mapping
    return shm.name, (t, h2, w2, 3), fps, dims, None


def process_videos(
    videos: Sequence[str],
    video_root: str,
    output_root: str,
    detector,
    every_n: int = 1,
    decode_workers: int = 0,
) -> list[str]:
    """Detect faces for each video, writing ``<output_root>/<rel>.json``.
    Returns the list of videos with zero detections (the miss report).

    Pipelined: decode-ahead worker(s) + the detector's one-video-deep
    stage-1 dispatch lookahead (``detect_videos_iter``), so cv2 decode,
    device pyramid compute, and host NMS/JSON-writing for consecutive
    videos overlap. Output files and miss report are identical to the
    serial per-video path.

    ``decode_workers=0`` (default) decodes on ONE thread — right for a
    single-core host, where a second runnable thread only convoys on the
    GIL (measured: bench.py's staged-pipelined e2e notes). ``N > 0`` runs N
    decode PROCESSES with zero-copy shared-memory frame hand-off — the
    multi-core production setting, where ffmpeg decode scales per core and
    the GIL no longer serializes decode against host NMS. Lookahead stays
    bounded at ``decode_workers + 1`` videos in flight.
    """
    channel_order = getattr(detector, "channel_order", "rgb")
    todo = []
    for video in videos:
        rel = os.path.relpath(video, video_root)
        out_path = os.path.join(output_root, os.path.splitext(rel)[0] + ".json")
        if os.path.exists(out_path):
            continue
        todo.append((video, out_path))

    if decode_workers > 0:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        decode_pool = ProcessPoolExecutor(
            max_workers=decode_workers, mp_context=mp.get_context("fork")
        )
        lookahead = decode_workers + 1

        def decode(path):
            return decode_pool.submit(_decode_to_shm, path, channel_order)

        def consume(fut):
            from multiprocessing import shared_memory

            name, shape, fps, dims, frames = fut.result()
            if name is None:
                return frames, dims, None
            shm = shared_memory.SharedMemory(name=name)
            # no tracker bookkeeping here: fork-context workers share the
            # parent's resource-tracker process, and the worker already
            # unregistered the segment at creation (ownership handed to us)
            arr = np.ndarray(shape, np.uint8, buffer=shm.buf)
            # hand out per-frame views; the cleanup closure frees the block
            # once the video's detection results have been consumed
            frames = [arr[i] for i in range(shape[0])]

            def cleanup():
                # numpy views of the LAST video may still be alive in the
                # generator's locals when this runs: close() then raises
                # BufferError — swallow it; the unlinked POSIX segment is
                # freed when the final mapping dies with those views
                try:
                    shm.close()
                except BufferError:
                    pass
                try:
                    shm.unlink()
                except FileNotFoundError:
                    pass

            return frames, dims, cleanup

    else:
        decode_pool = ThreadPoolExecutor(max_workers=1)
        lookahead = 2

        def decode(path):
            def run():
                frames, _, dims = decode_half_res(
                    path, channel_order=channel_order, with_dims=True
                )
                return frames, dims

            return decode_pool.submit(run)

        def consume(fut):
            frames, dims = fut.result()
            return frames, dims, None

    from collections import deque

    missed: list[str] = []
    in_flight: deque = deque()  # outer scope: the finally can drain it
    try:
        dims_by_index: dict[int, dict] = {}
        indices_by_video: list[list[int]] = []
        cleanups: dict[int, object] = {}

        def frame_lists():
            # bounded decode lookahead keeps memory O(workers), not O(dataset)
            nxt = 0

            def submit():
                nonlocal nxt
                if nxt < len(todo):
                    in_flight.append(decode(todo[nxt][0]))
                    nxt += 1

            for _ in range(lookahead):
                submit()
            i = 0
            while in_flight:
                frames, dims, cleanup = consume(in_flight.popleft())
                submit()
                dims_by_index[i] = dims
                if cleanup is not None:
                    cleanups[i] = cleanup
                idx = list(range(0, len(frames), every_n))
                indices_by_video.append(idx)
                yield [frames[j] for j in idx]
                i += 1

        for i, per_frame in enumerate(detector.detect_videos_iter(frame_lists())):
            video, out_path = todo[i]
            boxes = {
                str(j): b[:, :4].tolist() if len(b) else None
                for j, b in zip(indices_by_video[i], per_frame)
            }
            if not any(v for v in boxes.values()):
                missed.append(video)
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with open(out_path, "w") as f:
                json.dump(boxes, f)
            # original-resolution dims sidecar for downstream size buckets
            with open(os.path.splitext(out_path)[0] + ".dims.json", "w") as f:
                json.dump(dims_by_index.pop(i), f)
            # NOTE: the detector's one-video lookahead means video i+1's
            # frames are still referenced inside detect_videos_iter when
            # video i finishes — freeing i's shared-memory block here is
            # safe because its results are fully materialized as numpy
            cleanup = cleanups.pop(i, None)
            if cleanup is not None:
                cleanup()
    finally:
        for cleanup in cleanups.values():  # error paths: leak nothing
            cleanup()
        # drain decoded-but-never-consumed videos: their workers already
        # created (and disowned) shm segments that only we can unlink
        while in_flight:
            fut = in_flight.popleft()
            try:
                res = fut.result()
            except Exception:
                continue
            if decode_workers > 0 and res[0] is not None:
                from multiprocessing import shared_memory

                try:
                    s = shared_memory.SharedMemory(name=res[0])
                    s.close()
                    s.unlink()
                except Exception:
                    pass
        decode_pool.shutdown(wait=True)
    return missed


def main(argv=None):
    import argparse
    import glob

    from mintime_tpu.preprocessing.mtcnn import MTCNNDetector, mtcnn_params_from_torch

    p = argparse.ArgumentParser("mintime-tpu detect_faces")
    p.add_argument("--video_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--mtcnn_weights", default=None,
                   help="dir with pnet.pt/rnet.pt/onet.pt (facenet-pytorch)")
    p.add_argument("--every_n", type=int, default=1)
    p.add_argument("--decode_workers", type=int, default=0,
                   help="decode processes (0 = one decode thread; use "
                        "~cores/4 on multi-core hosts)")
    opt = p.parse_args(argv)

    if opt.mtcnn_weights:
        import torch

        variables = mtcnn_params_from_torch(
            torch.load(os.path.join(opt.mtcnn_weights, "pnet.pt"), map_location="cpu"),
            torch.load(os.path.join(opt.mtcnn_weights, "rnet.pt"), map_location="cpu"),
            torch.load(os.path.join(opt.mtcnn_weights, "onet.pt"), map_location="cpu"),
        )
    else:
        print("WARNING: no --mtcnn_weights; using random cascade (structural run)")
        variables = MTCNNDetector.init_variables()
    # decode feeds the detector raw BGR; the swap happens on device for free
    detector = MTCNNDetector(variables, channel_order="bgr")

    videos = sorted(glob.glob(os.path.join(opt.video_path, "**", "*.mp4"), recursive=True))
    missed = process_videos(videos, opt.video_path, opt.output_path, detector,
                            opt.every_n, decode_workers=opt.decode_workers)
    print(f"processed {len(videos)} videos; {len(missed)} with no detections")
    for m in missed:
        print("missed:", m)


if __name__ == "__main__":
    main()

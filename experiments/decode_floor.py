"""Measure the raw h264 decode floor under the predict pipeline's decode
stage — VERDICT r4 #1a: decode is 79% of the end-to-end compute path
(1378.7 of 1746 ms/video, BENCH_r04), and nobody knew how much of it is
reducible vs. irreducible single-core codec work.

Ladder of passes over the SAME clips bench.bench_end_to_end times
(bench._synthetic_mp4s: 300 frames, 10 s @ 720p, mp4v):

  1. grab-only        — cap.grab() per frame: the codec decode floor
                        (no frame materialization to numpy)
  2. + retrieve       — cap.grab()+cap.retrieve(): adds the YUV→BGR convert
                        + numpy materialization cv2 performs on retrieve
  3. + half-res resize— the predict decode stage's actual work minus the
                        1-crop/sec full-res retention (cv2.resize w//2,h//2
                        per frame, INTER_LINEAR default — predict.py:99)
  4. decode_for_predict(channel_order="bgr") — the real fused stage
                        (half-res frames list + 1/sec full-res dict)
  5. decode_for_predict(..., resize_on_device=True) — ships full-res
                        frames, skipping the per-frame host resize (the
                        detector downscales on device; see
                        MTCNNDetector(input_scale=2))

Each pass reports median-of-N ms/video with min/max spread. ffmpeg
threading: cv2's FFmpeg backend honors OPENCV_FFMPEG_CAPTURE_OPTIONS
"threads;N" — measured here via --threads (the env var must be set before
the FIRST VideoCapture in the process, so the flag re-execs the script).

MEASURED 2026-08-20 (this 1-core bench host, 3 clips × 3 reps, median
ms/video; two runs ~30 min apart shown as a–b to make the rig's one-sided
contention spread visible):

  grab-only                      417–447   (the codec floor, ~50%)
  + retrieve                     613–678   (+~220 YUV→BGR + materialize)
  + half-res resize              706–744   (+~80 the per-frame cv2.resize)
  decode_for_predict (host)      772–884   (+~110 bookkeeping + 1/sec keep
                                            + BGR branch checks)
  decode_for_predict (device)    996–1015  (resize_on_device=True: SLOWER
                                            here, +~130)

  Attribution of the decode stage: ~52% is the irreducible single-core
  h264 decode floor (grab-only), ~27% cv2's retrieve (YUV→BGR + numpy
  materialization — unavoidable while the pipeline consumes BGR numpy
  frames), ~10% the host resize, ~11% bookkeeping. The device-resize mode
  REMOVES the resize line but measured a net LOSS on this host: retaining
  300 full-res frames (~830 MB working set vs ~200 MB half-res) costs more
  in allocator/page churn than the ~80 ms resize it saves. Verdict: on a
  retain-then-detect host pipeline, keep the host resize; input_scale=2
  pays only where decoded frames STREAM to the device instead of being
  retained (attached-host serving with incremental staging). ffmpeg
  "threads;2" measured within noise of default on this 1-core host (no
  spare core); on an N-core host ffmpeg's frame threading scales the
  grab-only floor down until ~4 cores/clip.

Run: python experiments/decode_floor.py [--reps 3] [--threads N]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _passes():
    import cv2

    def grab_only(path):
        cap = cv2.VideoCapture(path)
        n = 0
        while cap.grab():
            n += 1
        cap.release()
        return n

    def grab_retrieve(path):
        cap = cv2.VideoCapture(path)
        n = 0
        while cap.grab():
            ok, frame = cap.retrieve()
            n += ok
        cap.release()
        return n

    def with_resize(path):
        cap = cv2.VideoCapture(path)
        n = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.resize(frame, (frame.shape[1] // 2, frame.shape[0] // 2))
            n += 1
        cap.release()
        return n

    def real_stage(path):
        from mintime_tpu.predict import decode_for_predict

        half, full, fps = decode_for_predict(path, channel_order="bgr")
        return len(half)

    def device_resize_stage(path):
        from mintime_tpu.predict import decode_for_predict

        half, full, fps = decode_for_predict(
            path, channel_order="bgr", resize_on_device=True
        )
        return len(half)

    return [
        ("grab_only", grab_only),
        ("grab_retrieve", grab_retrieve),
        ("grab_retrieve_resize", with_resize),
        ("decode_for_predict", real_stage),
        ("decode_for_predict_device_resize", device_resize_stage),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="ffmpeg decoder threads (0 = cv2 default); set via "
                         "OPENCV_FFMPEG_CAPTURE_OPTIONS before any capture")
    args = ap.parse_args()
    if args.threads and "OPENCV_FFMPEG_CAPTURE_OPTIONS" not in os.environ:
        os.environ["OPENCV_FFMPEG_CAPTURE_OPTIONS"] = f"threads;{args.threads}"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    from bench import _synthetic_mp4s

    tmp = tempfile.mkdtemp(prefix="decode_floor_")
    try:
        paths = _synthetic_mp4s(tmp)
        results = {}
        for name, fn in _passes():
            try:
                per_rep = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    frames = sum(fn(p) for p in paths)
                    per_rep.append(
                        (time.perf_counter() - t0) / len(paths) * 1000.0
                    )
                results[name] = {
                    "median_ms_per_video": round(statistics.median(per_rep), 1),
                    "min_ms": round(min(per_rep), 1),
                    "max_ms": round(max(per_rep), 1),
                    "frames": frames // len(paths),
                }
            except TypeError as e:  # resize_on_device not available yet
                results[name] = {"error": str(e)}
            print(f"{name:34} {results[name]}", flush=True)
        print(json.dumps({"decode_floor": results,
                          "threads": args.threads or "default",
                          "host_cores": os.cpu_count()}))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Where does the MTCNN cascade's per-video time actually go?

Splits the 300-frame half-res (360x640) detection — the dominant
framework-owned stage of the end-to-end predict path (bench.py e2e table)
— into its device and host phases:

* stage1_device   — the jitted P-Net pyramid on pre-staged frames
                    (dispatch + block on the top-k handles)
* stage1_host     — per-frame/per-level NMS + box bookkeeping (numpy)
* rnet            — host _crop_resize + f32 candidate upload + R-Net call
* onet            — same for O-Net
* between_host    — the inter-stage NMS/regression loops

Run on the real TPU:  python experiments/detect_stage_profile.py
"""

from __future__ import annotations

import time

import numpy as np

from mintime_tpu.preprocessing.mtcnn import MTCNNDetector


def synthetic_clip(t=300, h=360, w=640, seed=0):
    """Two face-like blobs per frame over a full-range noise base — the
    SAME content class as bench.py's clips (`_synthetic_mp4s` writes a
    rng.integers(0,255) base). The noise matters: a dark base yields zero
    stage-1 candidates under random-init weights (rnet/onet never run, NMS
    sees empty lists) and profiled a cascade 3.6x faster than the bench of
    its day (~385 fps, r3). Since r5 the bench itself runs spread-logit
    score heads (bench._spread_score_logits) for a full candidate load —
    use that detector setup to reproduce current BENCH numbers."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    frames = []
    for i in range(t):
        f = base.copy()
        for cx, cy, r in ((160 + (i % 7), 180, 60), (480, 120 + (i % 5), 36)):
            yy, xx = np.ogrid[:h, :w]
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            f[m] = (205, 170, 150)
            em = ((yy - (cy - r // 3)) ** 2 + (xx - (cx - r // 3)) ** 2 < (r // 6) ** 2) | (
                (yy - (cy - r // 3)) ** 2 + (xx - (cx + r // 3)) ** 2 < (r // 6) ** 2
            )
            f[em] = (30, 30, 30)
        frames.append(f)
    return frames


def main():
    det = MTCNNDetector(MTCNNDetector.init_variables())
    frames = synthetic_clip()
    staged = det.stage_frames(frames)

    # warm every program
    det.detect_batch(frames, staged=staged)

    # --- instrument _run_stage_multi (rnet/onet) ---
    stage_t = {"rnet": 0.0, "onet": 0.0}
    stage_n = {"rnet": 0, "onet": 0}
    upload_bytes = {"rnet": 0, "onet": 0}
    orig = MTCNNDetector._run_stage_multi

    def timed(self, frames_, cand, size, net, name, threshold,
              dev_frames=None):
        t0 = time.perf_counter()
        out = orig(self, frames_, cand, size, net, name, threshold, dev_frames)
        stage_t[name] += time.perf_counter() - t0
        n = sum(len(b) for b in cand if not isinstance(b, tuple))
        stage_n[name] += n
        upload_bytes[name] += n * size * size * 3 * 4
        return out

    MTCNNDetector._run_stage_multi = timed
    try:
        reps = 3
        t_s1d = t_finish = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            pre = det._dispatch_stage1(frames, staged=staged)
            np.asarray(pre[1][0])  # block on the head scores (real path)
            t_s1d += time.perf_counter() - t0
            t0 = time.perf_counter()
            out = det._finish_detect(frames, pre)
            t_finish += time.perf_counter() - t0
    finally:
        MTCNNDetector._run_stage_multi = orig

    per = 1000.0 / reps
    s1d = t_s1d * per
    fin = t_finish * per
    rn, on = stage_t["rnet"] * per, stage_t["onet"] * per
    host = fin - rn - on
    total = s1d + fin
    print(f"frames=300  detections/frame={np.mean([len(o) for o in out]):.1f}")
    print(f"stage1 device (pyramid+topk fetch): {s1d:8.1f} ms")
    print(f"finish total:                       {fin:8.1f} ms")
    print(f"  rnet stage (crop+upload+call):    {rn:8.1f} ms  "
          f"cand={stage_n['rnet'] // reps}  upload~{upload_bytes['rnet'] / reps / 1e6:.1f} MB")
    print(f"  onet stage (crop+upload+call):    {on:8.1f} ms  "
          f"cand={stage_n['onet'] // reps}  upload~{upload_bytes['onet'] / reps / 1e6:.1f} MB")
    print(f"  host NMS/bookkeeping:             {host:8.1f} ms")
    print(f"TOTAL per video:                    {total:8.1f} ms  "
          f"({300.0 / (total / 1000.0):.1f} fps)")


if __name__ == "__main__":
    main()

"""Time the REFERENCE's own predict.py pipeline on CPU — the explicit proxy
for the end-to-end comparison the north star demands (BASELINE.json: ">10x
end-to-end videos/sec/chip vs the GPU baseline"; VERDICT r3 missing #1).

No GPU or published weights exist in this environment, so the proxy is:

* the SAME three synthetic 300-frame 720p clips bench.py's `end_to_end`
  stage measures our pipeline on (`bench._synthetic_mp4s`);
* the reference's OWN stage functions — `VideoDataset.__getitem__` (half-res
  decode, face_detector.py:64-80), `extract_crops`, `cluster_faces`,
  `predict` (predict.py:61-417) — imported exactly the way the golden parity
  harness imports them (tests/ref_shims/, CPU-patched);
* detection via `tests/test_mtcnn_oracle.oracle_detect`, the transliterated
  facenet-pytorch `detect_face` the reference's FacenetDetector calls
  (face_detector.py:42-48, thresholds [0.85, 0.95, 0.95]) — per frame on
  torch CPU, random weights with the oracle suite's spread-logits trick so
  stage-1 candidates are realistic. Since r5 the bench side runs its
  cascade under the SAME spread-logits load (bench._spread_score_logits —
  VERDICT r4 weak #1), and BOTH sides then replace the cascade's (garbage)
  boxes with the procedural 2-identity tracks for the downstream stages,
  so detect is compared under symmetric candidate load and
  crop/cluster/predict under the symmetric deterministic scenario;
* embeddings via the torch facenet transliteration
  (tests/test_facenet_numerics.TorchInceptionResnetV1) behind the
  facenet_pytorch shim's EMBED_HOOK, and the reference's real torch
  EfficientNet-B0 + SizeInvariantTimeSformer (random weights saved/loaded
  through its own torch.load path) for the forward.

What is deliberately KEPT in the reference's timings because it is the
reference's real behavior: extract_crops' full-res re-decode of the clip
(predict.py:63-75), generate_masks' third decode (predict.py:280-300), and
predict()'s per-call model construction + torch.load (predict.py:358-390 —
its CLI is single-video, so every video pays it; reported separately below).

MEASURED 2026-08-20 (r5, symmetric spread-logits detect load + procedural
downstream on both sides; same host single CPU core for the reference's
stages; 3 clips, 300 frames / 10 s @ 720p each):

  stage             reference CPU (ms/video)
  decode                 3841.7
  detect (MTCNN)         9837.7   (spread-logit candidate load, all frames)
  crop                    969.0
  embed + cluster         422.6
  predict                4658.9   (per-call model build + torch.load, its
                                   single-video CLI's real cost)
  TOTAL                 19729.9   = 0.0507 videos/sec

(Prior measurement 2026-08-19, with real-if-found boxes downstream:
25211.0 ms/video = 0.0397 — the r4 comparison's anchor. The r5 anchor is
faster mostly in decode/predict, i.e. day-to-day rig variance; detect
dropped 13.2 s → 9.8 s because the procedural replacement also stops the
reference side from paying crop-walks over garbage box floods. Our
column lives in BENCH_r05's `end_to_end_*` fields measured the same way —
see bench.bench_end_to_end.)

The north star's ">10x end-to-end videos/sec/chip" names the GPU baseline,
which this environment cannot run; this CPU anchor is the honest measured
stand-in. The pivot is the detect stage (50% of the reference's CPU
total): the reference's batched facenet-pytorch MTCNN on a GPU would need
to beat our staged cascade per-chip — plus ~4x on its triple host decode
— for the e2e factor to drop below 1x.

Run:  python experiments/ref_predict_cpu_proxy.py [--frames-cap N]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
for p in (os.path.join(REPO, "tests", "ref_shims"), REF,
          os.path.join(REPO, "tests"), REPO):
    if p not in sys.path:
        sys.path.insert(0, p)

import torch  # noqa: E402


class _ObjectArrayNumpy:
    """numpy facade for the reference module only (see the golden harness):
    its ragged rows relied on legacy object-array np.asarray."""

    def __getattr__(self, name):
        return getattr(np, name)

    def asarray(self, obj, *args, **kwargs):
        try:
            return np.asarray(obj, *args, **kwargs)
        except ValueError:
            arr = np.empty(len(obj), dtype=object)
            for i, row in enumerate(obj):
                arr[i] = row
            return arr


def _load_reference():
    torch.Tensor.cuda = lambda self, *a, **k: self
    import predict as rp  # /root/reference/predict.py via ref_shims

    rp.device = torch.device("cpu")
    rp.np = _ObjectArrayNumpy()
    return rp


def _oracle_nets():
    from test_mtcnn_oracle import TorchONet, TorchPNet, TorchRNet

    torch.manual_seed(11)
    pnet, rnet, onet = TorchPNet().eval(), TorchRNet().eval(), TorchONet().eval()
    with torch.no_grad():  # spread the score logits (oracle fixture trick)
        for layer in (pnet.conv4_1, rnet.dense5_1, onet.dense6_1):
            layer.weight *= 75.0
            layer.bias *= 75.0
    return pnet, rnet, onet


def _save_random_torch_weights(tmp, ref_cfg):
    """Random-weight torch checkpoints through the reference's own load
    path (per-call torch.load is its CLI's real cost)."""
    from efficientnet_pytorch import EfficientNet  # vendored reference copy
    from models.size_invariant_timesformer import SizeInvariantTimeSformer

    ext = EfficientNet.from_name("efficientnet-b0")
    ext_path = os.path.join(tmp, "Extractor_ckpt")
    torch.save(ext.state_dict(), ext_path)
    head = torch.nn.DataParallel(
        SizeInvariantTimeSformer(config=ref_cfg, require_attention=True)
    )
    head_path = os.path.join(tmp, "Model_ckpt")
    torch.save(head.state_dict(), head_path)
    return ext_path, head_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-cap", type=int, default=0,
                    help="time detection on the first N frames only and "
                         "scale (0 = all 300; full run ~ minutes/clip)")
    args = ap.parse_args()

    from bench import _procedural_boxes, _synthetic_mp4s
    from test_facenet_numerics import TorchInceptionResnetV1
    from test_mtcnn_oracle import oracle_detect

    rp = _load_reference()
    import facenet_pytorch as shim
    from preprocessing.face_detector import VideoDataset  # reference's

    t_irv1 = TorchInceptionResnetV1().eval()

    def hook(nhwc):
        with torch.no_grad():
            x = torch.from_numpy(
                np.ascontiguousarray(nhwc.transpose(0, 3, 1, 2))
            ).float()
            return t_irv1(x).numpy()

    shim.EMBED_HOOK = hook

    import yaml

    with open(os.path.join(REPO, "configs/size_invariant_timesformer.yaml")) as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["model"]["channels"] = 1280
    ref_cfg["model"].setdefault("patch-size", 7)
    ref_cfg["model"].setdefault("shift-tokens", False)

    tmp = tempfile.mkdtemp(prefix="ref_proxy_")
    try:
        paths = _synthetic_mp4s(tmp)
        ext_path, head_path = _save_random_torch_weights(tmp, ref_cfg)

        class Opt:
            extractor_model = 0
            extractor_weights = ext_path
            model_weights = head_path
            save_attentions = False

        pnet, rnet, onet = _oracle_nets()
        thresholds = [0.85, 0.95, 0.95]  # reference FacenetDetector's

        stage = {k: 0.0 for k in
                 ("decode", "detect", "crop", "embed_cluster", "predict")}
        detected = 0
        for path in paths:
            t0 = time.perf_counter()
            _, indices, fps, frames = VideoDataset([path])[0]
            stage["decode"] += time.perf_counter() - t0

            n_det = min(args.frames_cap or len(frames), len(frames))
            t0 = time.perf_counter()
            per_frame = [
                oracle_detect(np.asarray(frames[i]), pnet, rnet, onet, thresholds)
                for i in range(n_det)
            ]
            stage["detect"] += (
                (time.perf_counter() - t0) * len(frames) / max(n_det, 1)
            )
            detected += sum(len(b) for b in per_frame)

            h2, w2 = np.asarray(frames[0]).shape[:2]
            boxes_at = _procedural_boxes(h2, w2)
            # downstream stages run on the procedural 2-identity tracks on
            # BOTH sides of the comparison (bench._BenchDetector applies the
            # identical replacement): the spread-random cascade's own boxes
            # are garbage in count and geometry, so feeding them downstream
            # would measure an arbitrary load, not the 2-identity scenario
            bboxes = {
                indices[i]: [b[:4] for b in boxes_at(i)]
                for i in range(len(frames))
            }

            t0 = time.perf_counter()
            crops = rp.extract_crops(path, bboxes)
            stage["crop"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            clustered = rp.cluster_faces(crops)
            stage["embed_cluster"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            pred, *_ = rp.predict(path, clustered, ref_cfg, Opt())
            stage["predict"] += time.perf_counter() - t0

        n = len(paths)
        per_video = {k: v / n for k, v in stage.items()}
        total = sum(per_video.values())
        print(f"\nreference predict.py CPU proxy — {n} clips, "
              f"300 frames @ 720p, detection on "
              f"{args.frames_cap or 300}/300 frames "
              f"({detected} cascade detections)")
        for k, v in per_video.items():
            print(f"  {k:14} {v * 1000:10.1f} ms/video")
        print(f"  {'TOTAL':14} {total * 1000:10.1f} ms/video "
              f"= {1.0 / total:.4f} videos/sec")
        print(json.dumps({
            "ref_cpu_stage_ms_per_video":
                {k: round(v * 1000, 1) for k, v in per_video.items()},
            "ref_cpu_videos_per_sec": round(1.0 / total, 5),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

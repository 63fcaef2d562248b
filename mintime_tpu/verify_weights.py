"""Day-one verification for REAL published weights.

The environment this framework was built in has no egress, so the
reference's published weights (facenet-pytorch MTCNN ``pnet/rnet/onet.pt``
and vggface2 ``InceptionResnetV1``, the MINTIME zoo
``Model_checkpoint*``/``Extractor_checkpoint*``, pytorchvideo
``slowfast_r50``) have only ever been exercised through synthetic
state_dicts in the converter tests (VERDICT r2 missing#6). This CLI makes
loading the real files a one-command check the day they are available:
every converter runs against the actual artifacts, a forward pass sanity-
checks each model, and — when an example video is given — the full predict
pipeline runs end-to-end.

Usage (any subset of flags; each is verified independently)::

    python -m mintime_tpu.verify_weights \
        --mtcnn_weights weights/mtcnn/ \
        --facenet_weights weights/vggface2.pt \
        --model_weights weights/Model_checkpoint_XC \
        --extractor_weights weights/Extractor_checkpoint_XC \
        --slowfast_weights weights/SLOWFAST_8x8_R50.pyth \
        --video /root/reference/examples/fake_2_faces_1.mp4

Exit code 0 = every requested artifact loaded strictly (unknown/missing
keys raise — see utils/torch_convert.py) and produced finite outputs.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _ok(name, detail=""):
    print(f"[ OK ] {name}" + (f" — {detail}" if detail else ""))


def _section(name):
    print(f"\n=== {name}")


def verify_mtcnn(weights_dir: str, video: str | None) -> dict:
    import torch

    from mintime_tpu.preprocessing.mtcnn import (
        MTCNNDetector,
        mtcnn_params_from_torch,
    )

    _section("MTCNN cascade (facenet-pytorch pnet/rnet/onet.pt)")
    sds = [
        torch.load(os.path.join(weights_dir, f), map_location="cpu")
        for f in ("pnet.pt", "rnet.pt", "onet.pt")
    ]
    variables = mtcnn_params_from_torch(*sds)
    _ok("converter", f"{sum(len(s) for s in sds)} torch tensors mapped")
    det = MTCNNDetector(variables)
    if video:
        from mintime_tpu.preprocessing.detect_faces import decode_half_res

        frames, fps = decode_half_res(video)
        boxes = det.detect_batch(frames[: min(len(frames), 30)])
        n = sum(len(b) for b in boxes)
        assert n > 0, "real MTCNN weights should detect faces in the example"
        _ok("detection", f"{n} boxes over {len(boxes)} half-res frames")
    else:
        rng = np.random.default_rng(0)
        det.detect_batch([rng.integers(0, 255, (180, 320, 3), dtype=np.uint8)])
        _ok("forward", "cascade ran on a synthetic frame")
    return {"detector": det}


def verify_facenet(path: str) -> dict:
    import torch

    from mintime_tpu.preprocessing.cluster_faces import FaceEmbedder
    from mintime_tpu.preprocessing.facenet import facenet_params_from_torch

    _section("InceptionResnetV1 vggface2 embedder")
    sd = torch.load(path, map_location="cpu")
    variables = facenet_params_from_torch(sd)
    _ok("converter", f"{len(sd)} torch tensors mapped")
    emb = FaceEmbedder(variables)
    rng = np.random.default_rng(0)
    out = emb([rng.integers(0, 255, (160, 160, 3), dtype=np.uint8)])
    assert np.isfinite(out).all()
    # facenet-pytorch L2-normalizes its output embedding
    _ok("forward", f"embedding norm {float(np.linalg.norm(out[0])):.4f} (expect ~1)")
    return {"embedder": emb}


def verify_classifier(model_weights: str, extractor_weights: str | None,
                      config: str, extractor_model: int) -> dict:
    import jax
    import jax.numpy as jnp

    from mintime_tpu.config import load_config
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.utils.checkpoint import load_model_variables

    _section("MINTIME zoo checkpoint (Model/Extractor)")
    cfg = load_config(config)
    backbone = "efficientnet-b0" if extractor_model == 0 else "xception"
    model = MintimeVideoClassifier(
        cfg.model, backbone=backbone, head="timesformer",
        require_attention=True, dtype=jnp.bfloat16, use_pallas=True,
    )
    variables = load_model_variables(
        model, cfg, model_weights, extractor_weights=extractor_weights
    )
    _ok("converter", f"{backbone} + timesformer variables loaded strictly")
    m = cfg.model
    B, F = 1, m.num_frames
    logits, _ = jax.jit(model.apply)(
        variables,
        np.full((B, F, m.image_size, m.image_size, 3), 128, np.float32),
        np.ones((B, F), bool),
        np.ones((B, F, F), bool),
        np.ones((B, F), np.int32),
        np.arange(1 + F * m.num_patches, dtype=np.int32)[None] % (F * m.num_patches),
    )
    val = float(np.asarray(logits)[0, 0])
    assert np.isfinite(val)
    _ok("forward", f"logit on a gray sequence: {val:+.4f}")
    return {"model": model, "variables": variables, "cfg": cfg}


def verify_slowfast(path: str) -> None:
    import jax
    import torch

    from mintime_tpu.models.slowfast import SlowFastR50
    from mintime_tpu.utils.torch_convert import slowfast_params_from_torch

    _section("SlowFast R-50 (pytorchvideo checkpoint)")
    obj = torch.load(path, map_location="cpu")
    sd = obj.get("model_state", obj) if isinstance(obj, dict) else obj
    variables = slowfast_params_from_torch(sd)
    _ok("converter", f"{len(sd)} torch tensors mapped (strict, all consumed)")
    # head size follows the checkpoint: kinetics hub weights carry a
    # 400-way proj the reference replaces with Linear(2304, 1)
    num_classes = int(np.asarray(variables["params"]["proj"]["kernel"]).shape[1])
    model = SlowFastR50(num_classes=num_classes)
    out = jax.jit(model.apply)(
        variables,
        np.zeros((1, 2, 32, 32, 3), np.float32),
        np.zeros((1, 8, 32, 32, 3), np.float32),
    )
    assert np.isfinite(np.asarray(out)).all()
    _ok("forward", f"logits shape {np.asarray(out).shape}")


def main(argv=None):
    p = argparse.ArgumentParser("mintime-tpu verify_weights")
    p.add_argument("--mtcnn_weights", default=None,
                   help="dir with pnet.pt / rnet.pt / onet.pt")
    p.add_argument("--facenet_weights", default=None,
                   help="InceptionResnetV1 vggface2 state_dict (.pt)")
    p.add_argument("--model_weights", default=None,
                   help="reference Model_checkpoint* (torch) or orbax dir")
    p.add_argument("--extractor_weights", default=None)
    p.add_argument("--extractor_model", type=int, default=0)
    p.add_argument("--slowfast_weights", default=None)
    p.add_argument("--config", default="configs/size_invariant_timesformer.yaml")
    p.add_argument("--video", default=None,
                   help="optional example .mp4 — runs the FULL predict "
                        "pipeline when mtcnn+facenet+model weights are given")
    opt = p.parse_args(argv)
    if not any((opt.mtcnn_weights, opt.facenet_weights, opt.model_weights,
                opt.slowfast_weights)):
        p.error("nothing to verify: pass at least one weights flag")

    parts = {}
    if opt.mtcnn_weights:
        parts.update(verify_mtcnn(opt.mtcnn_weights, opt.video))
    if opt.facenet_weights:
        parts.update(verify_facenet(opt.facenet_weights))
    if opt.model_weights:
        parts.update(verify_classifier(opt.model_weights, opt.extractor_weights,
                                       opt.config, opt.extractor_model))
    if opt.slowfast_weights:
        verify_slowfast(opt.slowfast_weights)

    if opt.video and {"detector", "embedder", "model"} <= parts.keys():
        from mintime_tpu.predict import predict_video

        _section("end-to-end predict on " + os.path.basename(opt.video))
        result = predict_video(
            opt.video, parts["model"], parts["variables"], parts["cfg"],
            parts["detector"], parts["embedder"],
        )
        _ok("predict", f"fake probability {result.probability:.4f}, "
                       f"{len(result.identities)} identities, "
                       f"attention {result.identity_attentions}")
    print("\nall requested artifacts verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())

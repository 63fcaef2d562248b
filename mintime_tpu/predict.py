"""End-to-end single-video inference — the public "product" API.

Parity with the reference ``predict.py`` (:37-176 detection/crops/cluster,
:183-352 assembly, :355-417 model, :432-479 annotated output), but UNIFIED:
the reference duplicates the sequence-assembly logic across
``deepfakes_dataset.py``, ``predict.py`` and the drivers; here every stage
reuses the same components (assembler, crop geometry, clustering,
classifier), and all device compute — backbone + TimeSformer with attention
output — is one jitted XLA program.

Pipeline: decode(half-res) → MTCNN cascade → square crops (1/sec) →
FaceNet embeddings → connected-components identities → adaptive sequence
assembly → classifier forward (+ CLS attentions) → sigmoid probability,
per-identity attention, optional annotated ``.avi``.
"""

from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np

from mintime_tpu.config import MintimeConfig
from mintime_tpu.data.assembler import IdentityFaces, build_sequence_plan, size_bucket
from mintime_tpu.data.augment import create_val_transform
from mintime_tpu.preprocessing.extract_crops import pick_detection_frame, square_crop
from mintime_tpu.utils.attention_viz import aggregate_attentions, draw_border


#: jitted forward per MODEL (flax modules hash by construction args), not per
#: call — a 10-video predict loop reuses one compiled program instead of
#: retracing every video (the reference builds its graph per call too, but
#: torch eager pays no trace cost; under jit a per-call lambda would).
_FWD_CACHE: dict = {}


def _jitted_forward(model):
    fwd = _FWD_CACHE.get(model)
    if fwd is None:
        import jax

        fwd = jax.jit(model.apply)
        _FWD_CACHE[model] = fwd
    return fwd


@dataclass
class PredictionResult:
    probability: float  # sigmoid fake-probability
    identity_attentions: list[float]
    aggregated_attentions: list[np.ndarray]
    identities: dict  # identity index → list[(frame_idx, face_idx, crop, bbox)]
    frames_per_identity: list[int]
    plan: Any = None


def decode_for_predict(
    video_path: str,
    crop_step: int | None = None,
    channel_order: str = "rgb",
    resize_on_device: bool = False,
):
    """ONE decode pass serving both predict stages: half-res frames for
    detection plus the 1-crop/sec full-res BGR frames for cropping.

    ``channel_order`` is the DETECTION frames' order: ``"rgb"`` converts on
    the host (cv2.cvtColor ≈ 0.7 s per 300-frame clip on a 1-core host);
    ``"bgr"`` skips the convert entirely for a detector constructed with
    ``MTCNNDetector(channel_order="bgr")``, which performs the identical
    swap on device for free — the staging paths below pick whichever the
    detector declares.

    The reference decodes every video twice — once at half resolution for
    the detector (predict.py:37-59 via face_detector.py:59-83) and again at
    full resolution for the crops (predict.py:61-142) — paying the h264
    decode twice. Decoding is a top per-stage cost of the end-to-end
    pipeline (see bench.py's e2e stage table), so the fused pipeline
    streams the video once, downscaling each frame for detection and
    retaining only the full-res frames the 1/sec crop walk will index.

    ``resize_on_device=True`` (detectors with ``input_scale=2``): the
    per-frame host ``cv2.resize`` — measured ~80 ms/video of this stage,
    experiments/decode_floor.py — is skipped; the detection list holds the
    FULL-resolution BGR frames and the detector performs the identical 2×
    area shrink on device as part of its pyramid matmuls. Only meaningful
    with ``channel_order="bgr"`` (the device swap comes free there too).
    Measured caveat (decode_floor.py): retaining the full-res clip in host
    memory costs MORE than the resize it saves on this class of host, so
    the mode pays only when frames stream to the device incrementally
    (attached-host serving) rather than being retained in this list.

    Returns ``(det_frames, full_frames: dict[idx → BGR], fps)``.
    """
    import cv2

    from mintime_tpu.preprocessing.detect_faces import _validate_channel_order

    _validate_channel_order(channel_order)
    if resize_on_device and channel_order != "bgr":
        raise ValueError(
            "resize_on_device implies the device-side channel swap too; "
            "construct the detector with channel_order='bgr'"
        )
    cap = cv2.VideoCapture(video_path)
    fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
    step = max(crop_step or fps, 1)
    half, full = [], {}
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            full[i] = frame
        if resize_on_device:
            half.append(frame)  # full-res; detector downscales on device
            i += 1
            continue
        # resize FIRST, channel-swap at half res: BGR→RGB is a pure channel
        # permutation so it commutes bit-identically with resize, and doing
        # it on 4× fewer pixels saves ~13% of the decode stage (measured)
        small = cv2.resize(frame, (frame.shape[1] // 2, frame.shape[0] // 2))
        if channel_order == "rgb":
            small = cv2.cvtColor(small, cv2.COLOR_BGR2RGB)
        half.append(small)
        i += 1
    cap.release()
    return half, full, fps


def detect_on_frames(frames: Sequence[np.ndarray], detector, every_n: int = 1) -> dict:
    """Cascade over already-decoded half-res frames → boxes dict."""
    indices = list(range(0, len(frames), every_n))
    if hasattr(detector, "detect_batch"):  # batched cascade (SURVEY §2.1)
        per_frame = detector.detect_batch([frames[i] for i in indices])
    else:  # injected single-frame detectors (tests, custom backends)
        per_frame = [detector.detect(frames[i]) for i in indices]
    return {
        str(i): det[:, :4].tolist() if len(det) else None
        for i, det in zip(indices, per_frame)
    }


def detect_video_faces(video_path: str, detector, every_n: int = 1) -> tuple[dict, int, tuple]:
    """Half-res detection over all frames (predict.py:37-59). Returns
    (boxes dict, fps, (width, height)) with half-res coordinates."""
    from mintime_tpu.preprocessing.detect_faces import decode_half_res

    frames, fps = decode_half_res(
        video_path, channel_order=getattr(detector, "channel_order", "rgb")
    )
    if not frames:
        raise ValueError(f"could not decode {video_path}")
    boxes = detect_on_frames(frames, detector, every_n)
    if not any(v for v in boxes.values()):
        raise ValueError("No faces found.")  # predict.py:55-58
    h, w = frames[0].shape[:2]
    return boxes, fps, (w * 2, h * 2)


def crops_from_frames(full_frames: dict, boxes: dict, fps: int):
    """1-crop/sec square crops from pre-decoded full-res frames."""
    crops = []  # (frame_idx, face_idx, crop_bgr, bbox_half_res)
    step = max(fps, 1)
    for i in sorted(full_frames):
        det = pick_detection_frame(boxes, i, step)
        if det is None:
            continue
        for j, bbox in enumerate(boxes[str(det)] or []):
            crop = square_crop(full_frames[i], bbox)
            if crop.size:
                crops.append((i, j, crop, bbox))
    return crops


def extract_video_crops(video_path: str, boxes: dict, fps: int):
    """1-crop/sec square crops + their (half-res) boxes (predict.py:61-142).

    Streams with ``grab()``/``retrieve()``: every frame is still decoded
    (inter-frame codecs require it) but the color-convert + copy happens
    only for the 1/sec frames actually cropped — the reference materializes
    the whole full-res clip in memory first (predict.py:61-75).
    """
    import cv2

    capture = cv2.VideoCapture(video_path)
    step = max(fps, 1)
    full: dict[int, np.ndarray] = {}
    i = 0
    while capture.grab():
        if i % step == 0:
            ok, frame = capture.retrieve()
            if ok:
                full[i] = frame
        i += 1
    capture.release()
    return crops_from_frames(full, boxes, fps)


def cluster_crops(crops, embedder, threshold: float = 0.45):
    """In-memory identity clustering (predict.py:144-176)."""
    from mintime_tpu.preprocessing.cluster_faces import connected_components

    if not crops:
        return {}, []
    embeddings = embedder([c[2] for c in crops])
    sims = embeddings @ embeddings.T
    components = connected_components(sims, threshold)
    identities = {k: [crops[i] for i in comp] for k, comp in enumerate(components)}
    clustered = {i for comp in components for i in comp}
    discarded = [crops[i] for i in range(len(crops)) if i not in clustered]
    if not identities:  # no clusters: everything becomes identity 0
        identities = {0: list(crops)}
        discarded = []
    return identities, discarded


def assemble_inputs(identities: dict, video_dims, cfg: MintimeConfig):
    """Build the fixed-shape model inputs from in-memory identity crops
    (predict.py:183-352 path, via the shared assembler)."""
    m = cfg.model
    infos, crop_store = [], {}
    for key, items in identities.items():
        items = sorted(items, key=lambda t: (t[0], t[1]))
        infos.append(
            IdentityFaces(
                key=str(key),
                frames=[t[0] for t in items],
                # reference sorts identities by mean crop WIDTH — PIL
                # .size[0] (predict.py:177-179) — not height
                mean_side=float(np.mean([t[2].shape[1] for t in items])),
            )
        )
        crop_store[str(key)] = items
    plan = build_sequence_plan(
        infos,
        num_frames=m.num_frames,
        num_patches=m.num_patches,
        max_identities=m.max_identities,
        ordering=0,
        parity=1,  # predict.py always uses the linspace(0, n-2) branch
    )

    transform = create_val_transform(m.image_size)
    rng = np.random.default_rng(0)
    frames = []
    size_embeddings = np.zeros(m.num_frames, np.int32)
    vw, vh = video_dims
    for slot in range(m.num_frames):
        fi = plan.face_index[slot]
        if fi < 0:
            frames.append(np.zeros((m.image_size, m.image_size, 3), np.uint8))
            continue
        key = plan.identity_keys[plan.identity_index[slot]]
        crop = crop_store[key][fi][2]
        # predict.py:289-294 halves video_area but NOT face_area (unlike the
        # dataset path, deepfakes_dataset.py:250-263) — keep its semantics
        size_embeddings[slot] = size_bucket(
            crop.shape[0], crop.shape[1], vh, vw,
            legacy_predict_double_ratio=True,
        )
        frames.append(crop)
    frames = transform(frames, rng)
    # stay uint8 across the host→device link: the val transform is purely
    # geometric (uint8 in → uint8 out) and the model casts device-side
    # (classifier.py:61-64, same contract as the train loader's batches).
    # A (1,16,224,224,3) f32 sequence is 9.6 MB vs 2.4 MB uint8 — measured
    # 625 ms vs 1.6 ms device-resident for the e2e bench's batch-3 forward
    # (experiments/e2e_tail_profile.py): the cast WAS the forward stage.
    return {
        "frames": np.asarray(frames)[None],
        "mask": plan.mask[None],
        "identities_mask": plan.identities_mask[None],
        "size_embedding": size_embeddings[None],
        "positions": plan.positions[None],
    }, plan, crop_store


def _stage_videos_pipelined(
    video_paths: Sequence[str],
    detector,
    embedder,
    cfg: MintimeConfig,
    similarity_threshold: float,
    every_n: int,
    boxes_per_video,
    stage_to_device: bool = False,
):
    """Yield ``(path, batch, plan, crop_store)`` per video with detection
    pipelining: while video ``i``'s stage-1 pyramid executes on device
    (async dispatch), the host decodes video ``i+1`` and dispatches its
    pyramid, then finishes video ``i`` (NMS + R/O-Net stages + crops +
    cluster + assemble). Decode and cascade are the two biggest per-video
    costs of the serving path (bench.py e2e stage table), so overlapping
    them approaches max(decode, cascade) instead of their sum. Falls back
    to the sequential path for injected detectors without a dispatch split
    or when precomputed boxes skip detection. Results are bit-identical to
    ``_stage_video`` per video.
    """
    can_pipeline = hasattr(detector, "_dispatch_stage1") and hasattr(
        detector, "_finish_detect"
    )

    def _stage(batch):
        """Queue the assembled rows' host→device transfer NOW (async), so
        the upload rides under the NEXT video's decode instead of bunching
        at forward time — the tail profile measured the batched numpy-arg
        upload as the forward stage's whole cost on a slow link
        (experiments/e2e_tail_profile.py). The forward then concatenates
        on device."""
        if not stage_to_device:
            return batch
        import jax

        return {k: jax.device_put(v) for k, v in batch.items()}

    def _start(i):
        """Decode video i and launch its pyramid (async dispatch)."""
        path = video_paths[i]
        boxes = boxes_per_video[i] if boxes_per_video else None
        if boxes is not None or not can_pipeline:
            return ("direct", path, boxes)
        scale = getattr(detector, "input_scale", 1)
        half, full, fps = decode_for_predict(
            path, channel_order=getattr(detector, "channel_order", "rgb"),
            resize_on_device=scale > 1,
        )
        if not half:
            raise ValueError(f"could not decode {path}")
        indices = list(range(0, len(half), every_n))
        sel = [half[j] for j in indices]
        pre = detector._dispatch_stage1(sel)
        return ("pipelined", path, sel, indices, full, fps, pre)

    pending = _start(0) if video_paths else None
    for i in range(len(video_paths)):
        # decode + dispatch video i+1 while video i's pyramid runs on device
        nxt = _start(i + 1) if i + 1 < len(video_paths) else None
        if pending[0] == "direct":
            _, path, boxes = pending
            batch, plan, store = _stage_video(
                path, detector, embedder, cfg, similarity_threshold,
                every_n, boxes,
            )
            yield (path, _stage(batch), plan, store)
        else:
            _, path, sel, indices, full, fps, pre = pending
            per_frame = detector._finish_detect(sel, pre)
            boxes = {
                str(j): det[:, :4].tolist() if len(det) else None
                for j, det in zip(indices, per_frame)
            }
            if not any(v for v in boxes.values()):
                raise ValueError("No faces found.")  # predict.py:55-58
            scale = getattr(detector, "input_scale", 1)
            h = sel[0].shape[0] // scale  # detection (half-res) dims
            w = sel[0].shape[1] // scale
            crops = crops_from_frames(full, boxes, fps)
            identities, _ = cluster_crops(crops, embedder, similarity_threshold)
            batch, plan, store = assemble_inputs(identities, (w * 2, h * 2), cfg)
            yield (path, _stage(batch), plan, store)
        pending = nxt


def _stage_video(
    video_path: str,
    detector,
    embedder,
    cfg: MintimeConfig,
    similarity_threshold: float,
    every_n: int,
    boxes: dict | None,
):
    """All host stages for one video: decode once → detect → crop →
    cluster → assemble. Shared by ``predict_video`` and ``predict_videos``."""
    if boxes is None:
        # single decode pass feeds both detection (half-res) and the crop
        # walk (1/sec full-res) — the reference decodes the video twice
        scale = getattr(detector, "input_scale", 1)
        half, full, fps = decode_for_predict(
            video_path, channel_order=getattr(detector, "channel_order", "rgb"),
            resize_on_device=scale > 1,
        )
        if not half:
            raise ValueError(f"could not decode {video_path}")
        boxes = detect_on_frames(half, detector, every_n)
        if not any(v for v in boxes.values()):
            raise ValueError("No faces found.")  # predict.py:55-58
        h = half[0].shape[0] // scale  # detection (half-res) dims
        w = half[0].shape[1] // scale
        video_dims = (w * 2, h * 2)
        crops = crops_from_frames(full, boxes, fps)
    else:
        import cv2

        cap = cv2.VideoCapture(video_path)
        fps = int(cap.get(5)) or 30
        video_dims = (cap.get(3), cap.get(4))
        cap.release()
        crops = extract_video_crops(video_path, boxes, fps)
    identities, _ = cluster_crops(crops, embedder, similarity_threshold)
    return assemble_inputs(identities, video_dims, cfg)


def predict_video(
    video_path: str,
    model,
    variables,
    cfg: MintimeConfig,
    detector,
    embedder,
    similarity_threshold: float = 0.45,
    every_n: int = 1,
    boxes: dict | None = None,
) -> PredictionResult:
    """The full predict() pipeline (predict.py:355-417).

    ``boxes``: optional precomputed half-res detections (the
    ``detect_video_faces`` JSON contract) — skips the detector. Used when
    detections already exist on disk or come from another detector.
    """
    batch, plan, crop_store = _stage_video(
        video_path, detector, embedder, cfg, similarity_threshold, every_n, boxes
    )

    fwd = _jitted_forward(model)
    logits, attns = fwd(
        variables,
        batch["frames"],
        batch["mask"],
        batch["identities_mask"],
        batch["size_embedding"],
        batch["positions"],
    )
    prob = float(1.0 / (1.0 + np.exp(-float(np.asarray(logits)[0, 0]))))

    frames_per_identity = [
        int(tokens / cfg.model.num_patches) for _, tokens in plan.tokens_per_identity
    ]
    agg, identity_attentions = aggregate_attentions(
        [np.asarray(a) for a in attns],
        cfg.model.heads,
        cfg.model.num_frames,
        frames_per_identity,
    )
    ordered_identities = {
        key: crop_store[key] for key in plan.identity_keys
    }
    return PredictionResult(
        probability=prob,
        identity_attentions=identity_attentions,
        aggregated_attentions=agg,
        identities=ordered_identities,
        frames_per_identity=frames_per_identity,
    )


def predict_videos(
    video_paths: Sequence[str],
    model,
    variables,
    cfg: MintimeConfig,
    detector,
    embedder,
    similarity_threshold: float = 0.45,
    every_n: int = 1,
    batch_size: int = 8,
    boxes_per_video: Sequence[dict | None] | None = None,
    mesh=None,
) -> list[PredictionResult]:
    """Batched serving path: N videos → one jitted forward per batch.

    The reference has no batched inference (predict.py is single-video);
    this is the deployment-shaped API: host stages (detect / crop /
    cluster / assemble) run per video, the assembled fixed-shape inputs
    stack into ``batch_size`` rows (last batch padded by repeating row 0 —
    pad outputs are discarded), and the SAME cached jitted forward
    ``predict_video`` uses serves every batch, so a service mixing single
    and batched calls compiles each batch shape once. Attention maps are
    sliced per video exactly like evaluate's batch plotting
    (``aggregate_attentions`` consumes ``(heads, 1, 1+F·n)`` rows).

    With ``mesh`` (from :func:`mintime_tpu.parallel.mesh.make_mesh`) the
    batch axis shards over the mesh's ``data`` axis and each forward runs
    data-parallel across every chip — same scaling story as ``evaluate``'s
    CLI. ``batch_size`` must divide by the mesh's data-axis size; every
    batch is then padded to the full ``batch_size`` so one program serves
    the whole run.
    """
    if mesh is not None:
        import jax

        from mintime_tpu.parallel.mesh import replicated, shard_batch

        ndata = mesh.shape["data"]
        if batch_size % ndata:
            raise ValueError(
                f"batch_size {batch_size} must divide by the mesh data axis"
                f" ({ndata})"
            )
        variables = jax.device_put(variables, replicated(mesh))

    # host stages with detection pipelining: video i+1's decode + pyramid
    # dispatch overlap video i's NMS/crop/cluster/assemble; without a mesh
    # each video's assembled rows are ALSO device_put as they finish, so
    # the forward's argument upload overlaps the remaining decodes
    staged = list(  # (path, batch_dict, plan, crop_store)
        _stage_videos_pipelined(
            video_paths, detector, embedder, cfg, similarity_threshold,
            every_n, boxes_per_video, stage_to_device=mesh is None,
        )
    )

    fwd = _jitted_forward(model)
    results: list[PredictionResult] = []
    heads = cfg.model.heads
    if mesh is not None:
        import jax

        ctx = jax.set_mesh(mesh)
    else:
        ctx = contextlib.nullcontext()
    with ctx:
      for start in range(0, len(staged), batch_size):
        chunk = staged[start : start + batch_size]
        n = len(chunk)
        if mesh is not None:  # fixed shape: one compile for the whole run
            pad = batch_size - n
        else:
            pad = batch_size - n if len(staged) > batch_size else 0
        if mesh is None:
            import jax.numpy as jnp

            # rows are (possibly) already device-resident — concat on device
            stacked = {
                k: jnp.concatenate(
                    [c[1][k] for c in chunk] + [chunk[0][1][k]] * pad
                )
                for k in chunk[0][1]
            }
        else:
            stacked = {
                k: np.concatenate(
                    [c[1][k] for c in chunk] + [chunk[0][1][k]] * pad
                )
                for k in chunk[0][1]
            }
            stacked = shard_batch(mesh, stacked)
        logits, attns = fwd(
            variables,
            stacked["frames"],
            stacked["mask"],
            stacked["identities_mask"],
            stacked["size_embedding"],
            stacked["positions"],
        )
        logits = np.asarray(logits).reshape(-1)
        attns = [np.asarray(a) for a in attns]
        for b, (path, _, plan, crop_store) in enumerate(chunk):
            prob = float(1.0 / (1.0 + np.exp(-logits[b])))
            fpi = [
                int(t / cfg.model.num_patches)
                for _, t in plan.tokens_per_identity
            ]
            agg, id_attn = aggregate_attentions(
                [a[b * heads : (b + 1) * heads] for a in attns],
                heads, cfg.model.num_frames, fpi,
            )
            results.append(
                PredictionResult(
                    probability=prob,
                    identity_attentions=id_attn,
                    aggregated_attentions=agg,
                    identities={k: crop_store[k] for k in plan.identity_keys},
                    frames_per_identity=fpi,
                    plan=plan,
                )
            )
    return results


def generate_output_video(
    video_path: str, result: PredictionResult, output_dir: str = "examples/preds"
) -> str:
    """Annotated .avi with per-identity red/green rounded boxes
    (predict.py:432-479)."""
    import cv2

    # frame → [per-identity bbox] map from the clustered crops
    identities_bboxes: dict[int, list] = {}
    for identity_index, items in enumerate(result.identities.values()):
        for frame_idx, _, _, bbox in items:
            identities_bboxes.setdefault(frame_idx, [None] * len(result.identities))
            identities_bboxes[frame_idx][identity_index] = bbox
    available = sorted(identities_bboxes)

    cap = cv2.VideoCapture(video_path)
    width, height = int(cap.get(3)), int(cap.get(4))
    fps = int(cap.get(5)) or 30
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(
        output_dir, os.path.basename(video_path).replace(".mp4", ".avi")
    )
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"XVID"), fps, (width, height)
    )
    pred = result.probability
    frame_index = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        nearest = min(available, key=lambda x: abs(x - frame_index))
        if nearest - frame_index <= fps:
            for identity_index, bbox in enumerate(identities_bboxes[nearest]):
                if bbox is None:
                    continue
                xmin, ymin, xmax, ymax = [int(b * 2) for b in bbox]
                if pred > 0.5:
                    red = 255 * result.identity_attentions[identity_index]
                    green = 255 - red
                    text = (
                        f"Fake {round(pred * 100, 2)}%" if red > green else "Pristine"
                    )
                else:
                    green = int(255 * (1 - pred))
                    red = 255 - green
                    text = f"Pristine {round((1 - pred) * 100, 2)}%"
                color = (0, int(green), int(red))
                frame = draw_border(frame, (xmin, ymin), (xmax, ymax), color, 2, 10, 20)
                cv2.putText(
                    frame, text, (xmin, ymin - 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.9, color, 2,
                )
        writer.write(frame)
        frame_index += 1
    writer.release()
    cap.release()
    return out_path


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    from mintime_tpu.config import load_config
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.preprocessing.cluster_faces import FaceEmbedder
    from mintime_tpu.preprocessing.mtcnn import MTCNNDetector
    from mintime_tpu.utils.checkpoint import load_model_variables

    p = argparse.ArgumentParser("mintime-tpu predict (predict.py parity)")
    p.add_argument("--video_path", required=True)
    p.add_argument("--config", default="configs/size_invariant_timesformer.yaml")
    p.add_argument("--model_weights", required=True)
    p.add_argument("--extractor_weights", default=None)
    p.add_argument("--extractor_model", type=int, default=0)
    p.add_argument("--mtcnn_weights", default=None)
    p.add_argument("--facenet_weights", default=None)
    p.add_argument("--output_type", type=int, default=0, help="0 prob | 1 video")
    p.add_argument("--save_attentions", action="store_true")
    # interface-parity flags (predict.py:486-508). FacenetDetector is the
    # only detector the reference ships; prediction here is deterministic
    # and single-video, so seed/workers are accepted but have no effect.
    p.add_argument("--detector_type", default="FacenetDetector",
                   choices=["FacenetDetector"])
    p.add_argument("--random_state", type=int, default=42,
                   help="(reference CLI compatibility; prediction is deterministic)")
    p.add_argument("--workers", type=int, default=1,
                   help="(reference CLI compatibility; unused)")
    opt = p.parse_args(argv)

    # a random-init cascade detects nothing and a random embedder produces
    # garbage clusters — require real weights on the user-facing CLI rather
    # than silently degrading (detect_faces.py warns; here we fail hard,
    # and before any expensive model build / checkpoint load).
    if not opt.mtcnn_weights or not opt.facenet_weights:
        p.error(
            "--mtcnn_weights (dir with pnet.pt/rnet.pt/onet.pt) and "
            "--facenet_weights (InceptionResnetV1 vggface2 state_dict) are "
            "required: the facenet-pytorch pretrained weights the reference "
            "loads implicitly (face_detector.py:42-46, preprocessing/utils.py"
            ":32-34) cannot be auto-downloaded here."
        )
    if not os.path.exists(opt.model_weights):
        p.error(f"--model_weights not found: {opt.model_weights}")

    cfg = load_config(opt.config)
    backbone = "efficientnet-b0" if opt.extractor_model == 0 else "xception"
    model = MintimeVideoClassifier(
        cfg.model,
        backbone=backbone,
        head="timesformer",
        require_attention=True,
        dtype=jnp.bfloat16,
        use_pallas=True,  # fused kernel for all but the attention-map layer
    )
    variables = load_model_variables(
        model, cfg, opt.model_weights, extractor_weights=opt.extractor_weights
    )

    import torch

    from mintime_tpu.preprocessing.facenet import facenet_params_from_torch
    from mintime_tpu.preprocessing.mtcnn import mtcnn_params_from_torch

    det_vars = mtcnn_params_from_torch(
        *(
            torch.load(os.path.join(opt.mtcnn_weights, f), map_location="cpu")
            for f in ("pnet.pt", "rnet.pt", "onet.pt")
        )
    )
    # decode feeds the detector raw BGR; the swap happens on device for free
    detector = MTCNNDetector(det_vars, channel_order="bgr")
    emb_vars = facenet_params_from_torch(
        torch.load(opt.facenet_weights, map_location="cpu")
    )
    embedder = FaceEmbedder(emb_vars)

    result = predict_video(opt.video_path, model, variables, cfg, detector, embedder)
    print(f"fake probability: {result.probability:.4f}")
    if opt.save_attentions:
        from mintime_tpu.utils.attention_viz import save_attention_plots

        save_attention_plots(
            result.aggregated_attentions,
            list(result.identities.keys()),
            result.frames_per_identity,
            cfg.model.num_frames,
            os.path.basename(opt.video_path),
        )
    if opt.output_type == 1:
        out = generate_output_video(opt.video_path, result)
        print("annotated video:", out)
    return result


if __name__ == "__main__":
    main()

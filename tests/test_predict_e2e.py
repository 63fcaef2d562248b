"""End-to-end predict() pipeline test on a synthetic video.

Uses an injected detector/embedder (the pretrained MTCNN/FaceNet weights
are external artifacts) to exercise decode → detect → crop → cluster →
assemble → jitted model → attention aggregation → annotated video output.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from mintime_tpu.config import MintimeConfig, ModelConfig
from mintime_tpu.models.classifier import MintimeVideoClassifier
from mintime_tpu.predict import generate_output_video, predict_video

SMALL = ModelConfig(
    image_size=32,
    num_frames=8,
    num_patches=1,
    channels=1280,
    dim=64,
    depth=2,
    heads=2,
    dim_head=32,
    max_identities=2,
)


class FakeDetector:
    """Always finds one face box in the frame center (half-res coords)."""

    def detect(self, frame):
        h, w = frame.shape[:2]
        return np.array([[w * 0.25, h * 0.25, w * 0.75, h * 0.75, 0.99]])


class FakeEmbedder:
    def __call__(self, crops):
        out = np.zeros((len(crops), 8))
        out[:, 0] = 1.0  # all crops one identity
        return out


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("videos") / "synthetic.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
    )
    rng = np.random.default_rng(0)
    for i in range(40):  # 4 seconds at 10 fps
        frame = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.circle(frame, (32, 24), 10, (200, 150, 120), -1)  # a "face"
        writer.write(frame)
    writer.release()
    assert os.path.getsize(path) > 0
    return path


def test_predict_end_to_end(synthetic_video, tmp_path):
    cfg = MintimeConfig(model=SMALL)
    model = MintimeVideoClassifier(
        SMALL, backbone="efficientnet-b0", head="timesformer", require_attention=True
    )
    frames = np.zeros((1, SMALL.num_frames, 32, 32, 3), np.float32)
    mask = np.ones((1, SMALL.num_frames), bool)
    id_mask = np.ones((1, SMALL.num_frames, SMALL.num_frames), bool)
    size_emb = np.ones((1, SMALL.num_frames), np.int32)
    positions = np.arange(1 + SMALL.num_frames)[None].astype(np.int32)
    variables = jax.jit(model.init)(
        jax.random.key(0), frames, mask, id_mask, size_emb, positions
    )

    result = predict_video(
        synthetic_video,
        model,
        variables,
        cfg,
        FakeDetector(),
        FakeEmbedder(),
    )
    assert 0.0 <= result.probability <= 1.0
    assert len(result.identity_attentions) == 1
    assert len(result.aggregated_attentions) == 3
    for a in result.aggregated_attentions:
        np.testing.assert_allclose(np.sum(a), 1.0, rtol=1e-6)
    assert result.frames_per_identity == [SMALL.num_frames]

    out = generate_output_video(synthetic_video, result, output_dir=str(tmp_path))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_predict_resize_on_device_wiring(synthetic_video):
    """A detector with ``input_scale=2`` makes the predict pipeline skip the
    host half-res resize: the detection stage must receive FULL-resolution
    BGR frames, while crops, size buckets, and video dims stay identical to
    the host-resized path given the same (half-res-coordinate) boxes.
    Cascade-level equivalence of the device downscale itself is pinned in
    tests/test_preprocessing.py::test_input_scale_device_downscale."""
    from mintime_tpu.predict import _stage_video

    cfg = MintimeConfig(model=SMALL)
    seen = {}

    class DeviceScaleDetector:
        input_scale = 2
        channel_order = "bgr"

        def detect_batch(self, frames):
            seen["device"] = frames[0].shape
            h, w = frames[0].shape[0] // 2, frames[0].shape[1] // 2
            return [
                np.array([[w * 0.25, h * 0.25, w * 0.75, h * 0.75, 0.99]])
                for _ in frames
            ]

    class HostScaleDetector:
        channel_order = "bgr"

        def detect_batch(self, frames):
            seen["host"] = frames[0].shape
            h, w = frames[0].shape[:2]
            return [
                np.array([[w * 0.25, h * 0.25, w * 0.75, h * 0.75, 0.99]])
                for _ in frames
            ]

    batch_d, plan_d, store_d = _stage_video(
        synthetic_video, DeviceScaleDetector(), FakeEmbedder(), cfg, 0.45, 1, None
    )
    batch_h, plan_h, store_h = _stage_video(
        synthetic_video, HostScaleDetector(), FakeEmbedder(), cfg, 0.45, 1, None
    )
    assert seen["device"] == (48, 64, 3)  # full-res reaches the detector
    assert seen["host"] == (24, 32, 3)  # host path still resizes
    for k in batch_h:
        np.testing.assert_array_equal(batch_d[k], batch_h[k])
    assert plan_d.identity_keys == plan_h.identity_keys


def test_predict_videos_batched_matches_single(synthetic_video, tmp_path_factory):
    """predict_videos (batched serving path) returns the same probabilities
    and attentions as per-video predict_video, including the padded last
    batch (3 videos, batch_size=2 → one full batch + one padded)."""
    from mintime_tpu.predict import predict_videos

    # second, differently-seeded video so batch rows are not identical
    path2 = str(tmp_path_factory.mktemp("videos2") / "synthetic2.mp4")
    writer = cv2.VideoWriter(path2, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    rng = np.random.default_rng(7)
    for _ in range(40):
        frame = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.circle(frame, (30, 22), 11, (180, 160, 130), -1)
        writer.write(frame)
    writer.release()

    cfg = MintimeConfig(model=SMALL)
    model = MintimeVideoClassifier(
        SMALL, backbone="efficientnet-b0", head="timesformer", require_attention=True
    )
    frames = np.zeros((1, SMALL.num_frames, 32, 32, 3), np.float32)
    mask = np.ones((1, SMALL.num_frames), bool)
    id_mask = np.ones((1, SMALL.num_frames, SMALL.num_frames), bool)
    size_emb = np.ones((1, SMALL.num_frames), np.int32)
    positions = np.arange(1 + SMALL.num_frames)[None].astype(np.int32)
    variables = jax.jit(model.init)(
        jax.random.key(0), frames, mask, id_mask, size_emb, positions
    )

    paths = [synthetic_video, path2, synthetic_video]
    batched = predict_videos(
        paths, model, variables, cfg, FakeDetector(), FakeEmbedder(), batch_size=2
    )
    assert len(batched) == len(paths)
    for path, res in zip(paths, batched):
        single = predict_video(
            path, model, variables, cfg, FakeDetector(), FakeEmbedder()
        )
        np.testing.assert_allclose(res.probability, single.probability, rtol=1e-5)
        np.testing.assert_allclose(
            res.identity_attentions, single.identity_attentions, rtol=1e-4
        )
        assert res.frames_per_identity == single.frames_per_identity
    # identical inputs (rows 0 and 2) agree regardless of batch position
    np.testing.assert_allclose(
        batched[0].probability, batched[2].probability, rtol=1e-6
    )


def test_predict_videos_pipelined_detection_matches_single(
    synthetic_video, tmp_path_factory
):
    """predict_videos with a REAL cascade detector takes the pipelined
    staging path (stage-1 pyramid of video i+1 dispatched before video i's
    host stages) and must match per-video predict_video bit-for-bit."""
    from mintime_tpu.predict import predict_videos
    from mintime_tpu.preprocessing.mtcnn import MTCNNDetector

    # random-init cascade at lowered thresholds so candidates survive
    detector = MTCNNDetector(
        MTCNNDetector.init_variables(), thresholds=(0.3, 0.2, 0.2)
    )

    path2 = str(tmp_path_factory.mktemp("videos3") / "synthetic3.mp4")
    writer = cv2.VideoWriter(path2, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    rng = np.random.default_rng(11)
    for _ in range(40):
        frame = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.circle(frame, (34, 26), 12, (190, 150, 110), -1)
        writer.write(frame)
    writer.release()

    cfg = MintimeConfig(model=SMALL)
    model = MintimeVideoClassifier(
        SMALL, backbone="efficientnet-b0", head="timesformer", require_attention=True
    )
    frames = np.zeros((1, SMALL.num_frames, 32, 32, 3), np.float32)
    mask = np.ones((1, SMALL.num_frames), bool)
    id_mask = np.ones((1, SMALL.num_frames, SMALL.num_frames), bool)
    size_emb = np.ones((1, SMALL.num_frames), np.int32)
    positions = np.arange(1 + SMALL.num_frames)[None].astype(np.int32)
    variables = jax.jit(model.init)(
        jax.random.key(0), frames, mask, id_mask, size_emb, positions
    )

    paths = [synthetic_video, path2]
    try:
        batched = predict_videos(
            paths, model, variables, cfg, detector, FakeEmbedder(), batch_size=2
        )
    except ValueError as e:
        pytest.skip(f"random-init cascade found no faces here: {e}")
    for path, res in zip(paths, batched):
        single = predict_video(
            path, model, variables, cfg, detector, FakeEmbedder()
        )
        np.testing.assert_allclose(res.probability, single.probability, rtol=1e-5)
        assert res.frames_per_identity == single.frames_per_identity


def test_predict_videos_mesh_matches_single(synthetic_video):
    """predict_videos with a (data, model) mesh — the multi-chip serving
    path — returns the same results as the single-device path (batch rows
    shard over the 8 virtual CPU devices; pad rows are discarded)."""
    from mintime_tpu.parallel.mesh import make_mesh
    from mintime_tpu.predict import predict_videos

    cfg = MintimeConfig(model=SMALL)
    model = MintimeVideoClassifier(
        SMALL, backbone="efficientnet-b0", head="timesformer", require_attention=True
    )
    frames = np.zeros((1, SMALL.num_frames, 32, 32, 3), np.float32)
    mask = np.ones((1, SMALL.num_frames), bool)
    id_mask = np.ones((1, SMALL.num_frames, SMALL.num_frames), bool)
    size_emb = np.ones((1, SMALL.num_frames), np.int32)
    positions = np.arange(1 + SMALL.num_frames)[None].astype(np.int32)
    variables = jax.jit(model.init)(
        jax.random.key(0), frames, mask, id_mask, size_emb, positions
    )

    mesh = make_mesh(jax.devices())  # 8 virtual CPU devices (conftest)
    paths = [synthetic_video] * 3  # 3 videos, batch 8 → one padded batch
    sharded = predict_videos(
        paths, model, variables, cfg, FakeDetector(), FakeEmbedder(),
        batch_size=8, mesh=mesh,
    )
    single = predict_video(
        synthetic_video, model, variables, cfg, FakeDetector(), FakeEmbedder()
    )
    assert len(sharded) == 3
    for res in sharded:
        np.testing.assert_allclose(res.probability, single.probability, rtol=1e-5)
        np.testing.assert_allclose(
            res.identity_attentions, single.identity_attentions, rtol=1e-4
        )
        assert res.frames_per_identity == single.frames_per_identity

    with pytest.raises(ValueError, match="data axis"):
        predict_videos(
            paths, model, variables, cfg, FakeDetector(), FakeEmbedder(),
            batch_size=3, mesh=mesh,
        )

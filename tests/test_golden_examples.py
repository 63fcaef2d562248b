"""Golden end-to-end parity on the reference's example videos.

The reference ships 6 example videos with pre-rendered predictions
(`/root/reference/examples/*.mp4`) — the BASELINE.json scenarios. Its
published weights (facenet-pytorch MTCNN/vggface2, MINTIME zoo checkpoints)
are NOT downloadable in this environment, so the proof is synthesized per
VERDICT r1 #1: drive the REFERENCE's own predict.py functions (imported with
test-only shims for its missing pip deps, tests/ref_shims/) and our pipeline
on the SAME golden videos, sharing (a) one deterministic detection pass and
(b) one embedding network (the Flax InceptionResnetV1, hooked into the
reference via the facenet_pytorch shim), with the reference's torch model
weights EXPORTED from our randomly-initialized Flax model through
utils/torch_convert. Asserted stage by stage:

  crops (geometry + pixels) → similarity/cluster memberships → assembled
  model inputs (sequence, size buckets, masks, positions) → per-video fake
  probability + per-identity attention (fp32 tolerance).

Everything downstream of raw detection is covered; the only uncompared
stage is the MTCNN cascade's weights themselves (unreachable), for which
`tests/test_preprocessing.py` covers the architecture via facenet-pytorch
converter contracts. Reference: predict.py:37-417.
"""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_shims")
EXAMPLES = os.path.join(REF, "examples")

# BASELINE.json configs 1-3 and 5: single pristine, single fake,
# two-identity fakes (attention + size-embedding paths)
VIDEOS = [
    "pristine_1_face_0.mp4",
    "fake_1_face_0.mp4",
    "fake_2_faces_1.mp4",
    "fake_2_faces_2.mp4",
]

pytestmark = [pytest.mark.parity, pytest.mark.slow]


@pytest.fixture(scope="module")
def ref_predict():
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    for p in (SHIMS, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    # the reference hardcodes .cuda() inside cluster_faces (predict.py:155);
    # run the whole harness on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    import predict as rp  # the REFERENCE's /root/reference/predict.py

    rp.device = torch.device("cpu")
    return rp


def _shared_boxes(video_path):
    """One shared deterministic detection pass, in the half-resolution
    coordinates the reference's detector emits (face_detector.py:78; boxes
    are scaled back by 2 at crop time, predict.py:103).

    This cv2 build ships no face-detection models, so the boxes are two
    procedural tracks (slowly drifting windows of different sizes over the
    frame) rather than detector output. Parity downstream of detection —
    crop geometry, embedding, clustering, assembly, size buckets, model —
    is exactly as exercised as with a real detector, and the two tracks of
    different mean size drive the multi-identity + size-embedding paths.
    """
    cap = cv2.VideoCapture(video_path)
    fps = int(cap.get(5)) or 30
    dims = (cap.get(3), cap.get(4))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    w2, h2 = dims[0] / 2.0, dims[1] / 2.0
    boxes = {}
    for i in range(n):
        drift = 8.0 * np.sin(i / 17.0)
        a_side = 0.30 * h2
        ax, ay = 0.32 * w2 + drift, 0.42 * h2 - drift / 2
        b_side = 0.20 * h2
        bx, by = 0.68 * w2 - drift, 0.45 * h2 + drift / 3
        frame_boxes = [
            [ax - a_side / 2, ay - a_side / 2, ax + a_side / 2, ay + a_side / 2],
            [bx - b_side / 2, by - b_side / 2, bx + b_side / 2, by + b_side / 2],
        ]
        # drop the small track every third second to exercise mask padding
        if (i // max(fps, 1)) % 3 == 2:
            frame_boxes = frame_boxes[:1]
        boxes[i] = [[float(v) for v in b] for b in frame_boxes]
    return boxes, fps, dims


@pytest.fixture(scope="module")
def pipelines(ref_predict, tmp_path_factory):
    """Run both pipelines on every golden video once; tests assert stages."""
    import jax
    import jax.numpy as jnp
    import yaml

    import facenet_pytorch as shim  # the ref_shims module, post path setup
    from mintime_tpu.config import load_config
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.predict import (
        assemble_inputs,
        cluster_crops,
        extract_video_crops,
        predict_video,
    )
    from mintime_tpu.preprocessing.cluster_faces import FaceEmbedder
    from mintime_tpu.preprocessing.facenet import InceptionResnetV1 as FlaxIRV1
    from mintime_tpu.utils.torch_convert import (
        efficientnet_params_to_torch,
        timesformer_params_to_torch,
    )

    tmp = tmp_path_factory.mktemp("golden")

    # ---- shared embedding network: one Flax InceptionResnetV1 behind both
    # our FaceEmbedder and the reference's facenet_pytorch shim
    emb_vars = FaceEmbedder.init_variables(jax.random.key(7))
    embedder = FaceEmbedder(emb_vars)
    flax_fwd = jax.jit(lambda v, x: FlaxIRV1().apply(v, x))
    shim.EMBED_HOOK = lambda x: np.asarray(flax_fwd(emb_vars, jnp.asarray(x)))

    # ---- one model, two exports: Flax params → reference torch state_dicts
    cfg = load_config("configs/size_invariant_timesformer.yaml")
    mcfg = type(cfg.model)(**{**cfg.model.__dict__, "channels": 1280})
    cfg = type(cfg)(model=mcfg, training=cfg.training)
    model = MintimeVideoClassifier(
        mcfg, backbone="efficientnet-b0", head="timesformer",
        require_attention=True,
    )
    example = np.zeros((1, mcfg.num_frames, mcfg.image_size, mcfg.image_size, 3),
                       np.float32)
    variables = jax.jit(model.init, static_argnames=())(
        jax.random.key(11), example,
        np.ones((1, mcfg.num_frames), bool),
        np.ones((1, mcfg.num_frames, mcfg.num_frames), bool),
        np.ones((1, mcfg.num_frames), np.int32),
        np.zeros((1, 1 + mcfg.num_frames * mcfg.num_patches), np.int32),
    )
    ext_vars = {
        "params": variables["params"]["extractor"],
        "batch_stats": variables["batch_stats"]["extractor"],
    }
    ext_sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in efficientnet_params_to_torch(ext_vars).items()
    }
    head_sd = {
        "module." + k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in timesformer_params_to_torch(
            variables["params"]["head"], mcfg
        ).items()
    }  # DataParallel-wrapped load needs the module. prefix (predict.py:379-388)
    ext_path, head_path = str(tmp / "Extractor_ckpt"), str(tmp / "Model_ckpt")
    torch.save(ext_sd, ext_path)
    torch.save(head_sd, head_path)

    with open("configs/size_invariant_timesformer.yaml") as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["model"]["channels"] = 1280
    ref_cfg["model"].setdefault("patch-size", 7)
    ref_cfg["model"].setdefault("shift-tokens", False)

    class Opt:
        extractor_model = 0
        extractor_weights = ext_path
        model_weights = head_path
        save_attentions = True

    results = {}
    cwd = os.getcwd()
    for name in VIDEOS:
        video = os.path.join(EXAMPLES, name)
        boxes, fps, dims = _shared_boxes(video)
        if not any(v for v in boxes.values()):
            results[name] = {"skip": "no frames decoded"}
            continue

        # ---- reference side
        ref_crops = ref_predict.extract_crops(video, dict(boxes))
        ref_clusters = ref_predict.cluster_faces(ref_crops)
        os.chdir(tmp)  # save_attention_plots writes to outputs/tokens/
        os.makedirs("outputs/tokens", exist_ok=True)
        try:
            ref_identities, _ = ref_predict.get_sorted_identities(ref_clusters, None)
            (ref_seq, ref_sizes, ref_mask, ref_idm, ref_pos,
             ref_tpi) = ref_predict.generate_masks(
                video, ref_identities, [], ref_cfg["model"]["num-frames"],
                ref_cfg["model"]["image-size"], ref_cfg["model"]["num-patches"],
            )
            ref_prob, ref_id_attn, ref_agg, _, ref_fpi = ref_predict.predict(
                video, ref_clusters, ref_cfg, Opt()
            )
        finally:
            os.chdir(cwd)

        # ---- our side
        boxes_str = {str(k): v for k, v in boxes.items()}
        our_crops = extract_video_crops(video, boxes_str, fps)
        our_ids, _ = cluster_crops(our_crops, embedder)
        our_batch, our_plan, _ = assemble_inputs(our_ids, dims, cfg)
        our = predict_video(
            video, model, variables, cfg, detector=None, embedder=embedder,
            boxes=boxes_str,
        )
        results[name] = dict(
            ref_crops=ref_crops, our_crops=our_crops,
            ref_clusters=ref_clusters, our_ids=our_ids,
            ref_batch=(ref_seq, ref_sizes, ref_mask, ref_idm, ref_pos, ref_tpi),
            our_batch=our_batch, our_plan=our_plan,
            ref_out=(ref_prob, ref_id_attn, ref_agg, ref_fpi),
            our_out=our,
        )
    return results


def _unskipped(results, name):
    r = results[name]
    if "skip" in r:
        pytest.skip(r["skip"])
    return r


@pytest.mark.parametrize("name", VIDEOS)
def test_crops_match(pipelines, name):
    """Same 1/sec anchor frames, same square-crop geometry, same pixels."""
    r = _unskipped(pipelines, name)
    ref, ours = r["ref_crops"], r["our_crops"]
    assert len(ref) == len(ours) > 0
    for (rf, rimg, rbox), (of, _, oimg, obox) in zip(ref, ours):
        assert rf == of
        np.testing.assert_array_equal(np.asarray(rbox), np.asarray(obox))
        np.testing.assert_array_equal(np.asarray(rimg), oimg)


@pytest.mark.parametrize("name", VIDEOS)
def test_clusters_match(pipelines, name):
    """Identical identity memberships from the shared embedding network."""
    r = _unskipped(pipelines, name)
    ref_sets = sorted(
        tuple(sorted((f, img.size) for f, img, _ in faces))
        for faces in r["ref_clusters"].values()
    )
    our_sets = sorted(
        tuple(sorted((f, (c.shape[1], c.shape[0])) for f, _, c, _ in faces))
        for faces in r["our_ids"].values()
    )
    assert ref_sets == our_sets and len(ref_sets) >= 1


@pytest.mark.parametrize("name", VIDEOS)
def test_assembled_inputs_match(pipelines, name):
    """Sequence pixels, size buckets, masks and positions all equal."""
    r = _unskipped(pipelines, name)
    ref_seq, ref_sizes, ref_mask, ref_idm, ref_pos, _ = r["ref_batch"]
    ours = r["our_batch"]
    np.testing.assert_array_equal(ref_mask.numpy()[0], ours["mask"][0])
    np.testing.assert_array_equal(
        ref_sizes.numpy()[0].astype(np.int32), ours["size_embedding"][0]
    )
    np.testing.assert_array_equal(ref_idm.numpy()[0], ours["identities_mask"][0])
    np.testing.assert_array_equal(ref_pos.numpy()[0], ours["positions"][0])
    np.testing.assert_allclose(
        ref_seq.numpy()[0], ours["frames"][0], atol=1e-4,
        err_msg="assembled face sequence differs",
    )


@pytest.mark.parametrize("name", VIDEOS)
def test_probability_and_attention_match(pipelines, name):
    """The reference predict() (torch, exported weights) and our pipeline
    agree on the fake probability and per-identity attention."""
    r = _unskipped(pipelines, name)
    ref_prob, ref_id_attn, ref_agg, ref_fpi = r["ref_out"]
    ours = r["our_out"]
    assert abs(ref_prob - ours.probability) < 2e-3
    assert ref_fpi == ours.frames_per_identity
    np.testing.assert_allclose(
        np.asarray(ref_id_attn, np.float64),
        np.asarray(ours.identity_attentions, np.float64),
        atol=1e-3,
    )
    for a, b in zip(ref_agg, ours.aggregated_attentions):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

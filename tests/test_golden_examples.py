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

# ALL SIX reference example videos (BASELINE.json scenarios): single
# pristine, single fake, two-identity fakes (attention + size-embedding
# paths), the missed-detection video, and the N>2-identity video
VIDEOS = [
    "pristine_1_face_0.mp4",
    "fake_1_face_0.mp4",
    "fake_2_faces_1.mp4",
    "fake_2_faces_2.mp4",
    "fake_2_faces_0_miss.mp4",
    "fake_N_faces_0.mp4",
]
MISS_VIDEO = "fake_2_faces_0_miss.mp4"
N_VIDEO = "fake_N_faces_0.mp4"

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

    class _ObjectArrayNumpy:
        """numpy facade for the reference module only: its ragged
        ``[frame, PIL.Image, bbox]`` rows (predict.py:280) relied on legacy
        ``np.asarray`` building object arrays; numpy>=2 raises
        'inhomogeneous shape' instead. Restore the old behavior as a 1-D
        object array — row indexing/iteration semantics unchanged."""

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

    rp.np = _ObjectArrayNumpy()
    return rp


def _shared_boxes(video_path, name=None):
    """One shared deterministic detection pass, in the half-resolution
    coordinates the reference's detector emits (face_detector.py:78; boxes
    are scaled back by 2 at crop time, predict.py:103).

    This cv2 build ships no face-detection models, so the boxes are
    procedural tracks (slowly drifting windows of different sizes over the
    frame) rather than detector output. Parity downstream of detection —
    crop geometry, embedding, clustering, assembly, size buckets, model —
    is exactly as exercised as with a real detector. Per-video patterns:

    * default: two tracks of different mean size (multi-identity +
      size-embedding paths), the small one dropped every third second.
    * ``fake_2_faces_0_miss.mp4``: every third second has NO detections at
      all (``None`` boxes) — the missed-detection path: those seconds yield
      no crops, leaving temporal holes in the chosen frame numbers.
    * ``fake_N_faces_0.mp4``: FOUR tracks of distinct sizes/positions with
      different dropout cadences, driving the 3-/4-identity quota rows,
      the deficit flow (track 2's shortfall moves to track 3) and the
      surplus backfill (track 0 has spare faces) of ``assign_slots``.
    """
    cap = cv2.VideoCapture(video_path)
    fps = int(cap.get(5)) or 30
    dims = (cap.get(3), cap.get(4))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    w2, h2 = dims[0] / 2.0, dims[1] / 2.0
    boxes = {}
    n_tracks = 4 if name == N_VIDEO else 2
    # (relative side, relative center x/y, per-second dropout predicate)
    tracks = [
        (0.30, 0.32, 0.42, lambda s: False),
        (0.20, 0.68, 0.45, lambda s: s % 3 == 2),
        (0.15, 0.50, 0.72, lambda s: s % 2 == 1),  # short: feeds deficit flow
        (0.11, 0.80, 0.25, lambda s: s % 4 == 3),
    ][:n_tracks]
    for i in range(n):
        second = i // max(fps, 1)
        if name == MISS_VIDEO and second % 3 == 1:
            boxes[i] = None  # a whole second with no detections
            continue
        drift = 8.0 * np.sin(i / 17.0)
        frame_boxes = []
        for t, (side_r, cx_r, cy_r, dropped) in enumerate(tracks):
            if dropped(second):
                continue
            side = side_r * h2
            sign = 1.0 if t % 2 == 0 else -1.0
            cx = cx_r * w2 + sign * drift
            cy = cy_r * h2 - sign * drift / (t + 2)
            frame_boxes.append(
                [cx - side / 2, cy - side / 2, cx + side / 2, cy + side / 2]
            )
        boxes[i] = [[float(v) for v in b] for b in frame_boxes] or None
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
        boxes, fps, dims = _shared_boxes(video, name)
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

        if name == N_VIDEO:
            # The reference's predict() hardcodes max_identities=2
            # (predict.py:392 uses the get_sorted_identities default), so the
            # 3-/4-identity quota rows can only be golden-compared at the
            # assembly stage: run its get_sorted_identities/generate_masks
            # with max_identities=4 against our assembler at the same cap.
            # The random-weight embedder yields near-uniform similarities at
            # the production threshold 0.45 (everything merges); pick a
            # threshold that actually separates the 4 tracks and pass the
            # SAME value to both pipelines — it is a plain parameter of
            # cluster_faces (predict.py:144) and the comparison is about the
            # assembly math, not the embedder's calibration.
            from mintime_tpu.preprocessing.cluster_faces import (
                connected_components,
            )

            emb = embedder([c[2] for c in our_crops])
            sims = emb @ emb.T
            offdiag = sims[np.triu_indices(len(sims), 1)]
            thr_n = None
            for q in np.linspace(0.5, 0.995, 40):
                t = float(np.quantile(offdiag, q))
                if len(connected_components(sims, t)) >= 3:
                    thr_n = t
                    break
            if thr_n is not None:
                ref_clusters4 = ref_predict.cluster_faces(
                    ref_crops, similarity_threshold=thr_n
                )
                our_ids4, _ = cluster_crops(our_crops, embedder, thr_n)
                ref_ids4, _ = ref_predict.get_sorted_identities(
                    ref_clusters4, None, max_identities=4,
                    num_frames=ref_cfg["model"]["num-frames"],
                )
                ref_batch4 = ref_predict.generate_masks(
                    video, ref_ids4, [], ref_cfg["model"]["num-frames"],
                    ref_cfg["model"]["image-size"],
                    ref_cfg["model"]["num-patches"],
                )
                mcfg4 = type(mcfg)(**{**mcfg.__dict__, "max_identities": 4})
                cfg4 = type(cfg)(model=mcfg4, training=cfg.training)
                our_batch4, our_plan4, _ = assemble_inputs(our_ids4, dims, cfg4)
                results[name]["ref_batch4"] = ref_batch4
                results[name]["our_batch4"] = our_batch4
                results[name]["our_plan4"] = our_plan4
                results[name]["our_ids4"] = our_ids4
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


def test_miss_video_has_temporal_holes(pipelines):
    """The missed-detection video must actually exercise the miss path:
    whole seconds without crops leave gaps in the chosen frame numbers."""
    r = _unskipped(pipelines, MISS_VIDEO)
    crop_frames = sorted({f for f, *_ in r["our_crops"]})
    assert len(crop_frames) >= 3
    gaps = np.diff(crop_frames)
    assert (gaps > gaps.min()).any(), "expected missing seconds in the track"


def test_n_identity_quota_parity(pipelines):
    """3-/4-identity quota rows, deficit flow and surplus backfill of the
    adaptive slot assignment, compared against the reference's own
    get_sorted_identities + generate_masks at max_identities=4."""
    r = _unskipped(pipelines, N_VIDEO)
    assert "our_batch4" in r, "no separating similarity threshold was found"
    assert len(r["our_ids4"]) >= 3, (
        "the 4-track pattern must cluster into >=3 identities for the "
        "quota rows to run"
    )
    ref_seq, ref_sizes, ref_mask, ref_idm, ref_pos, ref_tpi = r["ref_batch4"]
    ours = r["our_batch4"]
    np.testing.assert_array_equal(ref_mask.numpy()[0], ours["mask"][0])
    np.testing.assert_array_equal(
        ref_sizes.numpy()[0].astype(np.int32), ours["size_embedding"][0]
    )
    np.testing.assert_array_equal(ref_idm.numpy()[0], ours["identities_mask"][0])
    np.testing.assert_array_equal(ref_pos.numpy()[0], ours["positions"][0])
    np.testing.assert_allclose(ref_seq.numpy()[0], ours["frames"][0], atol=1e-4)
    # tokens_per_identity: the reference's formula (predict.py:351) adds only
    # the PREVIOUS identity's tokens — entry i = (f_i + f_{i-1})·P — which
    # coincides with a cumulative sum at ≤2 identities (all its CLI can
    # reach) but is wrong at ≥3, where aggregate_attentions' ranges would
    # invert. We emit the intended cumulative sum (PARITY ledger); compare
    # the recoverable per-identity face counts instead.
    P = 49
    ref_faces = []
    for i, (_, t) in enumerate(ref_tpi):
        ref_faces.append(int(t) // P - (ref_faces[i - 1] if i else 0))
    our_cum = [int(t) for _, t in r["our_plan4"].tokens_per_identity]
    our_faces = [
        (t - (our_cum[i - 1] if i else 0)) // P for i, t in enumerate(our_cum)
    ]
    assert ref_faces == our_faces and len(ref_faces) >= 3

"""Training loop integration test: synthetic on-disk dataset → fit() on the
8-device CPU mesh, with checkpoint save/restore round-trip."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from mintime_tpu.config import MintimeConfig, ModelConfig, TrainingConfig
from mintime_tpu.data.dataset import DeepfakesDataset
from mintime_tpu.data.loader import DataLoader
from mintime_tpu.models.classifier import MintimeVideoClassifier
from mintime_tpu.parallel.mesh import make_mesh
from mintime_tpu.train import create_train_state, pos_weight_from_labels
from mintime_tpu.train_loop import fit
from mintime_tpu.utils.checkpoint import restore_train_state, save_train_state

SMALL = ModelConfig(
    image_size=32,
    num_frames=8,
    num_patches=1,
    channels=1280,
    dim=32,
    depth=1,
    heads=2,
    dim_head=16,
    max_identities=2,
)


@pytest.fixture(scope="module")
def faces_dir(tmp_path_factory):
    """Reference on-disk layout: <video>/<identity_k>/<frame>_<face>.png."""
    root = tmp_path_factory.mktemp("faces")
    rng = np.random.default_rng(0)
    videos = []
    for v in range(8):
        vdir = root / f"video_{v}"
        for ident in range(1 + v % 2):
            idir = vdir / str(ident)
            idir.mkdir(parents=True)
            for frame in range(0, 150, 30):
                img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                cv2.imwrite(str(idir / f"{frame}_0.png"), img)
        # original-video dims sidecar (extract_crops contract)
        (vdir / "video_dims.json").write_text(
            '{"width": 1280, "height": 720, "fps": 30}'
        )
        videos.append(f"video_{v}")
    labels = [float(v % 2) for v in range(8)]
    return str(root), videos, labels


def make_loader(faces_dir, mode, mesh=None, bs=4):
    root, videos, labels = faces_dir
    ds = DeepfakesDataset(
        videos,
        labels,
        data_path=root,
        image_size=SMALL.image_size,
        num_frames=SMALL.num_frames,
        num_patches=SMALL.num_patches,
        max_identities=SMALL.max_identities,
        mode=mode,
        augmentation="min",
    )
    return DataLoader(ds, batch_size=bs, shuffle=(mode == "train"), num_workers=2,
                      mesh=mesh, drop_last=True)


def test_dataset_contract(faces_dir):
    loader = make_loader(faces_dir, "train")
    batch = next(iter(loader))
    F = SMALL.num_frames
    assert batch["frames"].shape == (4, F, 32, 32, 3)
    assert batch["mask"].shape == (4, F)
    assert batch["identities_mask"].shape == (4, F, F)
    assert batch["size_embedding"].shape == (4, F)
    assert batch["positions"].shape == (4, 1 + F * SMALL.num_patches)
    assert batch["labels"].shape == (4,)
    # masked slots must carry size bucket 0
    assert (batch["size_embedding"][~batch["mask"]] == 0).all()


@pytest.mark.slow
def test_fit_and_checkpoint_roundtrip(faces_dir, tmp_path):
    cfg = MintimeConfig(model=SMALL, training=TrainingConfig(bs=4, val_bs=4, lr=0.05))
    mesh = make_mesh(jax.devices()[:4])
    train_loader = make_loader(faces_dir, "train", mesh=mesh)
    val_loader = make_loader(faces_dir, "val", mesh=mesh)
    model = MintimeVideoClassifier(SMALL, backbone="efficientnet-b0",
                                   head="timesformer")
    example = next(iter(make_loader(faces_dir, "val")))
    state = create_train_state(
        jax.random.key(0), model, example, cfg, steps_per_epoch=2, num_epochs=2
    )
    _, labels = faces_dir[1], faces_dir[2]
    pw = pos_weight_from_labels(labels)

    state, result = fit(
        model, state, train_loader, val_loader, mesh, cfg,
        num_epochs=1, patience=2, pos_weight=pw,
        models_output_path=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    assert result.epochs_run >= 1
    assert np.isfinite(result.best_val_loss)
    assert result.checkpoints, "best-val checkpoint must be saved"
    assert os.path.exists(tmp_path / "logs" / "scalars.jsonl")
    # real TensorBoard event files next to the JSONL (reference train.py:467-472)
    assert any(
        f.startswith("events.out.tfevents") for f in os.listdir(tmp_path / "logs")
    ), "ScalarLogger must write TB event files when a writer is importable"

    # round-trip: restore into a fresh state and compare a param leaf
    fresh = create_train_state(
        jax.random.key(1), model, example, cfg, steps_per_epoch=2, num_epochs=2
    )
    restored = restore_train_state(result.checkpoints[-1], fresh)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


@pytest.mark.slow
def test_fit_overfits_learnable_dataset(tmp_path):
    """The loop LEARNS, not just matches one step: 8 videos whose label is
    encoded in image brightness, ~50 steps through the real fit() (loader +
    min-augment + schedule + BN stats + Pallas custom_vjp), and train/val
    loss must collapse well below chance (ln 2 ≈ 0.693) with accuracy 1.0.
    Reference behavior target: train.py:314-472 (VERDICT r4 #3)."""
    from mintime_tpu.evaluate import evaluate

    root = tmp_path / "learnable"
    rng = np.random.default_rng(7)
    videos, labels = [], []
    for v in range(8):
        label = v % 2
        vdir = root / f"video_{v}"
        idir = vdir / "0"
        idir.mkdir(parents=True)
        for frame in range(0, 150, 30):
            base = 60 if label == 0 else 190
            img = np.clip(
                base + rng.normal(0, 12, (40, 40, 3)), 0, 255
            ).astype(np.uint8)
            cv2.imwrite(str(idir / f"{frame}_0.png"), img)
        (vdir / "video_dims.json").write_text(
            '{"width": 1280, "height": 720, "fps": 30}'
        )
        videos.append(f"video_{v}")
        labels.append(float(label))
    learnable = (str(root), videos, labels)

    cfg = MintimeConfig(
        model=SMALL,
        training=TrainingConfig(bs=4, val_bs=4, lr=1e-3, optimizer="Adam"),
    )
    mesh = make_mesh(jax.devices()[:4])
    model = MintimeVideoClassifier(SMALL, backbone="efficientnet-b0",
                                   head="timesformer", use_pallas=True)
    example = next(iter(make_loader(learnable, "val")))
    num_epochs = 24  # 2 steps/epoch × 25 epochs = 50 steps (num_epochs is inclusive)
    state = create_train_state(
        jax.random.key(0), model, example, cfg, steps_per_epoch=2,
        num_epochs=num_epochs,
    )
    state, result = fit(
        model, state, make_loader(learnable, "train", mesh=mesh),
        make_loader(learnable, "val", mesh=mesh), mesh, cfg,
        num_epochs=num_epochs, patience=num_epochs + 1, pos_weight=1.0,
        models_output_path=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    import json as _json

    with open(tmp_path / "logs" / "scalars.jsonl") as f:
        scalars = [_json.loads(line) for line in f]
    last = {d["tag"]: d["value"] for d in scalars}  # last write per tag wins
    assert last["Training/Loss"] < 0.35, (
        f"loop failed to learn: final train loss {last['Training/Loss']:.4f} "
        "not well below chance (0.693)"
    )
    assert last["Training/Accuracy"] == 1.0, last
    # Eval-mode metrics intentionally NOT asserted tight: BatchNorm running
    # stats at reference momentum 0.99 are still ~0.99^50 ≈ 60% at their
    # (0, 1) init after 50 steps, so eval-mode logits lag train-mode badly on
    # a from-scratch 50-step run — reference-parity behavior, not a loop
    # defect. We only require the eval path to produce finite loss on the
    # trained state.
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    report = evaluate(model, variables, make_loader(learnable, "val"))
    assert report["n_videos"] == 8 and np.isfinite(report["loss"]), report


@pytest.mark.slow
def test_fit_metric_cadence_and_packed_dataset(faces_dir, tmp_path):
    """(a) Async metric draining (one host sync per log window, train_loop
    fit) yields IDENTICAL epoch stats to per-step fetching; (b) training
    runs off the packed crop store (crops.pack) end-to-end."""
    import json as _json
    import shutil

    from mintime_tpu.data.crop_store import pack_video_dir

    root, videos, labels = faces_dir
    packed_root = str(tmp_path / "packed")
    shutil.copytree(root, packed_root)
    for v in videos:
        pack_video_dir(os.path.join(packed_root, v), remove_images=True)
    packed = (packed_root, videos, labels)

    cfg = MintimeConfig(model=SMALL, training=TrainingConfig(bs=4, val_bs=4, lr=0.05))
    mesh = make_mesh(jax.devices()[:4])
    model = MintimeVideoClassifier(SMALL, backbone="efficientnet-b0",
                                   head="timesformer")
    example = next(iter(make_loader(packed, "val")))
    pw = pos_weight_from_labels(labels)

    def run(log_every, tag):
        state = create_train_state(
            jax.random.key(0), model, example, cfg, steps_per_epoch=2, num_epochs=1
        )
        fit(
            model, state, make_loader(packed, "train", mesh=mesh),
            make_loader(packed, "val", mesh=mesh), mesh, cfg,
            num_epochs=0, patience=2, pos_weight=pw,
            models_output_path=str(tmp_path / f"ckpt_{tag}"),
            log_dir=str(tmp_path / f"logs_{tag}"), log_every=log_every,
        )
        with open(tmp_path / f"logs_{tag}" / "scalars.jsonl") as f:
            return {
                (d["tag"], d["step"]): d["value"]
                for d in map(_json.loads, f) if d["tag"].startswith("Training")
            }

    per_step = run(1, "everystep")
    windowed = run(1000, "windowed")
    assert per_step.keys() == windowed.keys()
    for k in per_step:
        np.testing.assert_allclose(per_step[k], windowed[k], rtol=0, atol=0,
                                   err_msg=str(k))


def test_loader_process_mode(faces_dir):
    """Forked-worker loader returns identical, in-order batches."""
    root, videos, labels = faces_dir
    mk = lambda mode: DeepfakesDataset(
        videos, labels, data_path=root,
        image_size=SMALL.image_size, num_frames=SMALL.num_frames,
        num_patches=SMALL.num_patches, max_identities=SMALL.max_identities,
        mode="val", augmentation="min",
    )
    a = DataLoader(mk("val"), batch_size=4, shuffle=False, num_workers=2,
                   worker_mode="process")
    b = DataLoader(mk("val"), batch_size=4, shuffle=False, num_workers=2,
                   worker_mode="thread")
    batches_a, batches_b = list(a), list(b)
    assert len(batches_a) == len(batches_b) == 2
    for ba, bb in zip(batches_a, batches_b):
        assert ba["frames"].dtype == np.uint8
        np.testing.assert_array_equal(ba["frames"], bb["frames"])
        np.testing.assert_array_equal(ba["positions"], bb["positions"])
        np.testing.assert_array_equal(ba["labels"], bb["labels"])


def test_loader_surfaces_dataset_errors(faces_dir):
    """A dataset exception must raise RuntimeError in BOTH worker modes —
    never a silent producer death that leaves the consumer blocked on the
    queue forever (SURVEY §5.3; regression: thread mode hung on the
    video-dims ValueError from dataset.py:_video_area)."""

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise ValueError("unknown original video dimensions")

    import pytest

    for mode in ("thread", "process"):
        dl = DataLoader(Broken(), batch_size=4, shuffle=False, num_workers=2,
                        worker_mode=mode)
        with pytest.raises(RuntimeError, match="loader worker"):
            list(dl)


def test_extractor_unfreeze_mask(faces_dir):
    """Only the last-k extractor blocks (and all head params) get updates."""
    import jax.numpy as jnp

    from mintime_tpu.train import extractor_unfreeze_mask, make_optimizer

    cfg = MintimeConfig(model=SMALL, training=TrainingConfig(bs=4, lr=0.1,
                                                             optimizer="SGD"))
    model = MintimeVideoClassifier(SMALL, backbone="efficientnet-b0",
                                   head="timesformer")
    loader = make_loader(faces_dir, "val")
    batch = next(iter(loader))
    state = create_train_state(
        jax.random.key(0), model, batch, cfg,
        trainable_mask=extractor_unfreeze_mask(2),
    )
    from mintime_tpu.train import make_train_step

    step = make_train_step(model, 1.0)
    new_state, _ = jax.jit(step)(state, batch, jax.random.key(1))

    def changed(tree_a, tree_b):
        return jax.tree.map(
            lambda a, b: bool(jnp.any(a != b)), tree_a, tree_b
        )

    ext_old = state.params["extractor"]
    ext_new = new_state.params["extractor"]
    ch = changed(ext_old, ext_new)
    leaves = jax.tree_util.tree_flatten_with_path(ch)[0]
    for path, did_change in leaves:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        in_last2 = any(
            p.startswith("block_") and int(p.split("_")[1]) >= 14
            for p in key.split("/")
        )
        assert did_change == in_last2, f"{key}: changed={did_change}"
    # head params must all train
    head_ch = jax.tree.leaves(changed(state.params["head"], new_state.params["head"]))
    assert all(head_ch)


@pytest.mark.slow
def test_tensor_parallel_matches_data_parallel(faces_dir):
    """dp4×tp2 Megatron sharding computes the same loss as pure dp4."""
    from mintime_tpu.parallel.mesh import state_shardings
    from mintime_tpu.train import jit_steps

    cfg = MintimeConfig(model=SMALL, training=TrainingConfig(bs=4, val_bs=4, lr=0.05))
    model = MintimeVideoClassifier(SMALL, backbone="efficientnet-b0", head="timesformer")

    losses = {}
    for tp in (1, 2):
        mesh = make_mesh(jax.devices()[:4], model_parallel=tp)
        loader = make_loader(faces_dir, "val", mesh=mesh, bs=4)
        with jax.set_mesh(mesh):
            batch = next(iter(loader))
            state = create_train_state(jax.random.key(0), model, batch, cfg)
            if tp > 1:
                state = jax.device_put(state, state_shardings(state, mesh))
            train_step, eval_step = jit_steps(model, mesh, pos_weight=1.0, state=state)
            state, metrics = train_step(state, batch, jax.random.key(1))
            out = eval_step(state, batch)
            losses[tp] = (float(metrics["loss"]), float(out["loss"]))
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-5)


@pytest.mark.slow
def test_pallas_train_step_on_mesh(faces_dir):
    """One sharded train step with the fused Pallas attention (custom_vjp)
    produces the same loss/metrics as the XLA attention path."""
    from mintime_tpu.parallel.mesh import shard_batch
    from mintime_tpu.train import jit_steps

    cfg = MintimeConfig(model=SMALL, training=TrainingConfig(bs=4, val_bs=4, lr=0.05))
    mesh = make_mesh(jax.devices()[:4])
    example = next(iter(make_loader(faces_dir, "val")))
    losses = {}
    for use_pallas in (False, True):
        model = MintimeVideoClassifier(
            SMALL, backbone="efficientnet-b0", head="timesformer",
            use_pallas=use_pallas,
        )
        state = create_train_state(
            jax.random.key(0), model, example, cfg, steps_per_epoch=2, num_epochs=2
        )
        with jax.set_mesh(mesh):
            train_step, _ = jit_steps(model, mesh, pos_weight=1.0)
            state, metrics = train_step(state, shard_batch(mesh, example),
                                        jax.random.key(1))
            state, metrics2 = train_step(state, shard_batch(mesh, example),
                                         jax.random.key(1))
        losses[use_pallas] = (float(metrics["loss"]), float(metrics2["loss"]))
    # step-0 losses identical-ish; step-1 loss reflects the custom_vjp update
    np.testing.assert_allclose(losses[True][0], losses[False][0], rtol=1e-4)
    np.testing.assert_allclose(losses[True][1], losses[False][1], rtol=1e-3)


@pytest.mark.slow
def test_pretrain_extractor_cli(faces_dir, tmp_path):
    """Frame-level extractor pretraining end to end: manifests → rebalanced
    frame sampling → jitted train/val epochs → custom_video_round accuracy →
    reference-format Extractor_checkpoint export loadable by the video
    trainer (cross-efficient-vit/train.py:44-322 parity)."""
    from mintime_tpu.pretrain_extractor import main as pretrain_main
    from mintime_tpu.utils.torch_convert import efficientnet_params_from_torch

    pytest.importorskip("torch")
    root, videos, labels = faces_dir
    train_csv = tmp_path / "train.csv"
    val_csv = tmp_path / "val.csv"
    rows = [f"{v} {int(l)} {i % 8}" for i, (v, l) in enumerate(zip(videos, labels))]
    train_csv.write_text("\n".join(rows[:6]) + "\n")
    val_csv.write_text("\n".join(rows[6:]) + "\n")
    cfg = tmp_path / "pretrain.yaml"
    cfg.write_text(
        "training:\n  bs: 4\n  lr: 0.05\n  optimizer: 'SGD'\n"
        "  scheduler: 'steplr'\n  step-size: 1\n  gamma: 0.5\n"
        "  rebalancing-fake: 1.0\n  rebalancing-real: 1.0\n"
        "  frames-per-video: 4\n  augmentation: 'min'\n"
        "model:\n  image-size: 32\n  num-classes: 1\n"
    )
    best = pretrain_main([
        "--config", str(cfg),
        "--train_list_file", str(train_csv),
        "--validation_list_file", str(val_csv),
        "--data_path", root,
        "--num_epochs", "1", "--patience", "2", "--workers", "2",
        "--models_output_path", str(tmp_path / "out"),
    ])
    assert best and os.path.exists(best)
    import torch

    ext = efficientnet_params_from_torch(torch.load(best, weights_only=True))
    assert "conv_stem" in ext["params"]


def test_collect_frames_rebalancing(faces_dir):
    from mintime_tpu.pretrain_extractor import collect_frames

    root, videos, labels = faces_dir
    paths, out_labels = collect_frames(
        videos, labels, root, frames_per_video=4,
        rebalancing_real=1.0, rebalancing_fake=0.5,
    )
    # fake videos keep half the quota (cross-efficient-vit train.py:88-91)
    per_video = {}
    for p, l in zip(paths, out_labels):
        key = os.path.relpath(p, root).split(os.sep)[0]
        per_video.setdefault(key, []).append(l)
    for v, l in zip(videos, labels):
        expect = 4 if int(l) == 0 else 2
        assert len(per_video[v]) == min(expect, 5), (v, l)
    # validation quota: int(max(min/8, 2))
    vp, _ = collect_frames(videos[:1], labels[:1], root, frames_per_video=16,
                           validation=True)
    assert len(vp) == 2


def test_evaluate_mesh_matches_single(faces_dir):
    """Data-parallel evaluate over the 8-device mesh reports exactly what
    the single-device run reports — including a PARTIAL final batch (6
    videos in a batch of 8), whose mesh-path pad rows (loader._shard
    cyclic repeat + valid mask) must be filtered from logits, labels,
    loss, and per-method counts."""
    from mintime_tpu.evaluate import evaluate
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.train import model_inputs

    root, videos, labels = faces_dir
    videos, labels = videos[:6], labels[:6]

    def mk(mesh):
        ds = DeepfakesDataset(
            videos, labels, data_path=root,
            image_size=SMALL.image_size, num_frames=SMALL.num_frames,
            num_patches=SMALL.num_patches, max_identities=SMALL.max_identities,
            mode="test", multiclass_labels=[int(l) * 3 for l in labels],
        )
        return DataLoader(ds, batch_size=8, shuffle=False, num_workers=2,
                          mesh=mesh)

    model = MintimeVideoClassifier(
        SMALL, backbone="efficientnet-b0", head="timesformer"
    )
    example = next(iter(mk(None)))
    variables = jax.jit(model.init)(
        jax.random.key(0), *model_inputs(example, "timesformer")
    )
    plain = evaluate(model, variables, mk(None))
    mesh = make_mesh(jax.devices())
    dp = evaluate(model, variables, mk(mesh), mesh=mesh)
    assert plain["n_videos"] == dp["n_videos"] == 6
    for key in ("accuracy", "f1", "positive", "negative"):
        assert plain[key] == dp[key], key
    np.testing.assert_allclose(dp["loss"], plain["loss"], rtol=1e-5)
    assert dp.get("per_method_errors") == plain.get("per_method_errors")


@pytest.mark.slow
def test_conv_timesformer_train_and_eval(faces_dir, tmp_path):
    """--model 3 extension: the ConvolutionalTimeSformer trains a step and
    evaluates through the shared machinery (the reference ships the model
    but never wires it, convolutional_timesformer_base.py:144-240)."""
    from mintime_tpu.evaluate import evaluate
    from mintime_tpu.models.conv_timesformer import ConvolutionalTimeSformer
    from mintime_tpu.parallel.mesh import shard_batch
    from mintime_tpu.train import jit_steps

    cfg_m = ModelConfig(
        image_size=32, num_frames=8, num_patches=1, channels=1280,
        dim=32, depth=1, heads=2, dim_head=16, max_identities=2,
        efficient_net_block=20,
    )
    cfg = MintimeConfig(model=cfg_m, training=TrainingConfig(bs=4, val_bs=4, lr=0.05))
    mesh = make_mesh(jax.devices()[:4])
    model = ConvolutionalTimeSformer(cfg_m)
    example = next(iter(make_loader(faces_dir, "val")))
    state = create_train_state(
        jax.random.key(0), model, example, cfg, steps_per_epoch=2, num_epochs=1
    )
    with jax.set_mesh(mesh):
        train_step, _ = jit_steps(model, mesh, pos_weight=1.0)
        state, metrics = train_step(state, shard_batch(mesh, example),
                                    jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    report = evaluate(model, variables, make_loader(faces_dir, "val"))
    assert report["n_videos"] > 0 and np.isfinite(report["loss"])

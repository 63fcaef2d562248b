"""Tests for stats tools, split manifests, pretraining recipe, profiling."""

import os

import numpy as np
import pytest

from mintime_tpu.pretrain_extractor import custom_video_round, rebalance_frames
from mintime_tpu.preprocessing.split_dataset import (
    stratified_val_split,
    write_manifest,
)
from mintime_tpu.preprocessing.stats import (
    count_multi_identities,
    multi_identity_videos,
    save_folder_structure,
)
from mintime_tpu.utils.profiling import StepTimer


@pytest.fixture
def faces_tree(tmp_path):
    for v, n_ids in (("a", 1), ("b", 2), ("c", 3)):
        for k in range(n_ids):
            d = tmp_path / v / str(k)
            d.mkdir(parents=True)
            (d / "0_0.png").write_bytes(b"x")
    return tmp_path


def test_count_multi_identities(faces_tree, tmp_path):
    counts = count_multi_identities(str(faces_tree), str(tmp_path / "p" / "dist.png"))
    assert counts == {1: 1, 2: 1, 3: 1}
    assert (tmp_path / "p" / "dist.png").exists()


def test_multi_identity_videos(faces_tree):
    vids = multi_identity_videos(str(faces_tree))
    assert len(vids) == 2
    assert all(os.path.basename(v) in ("b", "c") for v in vids)


def test_save_folder_structure(faces_tree, tmp_path):
    out = tmp_path / "structure.csv"
    n = save_folder_structure(str(faces_tree), str(out))
    assert n == 6
    assert len(out.read_text().strip().splitlines()) == 6


def test_stratified_split():
    train = {0.0: [f"p{i}" for i in range(100)], 3.0: [f"f{i}" for i in range(100)]}
    tr, val = stratified_val_split(train, 0.1, seed=1)
    for cls in train:
        assert len(val[cls]) == 10
        assert len(tr[cls]) == 90
        assert not set(tr[cls]) & set(val[cls])


def test_write_manifest(tmp_path):
    path = tmp_path / "train.csv"
    write_manifest(str(path), {0.0: ["v0"], 5.0: ["v1", "v2"]})
    rows = path.read_text().strip().splitlines()
    assert "v0 0 0" in rows
    assert "v1 1 5" in rows


def test_custom_video_round():
    assert custom_video_round([0.1, 0.7, 0.2]) == 0.7
    assert custom_video_round([0.1, 0.3]) == pytest.approx(0.2)


def test_rebalance_frames():
    paths = [f"r{i}" for i in range(100)] + [f"f{i}" for i in range(100)]
    labels = [0] * 100 + [1] * 100
    p, l = rebalance_frames(paths, labels, 1.0, 0.3, seed=0)
    assert l.count(0) == 100
    assert l.count(1) == 30


def test_step_timer():
    t = StepTimer(batch_size=4)
    t.step(10)
    assert t.videos_per_sec > 0


def test_profiling_cli_smoke(capsys, tmp_path):
    """The profiler CLI runs a tiny traced forward; on the CPU backend the
    per-op table is empty and it must degrade to a note, not crash."""
    from mintime_tpu.utils import profiling

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        "model:\n  image-size: 64\n  num-frames: 8\n  num-patches: 4\n"
        "  dim: 32\n  depth: 1\n  heads: 2\n  dim-head: 16\n"
        "  max-identities: 2\n"
    )
    profiling.main([
        "--config", str(cfg_path), "--batch", "2", "--iters", "1",
        "--trace_dir", str(tmp_path / "trace"),
    ])
    out = capsys.readouterr().out
    assert "videos/s" in out

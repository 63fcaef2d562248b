"""CLI-surface smoke tests: drive the actual main() entry points end to end
on the CPU mesh with a synthetic on-disk dataset, so argument plumbing
(flags → dataset → model → loop) is covered, not just the library calls.
The real-TPU equivalents are in the verify recipe."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

SMALL_YAML = """\
training:
  bs: 4
  val-bs: 4
  lr: 0.05
  optimizer: 'SGD'
  scheduler: 'steplr'
  step-size: 1
  gamma: 0.5
  augmentation: 'min'
model:
  image-size: 32
  num-frames: 8
  max-identities: 2
  num-patches: 1
  channels: 1280
  dim: 32
  depth: 1
  heads: 2
  dim-head: 16
"""


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    faces = root / "faces"
    rng = np.random.default_rng(0)
    rows = []
    for v in range(8):
        vdir = faces / f"video_{v}"
        for ident in range(1 + v % 2):
            idir = vdir / str(ident)
            idir.mkdir(parents=True)
            for frame in range(0, 150, 30):
                img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                cv2.imwrite(str(idir / f"{frame}_0.png"), img)
        (vdir / "video_dims.json").write_text(
            '{"width": 1280, "height": 720, "fps": 30}'
        )
        rows.append(f"video_{v} {v % 2} {v % 8}")
    (root / "train.csv").write_text("\n".join(rows[:6]) + "\n")
    (root / "val.csv").write_text("\n".join(rows[6:]) + "\n")
    (root / "small.yaml").write_text(SMALL_YAML)
    return root


@pytest.mark.slow
def test_train_then_evaluate_cli(cli_env, tmp_path):
    from mintime_tpu.evaluate import main as evaluate_main
    from mintime_tpu.train_loop import main as train_main

    out = tmp_path / "models_out"
    result = train_main([
        "--config", str(cli_env / "small.yaml"),
        "--train_list_file", str(cli_env / "train.csv"),
        "--validation_list_file", str(cli_env / "val.csv"),
        "--data_path", str(cli_env / "faces"),
        "--num_epochs", "1", "--patience", "2", "--workers", "2",
        "--models_output_path", str(out),
        "--logger_name", str(tmp_path / "runs"),
        "--fused_attention", "0",  # CPU CI: interpret-mode Pallas is slow
    ])
    assert result.epochs_run >= 1 and result.checkpoints
    scalars = [
        json.loads(line)
        for line in open(tmp_path / "runs" / "scalars.jsonl")
    ]
    tags = {s["tag"] for s in scalars}
    assert {"Training/Loss", "Training/Accuracy", "Training/Learning_Rate",
            "Validation/Loss", "Validation/Accuracy"} <= tags

    report = evaluate_main([
        "--config", str(cli_env / "small.yaml"),
        "--test_list_file", str(cli_env / "val.csv"),
        "--data_path", str(cli_env / "faces"),
        "--model_weights", result.checkpoints[-1],
        "--workers", "2",
    ])
    assert report["n_videos"] == 2
    assert np.isfinite(report["loss"])


def test_predict_cli_requires_weights(cli_env, tmp_path):
    from mintime_tpu.predict import main as predict_main

    with pytest.raises(SystemExit):
        predict_main([
            "--video_path", str(cli_env / "nonexistent.mp4"),
            "--config", str(cli_env / "small.yaml"),
            "--model_weights", str(tmp_path / "nope"),
        ])

"""Training driver: epochs, validation, early stopping, checkpoints, logs.

Parity with the reference loop (``train.py:314-472``) on TPU-native
machinery: jitted SPMD train/eval steps (see :mod:`mintime_tpu.train`),
orbax full-state checkpoints saved when validation loss improves
(train.py:460-464), early stopping on ``--patience`` epochs without
improvement (train.py:310-317,453-457), per-N-step console stats with ETA
(train.py:388-391), and TensorBoard-compatible scalar logging (JSONL +
``tensorboard`` if installed; train.py:467-472 tags kept:
Training/Loss|Accuracy|Learning_Rate, Validation/Loss|Accuracy).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field

import jax
import numpy as np

from mintime_tpu.config import MintimeConfig
from mintime_tpu.train import jit_steps
from mintime_tpu.utils.checkpoint import save_train_state


@dataclass
class ScalarLogger:
    """Scalar log with the reference's TensorBoard tags (train.py:467-472).

    Writes ``scalars.jsonl`` (one ``{tag, value, step}`` object per line —
    greppable, no reader dependency) plus a real TensorBoard event file via
    the self-contained writer in :mod:`mintime_tpu.utils.tb_events`, so
    ``tensorboard --logdir`` works exactly as on the reference without
    importing torch/TF on the training host. ``MINTIME_TB=0`` disables the
    event file.
    """

    log_dir: str

    def __post_init__(self):
        os.makedirs(self.log_dir, exist_ok=True)
        self._f = open(os.path.join(self.log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if os.environ.get("MINTIME_TB", "1") != "0":
            from mintime_tpu.utils.tb_events import EventFileWriter

            self._tb = EventFileWriter(self.log_dir)

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@dataclass
class FitResult:
    best_val_loss: float
    epochs_run: int
    checkpoints: list = field(default_factory=list)


def fit(
    model,
    state,
    train_loader,
    val_loader,
    mesh,
    cfg: MintimeConfig,
    num_epochs: int = 30,
    patience: int = 5,
    pos_weight: float = 1.0,
    models_output_path: str = "models_out",
    log_dir: str = "runs/exp",
    log_every: int = 100,
    rng=None,
    starting_epoch: int = 0,
) -> tuple:
    """Run the training loop; returns (final_state, FitResult)."""
    from mintime_tpu.train import make_schedule

    from mintime_tpu.train import _donation_safe

    train_step, eval_step = jit_steps(model, mesh, pos_weight)
    logger = ScalarLogger(log_dir)
    rng = rng if rng is not None else jax.random.key(0)
    schedule = make_schedule(cfg, max(len(train_loader), 1), num_epochs)

    # Metric fetch cadence: each float(metrics[...]) is a host sync that
    # serializes dispatch on a directly-attached pod, so by default we hold
    # the per-step metric arrays and drain them once per log window (one
    # sync per log_every steps, numerics identical — the python float64
    # accumulation is unchanged, values are just fetched later). On the
    # axon remote-TPU tunnel the opposite holds: per-step fetches are what
    # keep the async queue from stalling (memory: 6s → 0.45s/step), so we
    # keep the old behavior there — same backend switch as _donation_safe.
    sync_every_step = not _donation_safe()

    not_improved = 0
    previous_loss = math.inf
    result = FitResult(best_val_loss=math.inf, epochs_run=0)

    with jax.set_mesh(mesh):
        for epoch in range(starting_epoch, num_epochs + 1):
            if not_improved == patience:  # train.py:316-317
                break
            t0 = time.time()
            tot_loss = tot_correct = tot_count = tot_pos = 0.0
            pending: list[dict] = []

            def _drain():
                nonlocal tot_loss, tot_correct, tot_count, tot_pos
                for m in pending:
                    tot_loss += float(m["loss"])
                    tot_correct += int(m["correct"])
                    tot_count += int(m["count"])
                    tot_pos += int(m["positive"])
                pending.clear()

            n_batches = len(train_loader)
            for index, batch in enumerate(train_loader):
                state, metrics = train_step(state, batch, rng)
                pending.append(metrics)
                if sync_every_step or (index + 1) % log_every == 0:
                    _drain()
                if (index + 1) % log_every == 0:
                    done = index + 1
                    eta = (time.time() - t0) / done * (n_batches - done)
                    print(
                        f"epoch {epoch} [{done}/{n_batches}] "
                        f"loss {tot_loss / done:.4f} "
                        f"acc {tot_correct / max(tot_count, 1):.4f} "
                        f"pos {int(tot_pos)} neg {int(tot_count - tot_pos)} "
                        f"ETA {eta:.0f}s"
                    )
            _drain()
            train_loss = tot_loss / max(n_batches, 1)
            train_acc = tot_correct / max(tot_count, 1)

            # validation (train.py:404-442)
            val_loss_sum = val_correct = val_count = 0.0
            for batch in val_loader:
                out = eval_step(state, batch)
                logits = np.asarray(out["logits"])
                labels = np.asarray(batch["labels"]).reshape(-1)
                if "valid" in batch:  # drop partial-batch pads (loader._shard)
                    keep = np.asarray(batch["valid"]).reshape(-1) > 0
                    logits, labels = logits[keep], labels[keep]
                val_loss_sum += float(out["loss"])
                val_correct += int(
                    ((1 / (1 + np.exp(-logits)) >= 0.5) == (labels >= 0.5)).sum()
                )
                val_count += len(labels)
            n_val = max(len(val_loader), 1)
            val_loss = val_loss_sum / n_val
            val_acc = val_correct / max(val_count, 1)

            print(
                f"epoch {epoch}: train_loss {train_loss:.4f} acc {train_acc:.4f} "
                f"| val_loss {val_loss:.4f} acc {val_acc:.4f}"
            )
            logger.add_scalar("Training/Loss", train_loss, epoch)
            logger.add_scalar("Training/Accuracy", train_acc, epoch)
            lr = schedule(int(state.step)) if callable(schedule) else schedule
            logger.add_scalar("Training/Learning_Rate", float(lr), epoch)
            logger.add_scalar("Validation/Loss", val_loss, epoch)
            logger.add_scalar("Validation/Accuracy", val_acc, epoch)

            if previous_loss <= val_loss:  # train.py:124-128
                not_improved += 1
            else:
                not_improved = 0
                result.best_val_loss = val_loss
                path = save_train_state(models_output_path, state, step=epoch)
                result.checkpoints.append(path)
            previous_loss = val_loss
            result.epochs_run = epoch + 1

    logger.close()
    return state, result


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    from mintime_tpu.config import load_config
    from mintime_tpu.data.dataset import DeepfakesDataset
    from mintime_tpu.data.loader import DataLoader
    from mintime_tpu.data.manifest import load_manifest
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.parallel.mesh import make_mesh
    from mintime_tpu.train import create_train_state, pos_weight_from_labels
    from mintime_tpu.utils.checkpoint import (
        epoch_from_name,
        latest_checkpoint,
        restore_train_state,
    )

    p = argparse.ArgumentParser("mintime-tpu train (train.py parity)")
    p.add_argument("--config", default="configs/size_invariant_timesformer.yaml")
    p.add_argument("--model", type=int, default=1,
                   help="0 baseline | 1 timesformer | 2 slowfast "
                        "(train.py:136-148) | 3 conv-timesformer (an "
                        "extension: the reference ships the model but never "
                        "wires it into a CLI)")
    p.add_argument("--extractor_model", type=int, default=0, help="0 effnet | 1 xception")
    p.add_argument("--extractor_weights", default=None)
    p.add_argument("--freeze_backbone", action="store_true", default=False)
    p.add_argument("--extractor_unfreeze_blocks", type=int, default=-1,
                   help="train only the extractor's last k blocks (train.py:152-170)")
    p.add_argument("--train_list_file", required=True)
    p.add_argument("--validation_list_file", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--video_path", default=None,
                   help="root of the original .mp4s for size buckets when no"
                        " video_dims.json sidecars exist (train.py:50)")
    p.add_argument("--num_epochs", type=int, default=30)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--resume", default="")
    p.add_argument("--random_state", type=int, default=42)
    p.add_argument("--models_output_path", default="models_out")
    p.add_argument("--logger_name", default="runs/train")
    p.add_argument("--identities_ordering", type=int, default=0)
    p.add_argument("--deepfake_methods", type=int, nargs="*", default=None,
                   help="keep only these 8_cls method ids (train.py:217-224)")
    p.add_argument("--max_videos", type=int, default=-1)
    p.add_argument("--restore_epoch", action="store_true", default=False,
                   help="parse the starting epoch out of the resume filename")
    p.add_argument("--errors_logs_file", default=None)
    p.add_argument("--fused_attention", type=int, choices=(0, 1), default=None,
                   help="route TimeSformer attention through the Pallas "
                        "kernel (fwd + custom_vjp bwd); default: on for TPU")
    opt = p.parse_args(argv)
    if opt.errors_logs_file:  # stderr redirect (train.py:96-98)
        import sys

        sys.stderr = open(opt.errors_logs_file, "w")

    cfg = load_config(opt.config)
    train_man = load_manifest(opt.train_list_file, data_path=opt.data_path,
                              deepfake_methods=opt.deepfake_methods,
                              max_videos=opt.max_videos)
    val_man = load_manifest(opt.validation_list_file, data_path=opt.data_path,
                            max_videos=opt.max_videos)
    pos_weight = pos_weight_from_labels(train_man.labels)
    print(f"Train videos: {len(train_man)} Validation videos: {len(val_man)} "
          f"pos_weight {pos_weight:.4f}")

    mk = lambda man, mode: DeepfakesDataset(
        man.videos, man.labels, data_path=opt.data_path,
        image_size=cfg.model.image_size, num_frames=cfg.model.num_frames,
        num_patches=cfg.model.num_patches, max_identities=cfg.model.max_identities,
        mode=mode, augmentation=cfg.training.augmentation,
        identities_ordering=opt.identities_ordering, seed=opt.random_state,
        video_path=opt.video_path,
    )
    # the data axis must divide both batch sizes (batches are padded to the
    # full batch size by the loader); use the largest compatible device count
    ndev = len(jax.devices())
    dp = next(k for k in range(ndev, 0, -1)
              if cfg.training.bs % k == 0 and cfg.training.val_bs % k == 0)
    if dp < ndev:
        print(f"note: using {dp}/{ndev} devices so the data axis divides "
              f"bs={cfg.training.bs} / val-bs={cfg.training.val_bs}")
    mesh = make_mesh(jax.devices()[:dp])
    train_loader = DataLoader(mk(train_man, "train"), cfg.training.bs,
                              num_workers=opt.workers, mesh=mesh, seed=opt.random_state)
    val_loader = DataLoader(mk(val_man, "val"), cfg.training.val_bs,
                            shuffle=False, num_workers=opt.workers, mesh=mesh)

    if opt.model == 2:
        from mintime_tpu.models.slowfast import SlowFastClassifier

        model = SlowFastClassifier(
            num_classes=cfg.model.num_classes, dtype=jnp.bfloat16
        )
    elif opt.model == 3:
        from mintime_tpu.models.conv_timesformer import ConvolutionalTimeSformer

        # fused kernels on TPU: the channel-token time axis (G≈1280 groups
        # of L=8 rows) runs the G-tiled token-row kernel; the wide space
        # axis (L≈1280) stays on XLA via the module's L-guard
        fused = opt.fused_attention
        if fused is None:
            fused = jax.default_backend() == "tpu"
        model = ConvolutionalTimeSformer(
            cfg.model, dtype=jnp.bfloat16, use_pallas=bool(fused)
        )
    else:
        backbone = "efficientnet-b0" if opt.extractor_model == 0 else "xception"
        head = "baseline" if opt.model == 0 else "timesformer"
        fused = opt.fused_attention
        if fused is None:  # Pallas kernels compile only on TPU (interpret on CPU)
            fused = jax.default_backend() == "tpu"
        model = MintimeVideoClassifier(
            cfg.model, backbone=backbone, head=head,
            freeze_backbone=opt.freeze_backbone, dtype=jnp.bfloat16,
            use_pallas=bool(fused) and head == "timesformer",
        )

    example = next(iter(DataLoader(mk(val_man, "val"), cfg.training.bs,
                                   shuffle=False, num_workers=1)))
    trainable_mask = None
    if opt.extractor_unfreeze_blocks > -1 and not opt.freeze_backbone:
        from mintime_tpu.train import extractor_unfreeze_mask

        trainable_mask = extractor_unfreeze_mask(opt.extractor_unfreeze_blocks)
    state = create_train_state(
        jax.random.key(opt.random_state), model, example, cfg,
        steps_per_epoch=len(train_loader), num_epochs=opt.num_epochs,
        trainable_mask=trainable_mask,
    )
    starting_epoch = 0
    resume = opt.resume or latest_checkpoint(opt.models_output_path)
    if resume and os.path.exists(resume):
        state = restore_train_state(resume, state)
        if opt.restore_epoch or not opt.resume:  # auto-resume keeps its epoch
            starting_epoch = epoch_from_name(resume) + 1
        print(f"resumed {resume} at epoch {starting_epoch}")

    state, result = fit(
        model, state, train_loader, val_loader, mesh, cfg,
        num_epochs=opt.num_epochs, patience=opt.patience, pos_weight=pos_weight,
        models_output_path=opt.models_output_path, log_dir=opt.logger_name,
        rng=jax.random.key(opt.random_state), starting_epoch=starting_epoch,
    )
    print(f"best val loss {result.best_val_loss:.4f} after {result.epochs_run} epochs")
    return result


if __name__ == "__main__":
    main()

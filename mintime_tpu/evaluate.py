"""Dataset evaluation — parity with the reference ``test.py``.

Jitted forward over the test split, then host-side metrics:
loss / F1 / accuracy / AUC / per-method error counts (test.py:271-290),
the ``--only_multiidentity`` folder-structure filter (test.py:169-184), and
optional attention bar plots (test.py:248-254).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Sequence

import numpy as np

from mintime_tpu.config import load_config
from mintime_tpu.utils.metrics import evaluation_report


def filter_multi_identity(videos: Sequence[str], data_path: str) -> list[int]:
    """Indices of videos with >1 clustered identity (test.py:169-184).
    Counts identity folders, or pack-header identities when the video was
    packed by ``pack_crops --remove_images`` (no folders left on disk)."""
    from mintime_tpu.data.crop_store import CropPack, find_pack

    keep = []
    for i, video in enumerate(videos):
        vdir = os.path.join(data_path, video)
        try:
            n_ids = sum(
                os.path.isdir(os.path.join(vdir, e)) for e in os.listdir(vdir)
            )
        except OSError:
            continue
        if n_ids == 0:
            pack = find_pack(vdir)
            if pack:
                n_ids = len(
                    {e[0] for e in CropPack(pack).entries if e[0] is not None}
                )
        if n_ids > 1:
            keep.append(i)
    return keep


def _bce_np(logits, labels, pos_weight: float = 1.0) -> float:
    """Host-side BCEWithLogitsLoss (same formula as train.bce_with_logits)
    in numpy — the per-batch eval loss shouldn't dispatch a device program
    just to average already-fetched logits."""
    x = logits.astype(np.float32).reshape(-1)
    y = labels.astype(np.float32).reshape(-1)
    softplus = np.logaddexp(0.0, -x)
    per = (1.0 - y) * x + (1.0 + (pos_weight - 1.0) * y) * softplus
    return float(per.mean())


def evaluate(
    model,
    variables,
    loader,
    pos_weight: float = 1.0,
    save_attention_plots: bool = False,
    heads: int = 8,
    num_frames: int = 16,
    num_patches: int = 49,
    mesh=None,
) -> dict:
    """Run the jitted forward over a loader, return the test.py report.

    With ``mesh`` (and a loader constructed with the same mesh), the batch
    axis shards over the mesh's ``data`` axis and the forward runs
    data-parallel across every chip — the CLI enables this automatically on
    multi-chip hosts (the reference's test.py is single-GPU, test.py:198).
    Metrics are computed on host from the gathered logits, so the report is
    identical to the single-device run.
    """
    import contextlib

    import jax

    need_attn = save_attention_plots and getattr(model, "require_attention", False)

    if mesh is not None:
        from mintime_tpu.parallel.mesh import replicated

        variables = jax.device_put(variables, replicated(mesh))

    # one jitted forward for the whole run, whatever the head's arity —
    # constructing jax.jit per batch would discard the trace cache
    fwd = jax.jit(lambda variables, *inputs: model.apply(variables, *inputs))

    ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with ctx:
        return _evaluate_loop(
            fwd, model, variables, loader, pos_weight, need_attn,
            heads, num_frames, num_patches,
        )


def _evaluate_loop(
    fwd, model, variables, loader, pos_weight, need_attn,
    heads, num_frames, num_patches,
):
    from mintime_tpu.train import model_inputs

    all_logits, all_labels, all_mc, losses = [], [], [], []
    for batch in loader:
        inputs = model_inputs(batch, model.head if hasattr(model, "head") else "timesformer")
        out = fwd(variables, *inputs)
        if need_attn:
            logits, attns = out
            _plot_batch_attention(
                batch, attns, heads, num_frames, num_patches
            )
        else:
            logits = out
        logits = np.asarray(logits).reshape(-1)
        labels = np.asarray(batch["labels"]).reshape(-1)
        if "valid" in batch:  # mesh loaders pad partial batches (loader._shard)
            real = np.asarray(batch["valid"]).reshape(-1) > 0
            logits, labels = logits[real], labels[real]
        losses.append(_bce_np(logits, labels, pos_weight))
        all_logits.append(logits)
        all_labels.append(labels)
        if "multiclass_label" in batch:
            mc_b = np.asarray(batch["multiclass_label"]).reshape(-1)
            all_mc.append(mc_b[real] if "valid" in batch else mc_b)

    logits = np.concatenate(all_logits) if all_logits else np.zeros(0)
    labels = np.concatenate(all_labels) if all_labels else np.zeros(0)
    mc = np.concatenate(all_mc) if all_mc else None
    report = evaluation_report(logits, labels, mc)
    report["loss"] = float(np.mean(losses)) if losses else float("nan")
    report["n_videos"] = int(len(labels))
    return report


def _plot_batch_attention(batch, attns, heads, num_frames, num_patches):
    from mintime_tpu.utils.attention_viz import aggregate_attentions, save_attention_plots

    tpi = batch.get("tokens_per_identity")
    vids = batch.get("video_id")
    if not tpi or not vids:
        return
    for b, (per_id, vid) in enumerate(zip(tpi, vids)):
        names = [name for name, _ in per_id]
        frames_per_identity = [int(tokens / num_patches) for _, tokens in per_id]
        batch_attns = [np.asarray(a)[b * heads : (b + 1) * heads] for a in attns]
        agg, _ = aggregate_attentions(
            batch_attns, heads, num_frames, frames_per_identity
        )
        save_attention_plots(agg, names, frames_per_identity, num_frames, vid)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser("mintime-tpu evaluate (test.py parity)")
    p.add_argument("--config", default="configs/size_invariant_timesformer.yaml")
    p.add_argument("--model_weights", required=True, help="orbax dir or torch state_dict")
    p.add_argument("--extractor_weights", default=None)
    p.add_argument("--test_list_file", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--video_path", default=None,
                   help="root of the original .mp4s for size buckets when no"
                        " video_dims.json sidecars exist (test.py:47)")
    p.add_argument("--model", type=int, default=1,
                   help="0 baseline | 1 timesformer | 2 slowfast "
                        "(test.py:121-126) | 3 conv-timesformer (extension)")
    p.add_argument("--extractor_model", type=int, default=0, help="0 effnet | 1 xception")
    p.add_argument("--only_multiidentity", action="store_true", default=False)
    p.add_argument("--save_attentions", action="store_true", default=False)
    p.add_argument("--identities_ordering", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--deepfake_methods", type=int, nargs="*", default=None,
                   help="keep only these 8_cls method ids (test.py parity)")
    p.add_argument("--max_videos", type=int, default=-1)
    p.add_argument("--random_state", type=int, default=42,
                   help="seeds per-sample RNG (identities_ordering=2) and "
                        "the shuffle-before-truncate that picks the "
                        "--max_videos subset (test.py:53,156). The shuffle "
                        "is a numpy permutation, not pandas' — metrics are "
                        "order-independent, only the random subset differs.")
    p.add_argument("--fused_attention", type=int, choices=(0, 1), default=None,
                   help="Pallas fused attention. Default mirrors train_loop: "
                        "on for TPU, off elsewhere — so eval numerics match "
                        "what training produced (bf16 kernel vs XLA differ "
                        "~1e-2 in logits). Pass 0/1 to force.")
    opt = p.parse_args(argv)

    cfg = load_config(opt.config)
    from mintime_tpu.data.loader import DataLoader
    from mintime_tpu.data.manifest import load_manifest
    from mintime_tpu.data.dataset import DeepfakesDataset
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.utils.checkpoint import load_model_variables

    man = load_manifest(opt.test_list_file, data_path=opt.data_path,
                        deepfake_methods=opt.deepfake_methods,
                        max_videos=opt.max_videos,
                        shuffle_seed=opt.random_state)
    videos, labels, mc = man.videos, man.labels, man.multiclass
    if opt.only_multiidentity:
        keep = filter_multi_identity(videos, opt.data_path)
        videos = [videos[i] for i in keep]
        labels = [labels[i] for i in keep]
        mc = [mc[i] for i in keep]

    if opt.model == 2:  # SlowFast path (test.py:121-126,255-257)
        from mintime_tpu.models.slowfast import SlowFastClassifier

        model = SlowFastClassifier(num_classes=cfg.model.num_classes,
                                   dtype=jnp.bfloat16)
    elif opt.model == 3:  # extension: the reference never wires this model
        from mintime_tpu.models.conv_timesformer import ConvolutionalTimeSformer

        fused = opt.fused_attention
        if fused is None:  # mirror train_loop: fused kernels on TPU
            fused = jax.default_backend() == "tpu"
        model = ConvolutionalTimeSformer(
            cfg.model, dtype=jnp.bfloat16, use_pallas=bool(fused)
        )
    else:
        backbone = "efficientnet-b0" if opt.extractor_model == 0 else "xception"
        head = "baseline" if opt.model == 0 else "timesformer"
        fused = opt.fused_attention
        if fused is None:  # mirror train_loop's default: Pallas on TPU
            fused = jax.default_backend() == "tpu"
        model = MintimeVideoClassifier(
            cfg.model,
            backbone=backbone,
            head=head,
            require_attention=opt.save_attentions,
            dtype=jnp.bfloat16,
            use_pallas=bool(fused) and head == "timesformer",
        )
    variables = load_model_variables(
        model, cfg, opt.model_weights, extractor_weights=opt.extractor_weights
    )

    ds = DeepfakesDataset(
        videos,
        labels,
        data_path=opt.data_path,
        image_size=cfg.model.image_size,
        num_frames=cfg.model.num_frames,
        num_patches=cfg.model.num_patches,
        max_identities=cfg.model.max_identities,
        mode="test",
        identities_ordering=opt.identities_ordering,
        multiclass_labels=mc,
        video_path=opt.video_path,
        seed=opt.random_state,
    )
    # Data-parallel over every local chip when the batch divides the mesh
    # (single-chip hosts and indivisible batches fall back to plain jit).
    # The reference's test.py evaluates on one GPU; here a pod evaluates
    # the split N× faster with the same report.
    bs = opt.batch_size or cfg.test.bs
    mesh = None
    if len(jax.devices()) > 1 and bs % len(jax.devices()) == 0:
        from mintime_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices())
    loader = DataLoader(
        ds,
        batch_size=bs,
        shuffle=False,
        num_workers=opt.workers,
        mesh=mesh,
    )
    report = evaluate(
        model,
        variables,
        loader,
        save_attention_plots=opt.save_attentions,
        heads=cfg.model.heads,
        num_frames=cfg.model.num_frames,
        num_patches=cfg.model.num_patches,
        mesh=mesh,
    )
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()

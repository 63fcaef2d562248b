"""Checkpointing: orbax full-train-state save/restore + reference converters.

Goes beyond the reference, which only ``torch.save``s bare state_dicts on
val-loss improvement and cannot restore optimizer/scheduler state
(train.py:298-304,460-464; SURVEY.md §5.4): here the whole
``TrainState`` (params, batch_stats, optimizer state, step) round-trips via
orbax, and the reference's ``Model_checkpoint*`` / ``Extractor_checkpoint*``
torch files load through :mod:`mintime_tpu.utils.torch_convert`.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_train_state(ckpt_dir: str, state, step: int | None = None) -> str:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(state.step) if step is None else step
    path = os.path.join(ckpt_dir, f"checkpoint_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": state.params,
                "batch_stats": dict(state.batch_stats),
                "opt_state": state.opt_state,
                "step": int(state.step),
            },
            force=True,
        )
    return path


def restore_train_state(path: str, state):
    """Restore into an existing (abstract or concrete) TrainState template."""
    import orbax.checkpoint as ocp

    template = {
        "params": state.params,
        "batch_stats": dict(state.batch_stats),
        "opt_state": state.opt_state,
        "step": int(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint_"):
            try:
                steps.append((int(name.split("_")[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def epoch_from_name(path: str) -> int:
    """Reference resume convention: parse epoch out of ``...checkpoint<E>``
    (train.py:298-304)."""
    base = os.path.basename(path)
    digits = "".join(c for c in base.split("checkpoint")[-1] if c.isdigit())
    return int(digits) if digits else 0


def _load_torch_state_dict(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def load_model_variables(
    model,
    cfg,
    model_weights: str,
    extractor_weights: str | None = None,
) -> dict:
    """Build apply()-ready variables from either an orbax checkpoint dir or
    reference PyTorch ``Model_checkpoint*``/``Extractor_checkpoint*`` files."""
    from mintime_tpu.utils.torch_convert import (
        efficientnet_params_from_torch,
        timesformer_params_from_torch,
        xception_params_from_torch,
    )

    if os.path.isdir(model_weights):  # orbax
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(model_weights))
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        return variables

    # torch files: head weights + optional extractor weights
    head_sd = _load_torch_state_dict(model_weights)
    if getattr(model, "head", None) == "slowfast":
        # a whole pytorchvideo slowfast_r50 net (test.py:121-126)
        from mintime_tpu.utils.torch_convert import slowfast_params_from_torch

        conv = slowfast_params_from_torch(head_sd)
        return {
            "params": {"slowfast": conv["params"]},
            "batch_stats": {"slowfast": conv["batch_stats"]},
        }
    if getattr(model, "head", None) == "baseline":
        from mintime_tpu.utils.torch_convert import baseline_params_from_torch

        head_params = baseline_params_from_torch(head_sd)
    elif getattr(model, "head", None) == "conv_timesformer":
        raise ValueError(
            "conv-timesformer has no reference checkpoint format (the "
            "reference model file is non-runnable and never saved one, "
            "PARITY.md #7) — pass an orbax checkpoint directory instead"
        )
    else:
        head_params = timesformer_params_from_torch(head_sd, cfg.model)
    params: dict = {"head": head_params}
    stats: dict = {}
    if extractor_weights:
        ext_sd = _load_torch_state_dict(extractor_weights)
        if model.backbone == "efficientnet-b0":
            ext = efficientnet_params_from_torch(ext_sd)
        else:
            ext = xception_params_from_torch(ext_sd)
        params["extractor"] = ext["params"]
        stats["extractor"] = ext["batch_stats"]
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables

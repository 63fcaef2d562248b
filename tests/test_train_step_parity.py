"""ONE full training step against the reference's torch stack.

Logit parity (tests/test_timesformer.py) proves the forward; this proves the
whole train step: BCEWithLogits-with-pos_weight loss (train.py:261,368),
backward through the divided attention / GEGLU / embeddings, and the SGD
update with coupled weight decay (train.py:186) — by running the SAME
weights and batch through the reference SizeInvariantTimeSformer +
torch.optim.SGD and through our jitted grad + optax chain, then comparing
every updated parameter in the reference's own state_dict format.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mintime_tpu.config import MintimeConfig, TrainingConfig
from mintime_tpu.models.timesformer import SizeInvariantTimeSformer
from mintime_tpu.train import bce_with_logits, make_optimizer

from tests.test_timesformer import SMALL, make_inputs

LR, WD, POS_WEIGHT = 0.05, 1e-3, 1.7


def _reference_model(cfg):
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from models.size_invariant_timesformer import (  # noqa
            SizeInvariantTimeSformer as RefModel,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    ref_cfg = {"model": {k.replace("_", "-"): v for k, v in cfg.__dict__.items()}}
    ref_cfg["model"].setdefault("patch-size", 7)
    ref_cfg["model"].setdefault("shift-tokens", False)
    torch.manual_seed(0)
    return RefModel(config=ref_cfg, require_attention=False), torch


def _torch_opt(name, params, torch):
    if name == "SGD":  # train.py:186 — no momentum
        return torch.optim.SGD(params, lr=LR, weight_decay=WD)
    if name == "AdamW":
        return torch.optim.AdamW(params, lr=LR, weight_decay=WD)
    return torch.optim.Adam(params, lr=LR, weight_decay=WD)


@pytest.mark.parametrize("optimizer", ["SGD", "Adam", "AdamW"])
def test_one_train_step_matches_reference(optimizer):
    cfg = SMALL
    ref, torch = _reference_model(cfg)
    ref.train()  # all dropouts are p=0 in SMALL; train mode is still honest

    from mintime_tpu.utils.torch_convert import (
        timesformer_params_from_torch,
        timesformer_params_to_torch,
    )

    x, mask, id_mask, size_emb, positions = make_inputs(cfg)
    labels = np.array([0.0, 1.0], np.float32)

    # ---- torch side: forward, loss, backward, optimizer step
    # (train.py:185-191, 261, 364-377: loss computed on cpu,
    # optimizer.step once per batch)
    loss_fn = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([POS_WEIGHT]))
    opt = _torch_opt(optimizer, ref.parameters(), torch)
    y_pred = ref(
        torch.tensor(np.moveaxis(x, -1, 2)),  # B F h w C -> B F C h w
        mask=torch.tensor(mask),
        identities_mask=torch.tensor(id_mask),
        size_embedding=torch.tensor(size_emb),
        positions=torch.tensor(positions.astype(np.int64)),
    )
    t_loss = loss_fn(y_pred, torch.tensor(labels)[:, None])
    opt.zero_grad()
    t_loss.backward()
    opt.step()

    # ---- our side: same initial weights via the converter, jitted
    # loss+grad, the same optax SGD chain
    torch.manual_seed(0)
    ref0, _ = _reference_model(cfg)  # fresh copy of the INITIAL weights
    params = timesformer_params_from_torch(ref0.state_dict(), cfg)
    model = SizeInvariantTimeSformer(cfg, require_attention=False)

    def loss_fn_jax(p):
        logits = model.apply(
            {"params": p}, jnp.asarray(x), jnp.asarray(mask),
            jnp.asarray(id_mask), jnp.asarray(size_emb),
            jnp.asarray(positions),
        )
        return bce_with_logits(logits, jnp.asarray(labels), POS_WEIGHT)

    j_loss, grads = jax.jit(jax.value_and_grad(loss_fn_jax))(params)
    tx = make_optimizer(
        MintimeConfig(training=TrainingConfig(
            lr=LR, weight_decay=WD, optimizer=optimizer, scheduler="none",
        )),
        LR,
    )
    updates, _ = tx.update(grads, tx.init(params), params)
    params = optax.apply_updates(params, updates)

    # losses agree
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=2e-5)

    # every updated parameter agrees, compared in the reference's own
    # state_dict format (the exporter pads the oversized embedding tables
    # with their ORIGINAL torch rows, which torch SGD also never updates:
    # their grad is None-free but zero, and coupled wd rides the gradient
    # only in our sliced rows — so compare just the rows our tables carry
    # by converting the torch result INTO our format instead)
    got = jax.tree.map(np.asarray, params)
    want = timesformer_params_from_torch(ref.state_dict(), cfg)
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    want_map = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_got) > 10
    # Adam/AdamW normalize the first step by sqrt(v) = |g|, so elements
    # whose gradient sits at fp32-noise scale get an O(lr) update whose
    # SIGN depends on accumulation order — a handful per 10^4 elements land
    # up to ~lr/100 apart. SGD has no such amplification, so it gets a
    # strict elementwise check; the adaptive optimizers get a strict check
    # on ≥99.9% of elements plus a global bound (a formula bug — wrong
    # eps, bias correction, or decoupling — shifts EVERY element by O(lr)).
    for path, leaf in flat_got:
        leaf = np.asarray(leaf)
        ref_leaf = np.asarray(want_map[path])
        name = f"param {jax.tree_util.keystr(path)}"
        if optimizer == "SGD":
            np.testing.assert_allclose(
                leaf, ref_leaf, rtol=5e-4, atol=5e-6, err_msg=name
            )
        else:
            close = np.isclose(leaf, ref_leaf, rtol=5e-4, atol=2e-5)
            assert close.mean() > 0.999, (
                f"{name}: {(~close).sum()}/{close.size} elements beyond the "
                "strict tolerance"
            )
            assert np.abs(leaf - ref_leaf).max() < LR / 10, name

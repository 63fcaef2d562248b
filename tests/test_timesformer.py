"""SizeInvariantTimeSformer tests: shapes, mask semantics, and fp32 numerics
parity against the PyTorch reference implementation."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mintime_tpu.config import ModelConfig
from mintime_tpu.data import IdentityFaces, build_sequence_plan
from mintime_tpu.models.timesformer import SizeInvariantTimeSformer

SMALL = ModelConfig(
    num_frames=8,
    num_patches=4,  # 2x2 feature grid
    channels=12,
    dim=32,
    depth=2,
    heads=2,
    dim_head=16,
    max_identities=2,
)


def make_inputs(cfg: ModelConfig, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    F, n = cfg.num_frames, cfg.num_patches
    h = w = int(np.sqrt(n))
    x = rng.standard_normal((batch, F, h, w, cfg.channels)).astype(np.float32)
    plans = []
    for b in range(batch):
        ids = [
            IdentityFaces("id0", frames=list(range(0, 90, 30)), mean_side=100),
            IdentityFaces("id1", frames=list(range(0, 300, 30)), mean_side=50),
        ]
        plans.append(build_sequence_plan(ids, F, n, max_identities=2, parity=b))
    mask = np.stack([p.mask for p in plans])
    id_mask = np.stack([p.identities_mask for p in plans])
    positions = np.stack([p.positions for p in plans]).astype(np.int32)
    size_emb = rng.integers(1, 21, size=(batch, F)).astype(np.int32)
    size_emb[~mask] = 0
    return x, mask, id_mask, size_emb, positions


def init_params(model, *args):
    """jit the init: eager dispatch is very slow on the 1-core CI host."""
    return jax.jit(model.init)(jax.random.key(0), *args)


class TestForward:
    def test_shapes_and_jit(self):
        cfg = SMALL
        x, mask, id_mask, size_emb, positions = make_inputs(cfg)
        model = SizeInvariantTimeSformer(cfg)
        params = init_params(model, x, mask, id_mask, size_emb, positions)
        fwd = jax.jit(model.apply)
        logits = fwd(params, x, mask, id_mask, size_emb, positions)
        assert logits.shape == (2, 1)
        assert np.isfinite(np.asarray(logits)).all()

    def test_attention_outputs(self):
        cfg = SMALL
        x, mask, id_mask, size_emb, positions = make_inputs(cfg)
        model = SizeInvariantTimeSformer(cfg, require_attention=True)
        params = init_params(model, x, mask, id_mask, size_emb, positions)
        logits, (space_attn, time_attn) = jax.jit(model.apply)(
            params, x, mask, id_mask, size_emb, positions
        )
        N = 1 + cfg.num_frames * cfg.num_patches
        assert space_attn.shape == (2 * cfg.heads, 1, N)
        assert time_attn.shape == (2 * cfg.heads, 1, N)
        np.testing.assert_allclose(np.asarray(space_attn).sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(time_attn).sum(-1), 1.0, rtol=1e-5)

    def test_pad_frames_do_not_affect_logit(self):
        """Masked (dummy) frames must be invisible to the video logit:
        excluded as CLS keys and as time-attention keys, and spatially
        isolated within their own frame."""
        cfg = SMALL
        x, _, _, size_emb, positions = make_inputs(cfg, batch=1, seed=1)
        # Force padding: one identity with only 3 real faces out of F=8.
        plan = build_sequence_plan(
            [IdentityFaces("id0", frames=[0, 30, 60], mean_side=100)],
            cfg.num_frames,
            cfg.num_patches,
        )
        mask = plan.mask[None]
        id_mask = plan.identities_mask[None]
        positions = plan.positions[None].astype(np.int32)
        size_emb = size_emb.copy()
        size_emb[~mask] = 0
        assert not mask.all(), "test needs at least one padded slot"
        model = SizeInvariantTimeSformer(cfg)
        params = init_params(model, x, mask, id_mask, size_emb, positions)
        fwd = jax.jit(model.apply)
        out1 = fwd(params, x, mask, id_mask, size_emb, positions)
        x2 = x.copy()
        x2[0, ~mask[0]] = 123.0  # scribble over every padded frame
        out2 = fwd(params, x2, mask, id_mask, size_emb, positions)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0.0)

    def test_identity_attention_flag(self):
        """With identity attention off, the identities_mask must not matter."""
        cfg_off = SMALL.__class__(**{**SMALL.__dict__, "enable_identity_attention": False})
        x, mask, id_mask, size_emb, positions = make_inputs(cfg_off)
        model = SizeInvariantTimeSformer(cfg_off)
        params = init_params(model, x, mask, id_mask, size_emb, positions)
        fwd = jax.jit(model.apply)
        out1 = fwd(params, x, mask, id_mask, size_emb, positions)
        id_mask2 = np.zeros_like(id_mask)  # degenerate mask, should be ignored
        out2 = fwd(params, x, mask, id_mask2, size_emb, positions)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_bf16_activations(self):
        cfg = SMALL
        x, mask, id_mask, size_emb, positions = make_inputs(cfg)
        model = SizeInvariantTimeSformer(cfg)
        params = init_params(model, x, mask, id_mask, size_emb, positions)
        fwd = jax.jit(model.apply)
        out32 = fwd(params, x, mask, id_mask, size_emb, positions)
        out16 = fwd(
            params, x.astype(jnp.bfloat16), mask, id_mask, size_emb, positions
        )
        np.testing.assert_allclose(
            np.asarray(out32), np.asarray(out16, dtype=np.float32), atol=0.15
        )


@pytest.mark.parity
class TestTorchParity:
    """fp32 logit parity with the reference PyTorch model (weights copied)."""

    def _reference_model(self, cfg: ModelConfig):
        torch = pytest.importorskip("torch")
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from models.size_invariant_timesformer import (  # noqa
                SizeInvariantTimeSformer as RefModel,
            )
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference import failed: {e}")
        ref_cfg = {"model": {
            k.replace("_", "-"): v for k, v in cfg.__dict__.items()
        }}
        # keys the reference constructor reads but never uses downstream
        # (size_invariant_timesformer.py:161,170) — dropped from our typed
        # config as dead knobs, so inject placeholders for the torch side
        ref_cfg["model"].setdefault("patch-size", 7)
        ref_cfg["model"].setdefault("shift-tokens", False)
        if ref_cfg["model"]["shift-tokens"]:
            # the reference's wiring line reads the bare name ``num_frames``
            # (size_invariant_timesformer.py:189) — a NameError, only
            # ``self.num_frames`` exists — so shift-tokens: True crashes it.
            # Inject the intended value as a module global so the bare name
            # resolves and the reference's own PreTokenShift runs (PARITY #8).
            import models.size_invariant_timesformer as ref_mod

            ref_mod.num_frames = cfg.num_frames
        torch.manual_seed(0)
        return RefModel(config=ref_cfg, require_attention=True), torch

    def test_logits_match_reference(self):
        cfg = SMALL
        ref, torch = self._reference_model(cfg)
        ref.eval()

        from mintime_tpu.utils.torch_convert import timesformer_params_from_torch

        params = {"params": timesformer_params_from_torch(ref.state_dict(), cfg)}
        x, mask, id_mask, size_emb, positions = make_inputs(cfg)

        model = SizeInvariantTimeSformer(cfg, require_attention=True)
        logits, (space_a, time_a) = jax.jit(model.apply)(
            params, x, mask, id_mask, size_emb, positions
        )

        with torch.no_grad():
            t_logits, t_attn = ref(
                torch.tensor(np.moveaxis(x, -1, 2)),  # B F h w C -> B F C h w
                mask=torch.tensor(mask),
                identities_mask=torch.tensor(id_mask),
                size_embedding=torch.tensor(size_emb),
                positions=torch.tensor(positions.astype(np.int64)),
            )
        # attention maps agree to ~3e-6; the logit picks up fp32
        # accumulation-order noise amplified by the final LayerNorm on this
        # tiny dim-32 test model (verified depth-independent: 8.8e-5 @d1,
        # 1.7e-4 @d2, 5.6e-5 @d4), so the logit tolerance is looser.
        np.testing.assert_allclose(
            np.asarray(logits), t_logits.numpy(), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(space_a), t_attn[0].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(time_a), t_attn[1].numpy(), rtol=1e-4, atol=1e-5
        )

    def test_shift_tokens_matches_reference(self):
        """shift-tokens (PreTokenShift) fp32 parity — against the reference's
        own PreTokenShift modules, reachable only after patching the
        reference's ``num_frames`` NameError (see _reference_model)."""
        cfg = ModelConfig(**{**SMALL.__dict__, "shift_tokens": True})
        ref, torch = self._reference_model(cfg)
        ref.eval()

        from mintime_tpu.utils.torch_convert import timesformer_params_from_torch

        # PreNorm(PreTokenShift(fn)) inserts one extra parameterless ``.fn``
        # level into the torch keys; strip it so the converter's layout holds
        sd = {k.replace(".fn.fn.", ".fn."): v for k, v in ref.state_dict().items()}
        params = {"params": timesformer_params_from_torch(sd, cfg)}
        x, mask, id_mask, size_emb, positions = make_inputs(cfg)

        model = SizeInvariantTimeSformer(cfg, require_attention=True)
        logits, (space_a, time_a) = jax.jit(model.apply)(
            params, x, mask, id_mask, size_emb, positions
        )
        with torch.no_grad():
            t_logits, t_attn = ref(
                torch.tensor(np.moveaxis(x, -1, 2)),
                mask=torch.tensor(mask),
                identities_mask=torch.tensor(id_mask),
                size_embedding=torch.tensor(size_emb),
                positions=torch.tensor(positions.astype(np.int64)),
            )
        np.testing.assert_allclose(
            np.asarray(logits), t_logits.numpy(), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(space_a), t_attn[0].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(time_a), t_attn[1].numpy(), rtol=1e-4, atol=1e-5
        )


def test_pre_token_shift_semantics():
    """pre_token_shift: chunk 0 pulls from frame f+1, chunk 1 is identity,
    chunk 2 from frame f-1, remainder untouched; vacated frames are zero."""
    from mintime_tpu.models.timesformer import pre_token_shift

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 3, 8)).astype(np.float32)  # dc = 2
    y = np.asarray(pre_token_shift(jnp.asarray(x)))
    np.testing.assert_array_equal(y[:, :3, :, 0:2], x[:, 1:, :, 0:2])
    assert (y[:, 3, :, 0:2] == 0).all()
    np.testing.assert_array_equal(y[..., 2:4], x[..., 2:4])
    np.testing.assert_array_equal(y[:, 1:, :, 4:6], x[:, :3, :, 4:6])
    assert (y[:, 0, :, 4:6] == 0).all()
    np.testing.assert_array_equal(y[..., 6:8], x[..., 6:8])


def test_torch_export_roundtrip():
    """params → reference state_dict → params is the identity."""
    from mintime_tpu.utils.torch_convert import (
        timesformer_params_from_torch,
        timesformer_params_to_torch,
    )

    cfg = SMALL
    x, mask, id_mask, size_emb, positions = make_inputs(cfg)
    model = SizeInvariantTimeSformer(cfg)
    params = init_params(model, x, mask, id_mask, size_emb, positions)["params"]
    sd = timesformer_params_to_torch(params, cfg)
    back = timesformer_params_from_torch(sd, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    keys_a = {tuple(str(k) for k in p) for p, _ in flat_a}
    keys_b = {tuple(str(k) for k in p) for p, _ in flat_b}
    assert keys_a == keys_b
    b_by_key = {tuple(str(k) for k in p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(b_by_key[tuple(str(k) for k in p)]),
            err_msg=str(p),
        )


def test_efficientnet_export_roundtrip():
    from mintime_tpu.models.efficientnet import EfficientNet
    from mintime_tpu.utils.torch_convert import (
        efficientnet_params_from_torch,
        efficientnet_params_to_torch,
    )

    bb = EfficientNet("efficientnet-b0")
    variables = jax.jit(bb.init, static_argnames=("train",))(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    sd = efficientnet_params_to_torch(variables)
    back = efficientnet_params_from_torch(sd)
    for coll in ("params", "batch_stats"):
        flat_a = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        b_flat = {tuple(str(k) for k in p): v
                  for p, v in jax.tree_util.tree_flatten_with_path(back[coll])[0]}
        assert len(flat_a) == len(b_flat)
        for p, v in flat_a:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(b_flat[tuple(str(k) for k in p)]),
                err_msg=str(p),
            )


def test_xception_to_torch_roundtrip():
    from mintime_tpu.models.xception import Xception
    from mintime_tpu.utils.torch_convert import (
        xception_params_from_torch,
        xception_params_to_torch,
    )

    bb = Xception()
    variables = jax.jit(bb.init, static_argnames=("train",))(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    sd = xception_params_to_torch(variables)
    back = xception_params_from_torch(sd)
    for coll in ("params", "batch_stats"):
        flat_a = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        b_flat = {tuple(str(k) for k in p): v
                  for p, v in jax.tree_util.tree_flatten_with_path(back[coll])[0]}
        assert len(flat_a) == len(b_flat)
        for p, v in flat_a:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(b_flat[tuple(str(k) for k in p)]),
                err_msg=str(p),
            )


def test_baseline_converter_roundtrip_and_torch_parity():
    """Baseline head: reference state_dict → flax params parity + roundtrip."""
    torch = pytest.importorskip("torch")
    import sys

    from mintime_tpu.models.baseline import Baseline
    from mintime_tpu.utils.torch_convert import (
        baseline_params_from_torch,
        baseline_params_to_torch,
    )

    import os

    # the reference baseline.py imports pip packages absent here; the golden
    # harness shims satisfy them (tests/ref_shims)
    shim_dir = os.path.join(os.path.dirname(__file__), "ref_shims")
    for p in (shim_dir, "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    cfg = ModelConfig(dim=32, mlp_dim=16, num_classes=1, num_frames=8,
                      num_patches=1, channels=32)
    try:
        from models.baseline import Baseline as RefBaseline  # noqa
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    ref = RefBaseline(config={"model": {"dim": 32, "mlp-dim": 16,
                                        "num-classes": 1}})
    params = baseline_params_from_torch(ref.state_dict())
    x = np.random.default_rng(0).standard_normal((3, 4, 4, 32)).astype(np.float32)
    ours = Baseline(cfg).apply({"params": params}, x)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)
    back = baseline_params_from_torch(baseline_params_to_torch(params))
    for k in ("mlp_0", "mlp_1"):
        np.testing.assert_array_equal(params[k]["kernel"], back[k]["kernel"])

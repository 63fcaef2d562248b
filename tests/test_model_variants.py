"""SlowFast + ConvolutionalTimeSformer structural tests."""

import jax
import numpy as np
import pytest

from mintime_tpu.config import ModelConfig
from mintime_tpu.models.conv_timesformer import ConvolutionalTimeSformer
from mintime_tpu.models.slowfast import (
    SlowFastR50,
    center_crop,
    short_side_scale,
    slowfast_input_pack,
    uniform_temporal_subsample,
)


class TestSlowFastTransforms:
    def test_uniform_subsample(self):
        frames = np.arange(10)[:, None, None, None] * np.ones((1, 2, 2, 3))
        out = uniform_temporal_subsample(frames, 5)
        # pytorchvideo .long() truncation: linspace(0,9,5)=[0,2.25,4.5,6.75,9]
        np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 2, 4, 6, 9])

    def test_short_side_scale(self):
        frames = np.zeros((2, 100, 200, 3), np.float32)
        out = short_side_scale(frames, 50)
        assert out.shape == (2, 50, 100, 3)

    def test_center_crop(self):
        frames = np.zeros((2, 60, 80, 3))
        assert center_crop(frames, 50).shape == (2, 50, 50, 3)

    def test_pack_pathways(self):
        frames = np.zeros((40, 64, 80, 3), np.uint8)
        slow, fast = slowfast_input_pack(frames, num_frames=32, crop_size=56, side_size=56)
        assert fast.shape == (1, 32, 56, 56, 3)
        assert slow.shape == (1, 8, 56, 56, 3)


@pytest.mark.slow
class TestSlowFastModel:
    def test_forward_shapes(self):
        model = SlowFastR50(num_classes=1)
        slow = np.zeros((1, 4, 32, 32, 3), np.float32)
        fast = np.zeros((1, 16, 32, 32, 3), np.float32)
        variables = jax.jit(model.init)(jax.random.key(0), slow, fast)
        out = jax.jit(lambda v, s, f: model.apply(v, s, f))(variables, slow, fast)
        assert out.shape == (1, 1)
        assert np.isfinite(np.asarray(out)).all()
        # head concat dim is 2304 = 2048 + 256
        assert variables["params"]["proj"]["kernel"].shape == (2304, 1)


@pytest.mark.slow
class TestConvTimeSformer:
    def test_forward(self):
        cfg = ModelConfig(
            num_frames=8,
            num_patches=1280,
            channels=1280,
            dim=64,
            depth=1,
            heads=2,
            dim_head=32,
            efficient_net_block=20,
        )
        model = ConvolutionalTimeSformer(cfg)
        frames = np.zeros((1, 8, 32, 32, 3), np.float32)
        size_emb = np.ones((1, 8), np.int32)
        variables = jax.jit(model.init)(jax.random.key(0), frames, None, size_emb)
        out = jax.jit(lambda v, f, s: model.apply(v, f, None, s))(
            variables, frames, size_emb
        )
        assert out.shape == (1, 1)
        assert np.isfinite(np.asarray(out)).all()


def synthetic_slowfast_state_dict(num_classes=400, rng=None):
    """A pytorchvideo-slowfast_r50-shaped state dict, with shapes derived
    from the architecture table (Feichtenhofer et al. / pytorchvideo
    defaults), NOT from our Flax tree — so the conversion test validates our
    model's channel plumbing (fuse concat widths, bottleneck inners,
    temporal kernels) against the external checkpoint schema."""
    import torch

    rng = rng or np.random.default_rng(0)
    sd = {}

    def convbn(prefix_conv, prefix_norm, out, inp, t, h, w):
        sd[f"{prefix_conv}.weight"] = torch.from_numpy(
            rng.standard_normal((out, inp, t, h, w)).astype(np.float32) * 0.05
        )
        sd[f"{prefix_norm}.weight"] = torch.ones(out)
        sd[f"{prefix_norm}.bias"] = torch.zeros(out)
        sd[f"{prefix_norm}.running_mean"] = torch.zeros(out)
        sd[f"{prefix_norm}.running_var"] = torch.ones(out)
        sd[f"{prefix_norm}.num_batches_tracked"] = torch.tensor(0)

    # stems + stem fusion
    convbn("blocks.0.multipathway_blocks.0.conv",
           "blocks.0.multipathway_blocks.0.norm", 64, 3, 1, 7, 7)
    convbn("blocks.0.multipathway_blocks.1.conv",
           "blocks.0.multipathway_blocks.1.norm", 8, 3, 5, 7, 7)
    convbn("blocks.0.multipathway_fusion.conv_fast_to_slow",
           "blocks.0.multipathway_fusion.norm", 16, 8, 7, 1, 1)

    # (blocks, slow_inner, slow_out, fast_inner, fast_out, slow_temporal)
    stages = ((3, 64, 256, 8, 32, 1), (4, 128, 512, 16, 64, 1),
              (6, 256, 1024, 32, 128, 3), (3, 512, 2048, 64, 256, 3))
    slow_in, fast_in = 64 + 16, 8  # post-stem-fusion widths
    for idx, (blocks, s_in_ch, s_out, f_in_ch, f_out, s_t) in enumerate(stages):
        tb = idx + 1
        for p, inner, out, cin, ta in (
            (0, s_in_ch, s_out, slow_in, s_t),
            (1, f_in_ch, f_out, fast_in, 3),
        ):
            for j in range(blocks):
                base = f"blocks.{tb}.multipathway_blocks.{p}.res_blocks.{j}"
                inp = cin if j == 0 else out
                convbn(f"{base}.branch2.conv_a", f"{base}.branch2.norm_a",
                       inner, inp, ta, 1, 1)
                convbn(f"{base}.branch2.conv_b", f"{base}.branch2.norm_b",
                       inner, inner, 1, 3, 3)
                convbn(f"{base}.branch2.conv_c", f"{base}.branch2.norm_c",
                       out, inner, 1, 1, 1)
                if j == 0:
                    convbn(f"{base}.branch1_conv", f"{base}.branch1_norm",
                           out, inp, 1, 1, 1)
        if idx < 3:
            convbn(f"blocks.{tb}.multipathway_fusion.conv_fast_to_slow",
                   f"blocks.{tb}.multipathway_fusion.norm",
                   2 * f_out, f_out, 7, 1, 1)
            slow_in = s_out + 2 * f_out
        fast_in = f_out

    sd["blocks.5.proj.weight"] = torch.from_numpy(
        rng.standard_normal((num_classes, 2304)).astype(np.float32) * 0.02
    )
    sd["blocks.5.proj.bias"] = torch.zeros(num_classes)
    return sd


@pytest.mark.parity
class TestSlowFastConverter:
    def test_structure_matches_flax_init(self):
        """Every pytorchvideo key consumed; converted tree identical in
        structure AND shape to SlowFastR50.init — i.e. our body reproduces
        the external checkpoint layout exactly."""
        pytest.importorskip("torch")
        from mintime_tpu.models.slowfast import SlowFastR50
        from mintime_tpu.utils.torch_convert import slowfast_params_from_torch

        sd = synthetic_slowfast_state_dict(num_classes=1)
        conv = slowfast_params_from_torch(sd)

        model = SlowFastR50(num_classes=1)
        slow = np.zeros((1, 2, 64, 64, 3), np.float32)
        fast = np.zeros((1, 8, 64, 64, 3), np.float32)
        ref = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), slow, fast, train=False
        )
        for coll in ("params", "batch_stats"):
            flat_ref = jax.tree_util.tree_flatten_with_path(ref[coll])[0]
            flat_conv = {
                tuple(str(k) for k in p): v
                for p, v in jax.tree_util.tree_flatten_with_path(conv[coll])[0]
            }
            assert {tuple(str(k) for k in p) for p, _ in flat_ref} == set(
                flat_conv
            ), f"{coll} key sets differ"
            for p, v in flat_ref:
                key = tuple(str(k) for k in p)
                assert v.shape == flat_conv[key].shape, f"{coll}/{key}"

    def test_unknown_keys_raise(self):
        pytest.importorskip("torch")
        import torch

        from mintime_tpu.utils.torch_convert import slowfast_params_from_torch

        sd = synthetic_slowfast_state_dict(num_classes=1)
        sd["blocks.9.bogus.weight"] = torch.zeros(1)
        with pytest.raises((ValueError, KeyError)):
            slowfast_params_from_torch(sd)

    @pytest.mark.slow
    def test_converted_forward_and_classifier_load(self, tmp_path):
        """Converted weights run through SlowFastR50 AND load into the
        train/eval wrapper via load_model_variables (test.py:255-257)."""
        torch = pytest.importorskip("torch")
        from mintime_tpu.config import MintimeConfig, ModelConfig
        from mintime_tpu.models.slowfast import SlowFastClassifier, SlowFastR50
        from mintime_tpu.utils.checkpoint import load_model_variables
        from mintime_tpu.utils.torch_convert import slowfast_params_from_torch

        sd = synthetic_slowfast_state_dict(num_classes=1)
        conv = slowfast_params_from_torch(sd)
        model = SlowFastR50(num_classes=1)
        slow = np.full((1, 2, 64, 64, 3), 0.1, np.float32)
        fast = np.full((1, 8, 64, 64, 3), 0.1, np.float32)
        out = jax.jit(model.apply, static_argnames=("train",))(
            conv, slow, fast, train=False
        )
        assert out.shape == (1, 1) and np.isfinite(np.asarray(out)).all()

        path = tmp_path / "slowfast_ckpt"
        torch.save(sd, str(path))
        clf = SlowFastClassifier(num_classes=1, num_frames=8)
        cfg = MintimeConfig(model=ModelConfig())
        variables = load_model_variables(clf, cfg, str(path))
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 8, 64, 64, 3)
        ).astype(np.float32)
        logits = jax.jit(clf.apply, static_argnames=("train",))(
            variables, frames, train=False
        )
        assert logits.shape == (1, 1) and np.isfinite(np.asarray(logits)).all()

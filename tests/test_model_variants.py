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
        np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 2, 4, 7, 9])

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

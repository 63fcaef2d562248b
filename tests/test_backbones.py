"""Backbone tests: shapes, block tap, and fp32 parity with the PyTorch
reference implementations (EfficientNet-B0, Xception)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mintime_tpu.models.baseline import Baseline, video_logits
from mintime_tpu.models.efficientnet import EfficientNet, expand_blocks, round_filters
from mintime_tpu.models.xception import Xception
from mintime_tpu.config import ModelConfig


class TestEfficientNetStructure:
    def test_b0_has_16_blocks(self):
        assert len(expand_blocks("efficientnet-b0")) == 16

    def test_round_filters(self):
        # reference utils.py round_filters behavior
        assert round_filters(32, 1.0) == 32
        assert round_filters(32, 1.1) == 32  # 35.2 → 32; 32 >= 0.9*35.2 keeps 32
        assert round_filters(40, 1.1) == 48  # 44 → nearest multiple of 8 is 48
        assert round_filters(1280, 1.0) == 1280

    def test_feature_shape_b0(self):
        model = EfficientNet("efficientnet-b0")
        x = jnp.zeros((1, 224, 224, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        y = jax.jit(lambda v, x: model.apply(v, x))(vars_, x)
        assert y.shape == (1, 7, 7, 1280)

    def test_tap_block(self):
        # tap at block 20 >= 16 → full head features (model.py:301-325)
        model = EfficientNet("efficientnet-b0", tap_block=20)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        y = jax.jit(lambda v, x: model.apply(v, x))(vars_, x)
        assert y.shape == (1, 2, 2, 1280)
        # tap at block 10 → early exit, no head conv
        model = EfficientNet("efficientnet-b0", tap_block=10)
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        y = jax.jit(lambda v, x: model.apply(v, x))(vars_, x)
        assert y.shape[-1] != 1280


class TestBaseline:
    def test_video_logit_mean(self):
        cfg = ModelConfig(dim=1280, mlp_dim=512)
        model = Baseline(cfg)
        feats = jnp.ones((4 * 16, 7, 7, 1280))
        params = jax.jit(model.init)(jax.random.key(0), feats)
        face = jax.jit(model.apply)(params, feats)
        assert face.shape == (64, 1)
        vid = video_logits(face, 4, 16)
        assert vid.shape == (4, 1)
        np.testing.assert_allclose(np.asarray(vid), np.asarray(face[0, 0]), rtol=1e-6)


@pytest.mark.parity
@pytest.mark.slow
class TestBackboneParity:
    def _torch(self):
        torch = pytest.importorskip("torch")
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        return torch

    def test_efficientnet_b0_matches_reference(self):
        torch = self._torch()
        from models.efficientnet.efficientnet_pytorch import EfficientNet as RefEff

        ref = RefEff.from_name("efficientnet-b0").eval()
        from mintime_tpu.utils.torch_convert import efficientnet_params_from_torch

        variables = efficientnet_params_from_torch(ref.state_dict())
        x = np.random.default_rng(0).standard_normal((2, 96, 96, 3)).astype(np.float32)
        model = EfficientNet("efficientnet-b0")
        y = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        with torch.no_grad():
            t = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y), t.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )

    def test_xception_matches_reference(self):
        torch = self._torch()
        import importlib

        ref_mod = importlib.import_module("models.xception")
        ref = ref_mod.Xception(num_classes=1).eval()
        from mintime_tpu.utils.torch_convert import xception_params_from_torch

        variables = xception_params_from_torch(ref.state_dict())
        x = np.random.default_rng(1).standard_normal((1, 96, 96, 3)).astype(np.float32)
        model = Xception()
        y = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        with torch.no_grad():
            t = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y), t.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )

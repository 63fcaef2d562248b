"""InceptionResnetV1 value-level parity: our Flax embedder + the
``facenet_params_from_torch`` converter against a torch transliteration of
facenet-pytorch's ``inception_resnet_v1.py`` graph in its exact state_dict
key schema — the converter for the REAL vggface2 weights had never seen a
real-layout state dict (the golden harness shares the Flax net on both
sides). Catches key-mapping or architecture drift the way the MTCNN oracle
caught the ONet conv3 kernel bug."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mintime_tpu.preprocessing.facenet import (
    InceptionResnetV1,
    facenet_params_from_torch,
    fixed_image_standardization,
)


class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.1)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class Block35(tnn.Module):
    def __init__(self, scale=0.17):
        super().__init__()
        self.scale = scale
        self.branch0 = BasicConv2d(256, 32, 1)
        self.branch1 = tnn.Sequential(
            BasicConv2d(256, 32, 1), BasicConv2d(32, 32, 3, padding=1)
        )
        self.branch2 = tnn.Sequential(
            BasicConv2d(256, 32, 1), BasicConv2d(32, 32, 3, padding=1),
            BasicConv2d(32, 32, 3, padding=1),
        )
        self.conv2d = tnn.Conv2d(96, 256, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)
        return F.relu(self.conv2d(out) * self.scale + x)


class Block17(tnn.Module):
    def __init__(self, scale=0.10):
        super().__init__()
        self.scale = scale
        self.branch0 = BasicConv2d(896, 128, 1)
        self.branch1 = tnn.Sequential(
            BasicConv2d(896, 128, 1),
            BasicConv2d(128, 128, (1, 7), padding=(0, 3)),
            BasicConv2d(128, 128, (7, 1), padding=(3, 0)),
        )
        self.conv2d = tnn.Conv2d(256, 896, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x)], 1)
        return F.relu(self.conv2d(out) * self.scale + x)


class Block8(tnn.Module):
    def __init__(self, scale=1.0, noReLU=False):
        super().__init__()
        self.scale = scale
        self.noReLU = noReLU
        self.branch0 = BasicConv2d(1792, 192, 1)
        self.branch1 = tnn.Sequential(
            BasicConv2d(1792, 192, 1),
            BasicConv2d(192, 192, (1, 3), padding=(0, 1)),
            BasicConv2d(192, 192, (3, 1), padding=(1, 0)),
        )
        self.conv2d = tnn.Conv2d(384, 1792, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x)], 1)
        out = self.conv2d(out) * self.scale + x
        return out if self.noReLU else F.relu(out)


class Mixed6a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = BasicConv2d(256, 384, 3, stride=2)
        self.branch1 = tnn.Sequential(
            BasicConv2d(256, 192, 1), BasicConv2d(192, 192, 3, padding=1),
            BasicConv2d(192, 256, 3, stride=2),
        )
        self.branch2 = tnn.MaxPool2d(3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)


class Mixed7a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = tnn.Sequential(
            BasicConv2d(896, 256, 1), BasicConv2d(256, 384, 3, stride=2)
        )
        self.branch1 = tnn.Sequential(
            BasicConv2d(896, 256, 1), BasicConv2d(256, 256, 3, stride=2)
        )
        self.branch2 = tnn.Sequential(
            BasicConv2d(896, 256, 1), BasicConv2d(256, 256, 3, padding=1),
            BasicConv2d(256, 256, 3, stride=2),
        )
        self.branch3 = tnn.MaxPool2d(3, stride=2)

    def forward(self, x):
        return torch.cat(
            [self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1
        )


class TorchInceptionResnetV1(tnn.Module):
    """facenet-pytorch inception_resnet_v1.py, classify=False head."""

    def __init__(self):
        super().__init__()
        self.conv2d_1a = BasicConv2d(3, 32, 3, stride=2)
        self.conv2d_2a = BasicConv2d(32, 32, 3)
        self.conv2d_2b = BasicConv2d(32, 64, 3, padding=1)
        self.maxpool_3a = tnn.MaxPool2d(3, stride=2)
        self.conv2d_3b = BasicConv2d(64, 80, 1)
        self.conv2d_4a = BasicConv2d(80, 192, 3)
        self.conv2d_4b = BasicConv2d(192, 256, 3, stride=2)
        self.repeat_1 = tnn.Sequential(*[Block35() for _ in range(5)])
        self.mixed_6a = Mixed6a()
        self.repeat_2 = tnn.Sequential(*[Block17() for _ in range(10)])
        self.mixed_7a = Mixed7a()
        self.repeat_3 = tnn.Sequential(*[Block8(scale=0.20) for _ in range(5)])
        self.block8 = Block8(noReLU=True)
        self.avgpool_1a = tnn.AdaptiveAvgPool2d(1)
        self.last_linear = tnn.Linear(1792, 512, bias=False)
        self.last_bn = tnn.BatchNorm1d(512, eps=1e-3, momentum=0.1)

    def forward(self, x):
        x = self.conv2d_1a(x)
        x = self.conv2d_2a(x)
        x = self.conv2d_2b(x)
        x = self.maxpool_3a(x)
        x = self.conv2d_3b(x)
        x = self.conv2d_4a(x)
        x = self.conv2d_4b(x)
        x = self.repeat_1(x)
        x = self.mixed_6a(x)
        x = self.repeat_2(x)
        x = self.mixed_7a(x)
        x = self.repeat_3(x)
        x = self.block8(x)
        x = self.avgpool_1a(x)
        x = self.last_linear(x.view(x.shape[0], -1))
        x = self.last_bn(x)
        return F.normalize(x, p=2, dim=1)


def _randomize_bn_stats(model, gen):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape,
                                               generator=gen) + 0.5)
                m.weight.copy_(torch.rand(m.weight.shape, generator=gen) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)


@pytest.mark.slow
def test_embedder_matches_facenet_pytorch_layout():
    torch.manual_seed(5)
    gen = torch.Generator().manual_seed(6)
    ref = TorchInceptionResnetV1().eval()
    _randomize_bn_stats(ref, gen)
    sd = ref.state_dict()
    # the real vggface2 checkpoint also carries the classify head — the
    # converter must tolerate (ignore) it
    sd["logits.weight"] = torch.zeros(8631, 512)
    sd["logits.bias"] = torch.zeros(8631)

    variables = facenet_params_from_torch(sd)

    rng = np.random.default_rng(7)
    crops = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.tensor((crops - 127.5) / 128.0).permute(0, 3, 1, 2)
        ).numpy()
    got = np.asarray(
        jax.jit(InceptionResnetV1().apply)(
            variables, fixed_image_standardization(jnp.asarray(crops))
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

"""Test-only shim for ``facenet_pytorch`` so the REFERENCE predict.py can be
imported and driven in the golden-example parity harness (the real package
is not installed and cannot be downloaded here).

``InceptionResnetV1.forward`` delegates to a test-configured hook
(:data:`EMBED_HOOK`) — the harness points it at the SAME Flax
InceptionResnetV1 our pipeline uses, so both sides see identical embeddings
for identical preprocessed faces. This keeps the embedder out of the
comparison (its published vggface2 weights are unreachable) while everything
downstream — similarity matrix, connected components, assembly, model — is
compared for real.
"""

import numpy as np
import torch

# set by the test: fn(standardized_nhwc_float_np) -> (N, 512) np.ndarray
EMBED_HOOK = None


def fixed_image_standardization(image_tensor):
    # facenet-pytorch's documented standardization: (x - 127.5) / 128.0
    return (image_tensor - 127.5) / 128.0


class InceptionResnetV1(torch.nn.Module):
    def __init__(self, pretrained=None, classify=False, device=None):
        super().__init__()
        self.pretrained = pretrained

    def forward(self, x):
        if EMBED_HOOK is None:
            raise RuntimeError("ref_shims.facenet_pytorch.EMBED_HOOK not set")
        nhwc = x.detach().cpu().permute(0, 2, 3, 1).numpy()
        return torch.from_numpy(np.asarray(EMBED_HOOK(nhwc), dtype=np.float32))


class MTCNN:
    """The harness bypasses detection (shared precomputed boxes); the real
    facenet-pytorch MTCNN weights are unreachable in this environment."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "MTCNN shim: the golden parity harness injects precomputed boxes"
        )

"""Smoke test of the day-one real-weights verification CLI
(mintime_tpu.verify_weights): every arm runs against synthetic artifacts in
the REAL formats (facenet-pytorch state_dicts, pytorchvideo schema,
reference Model/Extractor exports), so when the published files arrive the
command is known-good plumbing."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mintime_tpu.verify_weights import main as vw_main


@pytest.mark.slow
def test_verify_weights_all_arms(tmp_path, capsys):
    from tests.test_mtcnn_oracle import TorchONet, TorchPNet, TorchRNet
    from tests.test_facenet_numerics import TorchInceptionResnetV1
    from tests.test_slowfast_numerics import make_state_dict

    torch.manual_seed(0)
    # MTCNN dir
    mt = tmp_path / "mtcnn"
    mt.mkdir()
    torch.save(TorchPNet().state_dict(), mt / "pnet.pt")
    torch.save(TorchRNet().state_dict(), mt / "rnet.pt")
    torch.save(TorchONet().state_dict(), mt / "onet.pt")
    # vggface2 embedder
    fn = tmp_path / "vggface2.pt"
    torch.save(TorchInceptionResnetV1().state_dict(), fn)
    # SlowFast pytorchvideo checkpoint (wrapped like the hub file)
    sf = tmp_path / "slowfast.pyth"
    torch.save({"model_state": make_state_dict()}, sf)

    # zoo checkpoint: export from our randomly-initialized model
    import jax

    from mintime_tpu.config import ModelConfig
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from mintime_tpu.utils.torch_convert import (
        efficientnet_params_to_torch,
        timesformer_params_to_torch,
    )

    small = ModelConfig(image_size=32, num_frames=8, num_patches=1,
                        channels=1280, dim=32, depth=1, heads=2, dim_head=16,
                        max_identities=2)
    model = MintimeVideoClassifier(small, backbone="efficientnet-b0",
                                   head="timesformer", require_attention=True)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        np.zeros((1, 8, 32, 32, 3), np.float32),
        np.ones((1, 8), bool), np.ones((1, 8, 8), bool),
        np.ones((1, 8), np.int32), np.zeros((1, 9), np.int32),
    )
    ext_vars = {"params": variables["params"]["extractor"],
                "batch_stats": variables["batch_stats"]["extractor"]}
    ext_path = tmp_path / "Extractor_checkpoint"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in efficientnet_params_to_torch(ext_vars).items()},
               ext_path)
    head_path = tmp_path / "Model_checkpoint"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in timesformer_params_to_torch(
                    variables["params"]["head"], small).items()},
               head_path)
    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text(
        "training:\n  bs: 2\n  val-bs: 2\nmodel:\n  image-size: 32\n"
        "  num-frames: 8\n  num-patches: 1\n  channels: 1280\n  dim: 32\n"
        "  depth: 1\n  heads: 2\n  dim-head: 16\n  max-identities: 2\n"
    )

    rc = vw_main([
        "--mtcnn_weights", str(mt),
        "--facenet_weights", str(fn),
        "--slowfast_weights", str(sf),
        "--model_weights", str(head_path),
        "--extractor_weights", str(ext_path),
        "--config", str(cfg_path),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("[ OK ]") >= 7
    assert "all requested artifacts verified" in out

"""Config loader tests: reference YAML schema compatibility."""

import pytest

from mintime_tpu.config import MintimeConfig, config_from_dict, load_config


def test_load_preset():
    cfg = load_config("configs/size_invariant_timesformer.yaml")
    assert cfg.model.num_frames == 16
    assert cfg.model.max_identities == 2
    assert cfg.model.dim == 512
    assert cfg.model.depth == 9
    assert cfg.model.channels == 2048
    assert cfg.model.num_patches == 49
    assert cfg.model.enable_identity_attention
    assert cfg.training.optimizer == "SGD"
    assert cfg.training.scheduler == "cosinelr"
    assert cfg.model.tokens == 1 + 16 * 49


def test_reference_kebab_keys():
    cfg = config_from_dict(
        {
            "model": {"num-frames": 8, "enable-size-emb": False, "dim-head": 32},
            "training": {"weight-decay": 0.01, "val_bs": 4},
        }
    )
    assert cfg.model.num_frames == 8
    assert not cfg.model.enable_size_emb
    assert cfg.model.dim_head == 32
    assert cfg.training.weight_decay == 0.01
    assert cfg.training.val_bs == 4


def test_invalid_num_frames_rejected():
    # train.py:101-102 validates num-frames ∈ {8, 16, 32}
    with pytest.raises(ValueError):
        config_from_dict({"model": {"num-frames": 12}})


def test_defaults():
    cfg = MintimeConfig()
    assert cfg.model.heads == 8
    assert cfg.test.bs == 1


def test_roundtrip_to_reference_dict():
    cfg = load_config("configs/baseline.yaml")
    d = cfg.as_reference_dict()
    assert d["model"]["mlp-dim"] == 512
    assert d["model"]["dim"] == 1280


class TestManifestFilters:
    def _write(self, tmp_path):
        p = tmp_path / "list.csv"
        rows = ["vid_a 0 0", "vid_b 1 3", "vid_c 1 5", "vid_d 0 0", "vid_e 1 3"]
        p.write_text("\n".join(rows))
        return str(p)

    def test_deepfake_methods_keep_only(self, tmp_path):
        """train.py:217-224: rows whose 8_cls is NOT listed are dropped."""
        from mintime_tpu.data.manifest import load_manifest

        man = load_manifest(self._write(tmp_path), deepfake_methods=[0, 3])
        assert man.videos == ["vid_a", "vid_b", "vid_d", "vid_e"]

    def test_max_videos_truncates(self, tmp_path):
        from mintime_tpu.data.manifest import load_manifest

        man = load_manifest(self._write(tmp_path), max_videos=2)
        assert man.videos == ["vid_a", "vid_b"]
        assert len(man.labels) == len(man.multiclass) == 2

    def test_shuffle_seed_randomizes_max_videos_subset(self, tmp_path):
        """test.py:156+159: the dataframe is shuffled with --random_state
        BEFORE truncation, so --max_videos keeps a random subset, not the
        file head. Label/8_cls rows must follow their video."""
        from mintime_tpu.data.manifest import load_manifest

        path = self._write(tmp_path)
        full = load_manifest(path)
        by_video = dict(zip(full.videos, zip(full.labels, full.multiclass)))
        man = load_manifest(path, max_videos=3, shuffle_seed=7)
        assert len(man.videos) == 3
        assert len(set(man.videos)) == 3
        for v, l, m in zip(man.videos, man.labels, man.multiclass):
            assert by_video[v] == (l, m)
        # deterministic for a given seed; no shuffle without max_videos cut
        again = load_manifest(path, max_videos=3, shuffle_seed=7)
        assert again.videos == man.videos
        assert load_manifest(path, shuffle_seed=7).videos == full.videos

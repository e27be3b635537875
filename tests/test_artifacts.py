"""Checkpoint/dataset autodetection (utils/artifacts.py) — the hook that
turns on the trained-weights measured loop + ATE the round the public
checkpoints and a dataset appear in the container (VERDICT r04 item 8).

Fixture-driven: fake .pth files and a minimal left/right image layout in
tmp dirs, steered through the documented env vars."""

import os

import numpy as np
import pytest

from rspl_slam_tpu.utils.artifacts import (WEIGHT_FILENAMES,
                                           find_dataset_root,
                                           find_pretrained)


@pytest.fixture
def clean_env(monkeypatch):
    for var in ("RSPL_WEIGHTS_DIR", "RSPL_DATA_DIR",
                "RSPL_SUPERPOINT_WEIGHTS", "RSPL_SUPERGLUE_WEIGHTS",
                "RSPL_RCF_WEIGHTS"):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


class TestFindPretrained:
    def test_empty_when_nothing_present(self, clean_env, tmp_path):
        assert find_pretrained(extra_dirs=(str(tmp_path),)) == {}

    def test_conventional_filenames_in_weights_dir(self, clean_env,
                                                   tmp_path):
        (tmp_path / "superpoint_v1.pth").write_bytes(b"x")
        (tmp_path / "superglue_outdoor.pth").write_bytes(b"x")
        (tmp_path / "bsds500_pascal_model.pth").write_bytes(b"x")
        clean_env.setenv("RSPL_WEIGHTS_DIR", str(tmp_path))
        found = find_pretrained()
        assert set(found) == {"superpoint", "superglue", "rcf"}
        assert found["superpoint"].endswith("superpoint_v1.pth")

    def test_alternative_names_and_partial_sets(self, clean_env, tmp_path):
        (tmp_path / "superglue_indoor.pth").write_bytes(b"x")
        found = find_pretrained(extra_dirs=(str(tmp_path),))
        assert set(found) == {"superglue"}

    def test_explicit_env_var_wins(self, clean_env, tmp_path):
        d = tmp_path / "dir"
        d.mkdir()
        (d / "superpoint_v1.pth").write_bytes(b"x")
        explicit = tmp_path / "my_sp.pth"
        explicit.write_bytes(b"x")
        clean_env.setenv("RSPL_WEIGHTS_DIR", str(d))
        clean_env.setenv("RSPL_SUPERPOINT_WEIGHTS", str(explicit))
        found = find_pretrained()
        assert found["superpoint"] == str(explicit)

    def test_every_documented_filename_is_recognized(self, clean_env,
                                                     tmp_path):
        for model, names in WEIGHT_FILENAMES.items():
            for name in names:
                d = tmp_path / f"{model}_{name}"
                d.mkdir()
                (d / name).write_bytes(b"x")
                assert find_pretrained(extra_dirs=(str(d),)) == {
                    model: str(d / name)
                }


def _make_min_dataset(root):
    """Minimal left/right layout open_dataset accepts: one stereo pair."""
    from PIL import Image

    for sub in ("left", "right"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(
            os.path.join(root, sub, "000000.png"))


class TestFindDatasetRoot:
    def test_none_when_nothing_present(self, clean_env, tmp_path):
        clean_env.setenv("RSPL_DATA_DIR", str(tmp_path))
        assert find_dataset_root(extra_dirs=()) is None or \
            not str(tmp_path) in str(find_dataset_root(extra_dirs=()))

    def test_env_root_direct(self, clean_env, tmp_path):
        _make_min_dataset(str(tmp_path))
        clean_env.setenv("RSPL_DATA_DIR", str(tmp_path))
        assert find_dataset_root() == str(tmp_path)

    def test_nested_sequence_found(self, clean_env, tmp_path):
        seq = tmp_path / "euroc" / "MH_01"
        _make_min_dataset(str(seq))
        clean_env.setenv("RSPL_DATA_DIR", str(tmp_path))
        assert find_dataset_root() == str(seq)

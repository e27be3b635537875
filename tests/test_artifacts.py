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


class TestTrainedDatasetAutoRun:
    @pytest.mark.slow
    def test_auto_run_yields_fps_and_ate(self, clean_env, tmp_path):
        """The full item-8 flow: weight files + a dataset sequence + a TUM
        ground-truth file appear → bench._trained_dataset_run produces
        fps, keyframe count and ATE with zero code change. Small camera /
        synthetic frames keep the test fast; the production entry point
        builds the EuRoC-scale config when ``cfg`` is omitted."""
        import jax
        from PIL import Image

        import bench
        from rspl_slam_tpu.config import (CameraConfig, PipelineConfig,
                                          SuperGlueConfig, SuperPointConfig,
                                          SystemConfig)
        from rspl_slam_tpu.datasets import write_tum_trajectory
        from rspl_slam_tpu.evaluation import synthetic
        from rspl_slam_tpu.models import superglue, superpoint
        from rspl_slam_tpu.models.weights import save_npz_pytree
        from rspl_slam_tpu.slam import INIT_POSE

        cam = CameraConfig(image_width=256, image_height=160, fx=200.0,
                           fy=200.0, cx=128.0, cy=80.0, bf=30.0)
        # "checkpoints": seeded inits round-tripped through npz — the
        # loader path is identical for real .pth-converted weights
        sg_arch = SuperGlueConfig(image_width=256, image_height=160,
                                  num_gnn_layers=2, sinkhorn_iterations=10)
        wdir = tmp_path / "weights"
        wdir.mkdir()
        save_npz_pytree(str(wdir / "superpoint.npz"),
                        superpoint.init_params(jax.random.PRNGKey(0)))
        save_npz_pytree(str(wdir / "superglue.npz"),
                        superglue.init_params(jax.random.PRNGKey(1), sg_arch))
        weights = {"superpoint": str(wdir / "superpoint.npz"),
                   "superglue": str(wdir / "superglue.npz")}
        import dataclasses

        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=128,
                                        keypoint_threshold=1e-4,
                                        weights_path=weights["superpoint"]),
            superglue=dataclasses.replace(
                sg_arch, weights_path=weights["superglue"]),
            camera=cam, use_lines=False,
            pipeline=PipelineConfig(lazy_right_extraction=False),
        )
        # dataset: rendered synthetic frames in left/right layout + TUM gt
        scene = synthetic.make_scene(num_points=400, seed=1)
        N = 6
        traj = synthetic.make_trajectory(N, step=0.04)
        d = tmp_path / "seq"
        for sub in ("left", "right"):
            (d / sub).mkdir(parents=True)
        times = np.arange(N) / 20.0
        for i in range(N):
            il, ir = synthetic.render_images(scene, cam, traj[i], seed=i)
            for sub, img in (("left", il), ("right", ir)):
                Image.fromarray(
                    (np.clip(img, 0, 1) * 255).astype(np.uint8)
                ).save(str(d / sub / f"{i:06d}.png"))
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        write_tum_trajectory(str(d / "groundtruth.txt"), times, gt)

        # the run must EXECUTE the full flow end to end (tracking quality
        # with random-seed "checkpoints" is not the point here)
        out = bench._trained_dataset_run(weights, str(d), max_frames=N,
                                         cfg=cfg)
        assert out["frames"] == N
        assert out["fps"] > 0
        assert "ate" in out, out  # groundtruth.txt was found and used
        assert out["ate"]["n"] >= 0


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

"""Training smoke tests: loss decreases, labels correct, params round-trip."""

import numpy as np
import pytest

from rspl_slam_tpu.config import CameraConfig
from rspl_slam_tpu.training import superpoint_train as T


class TestDetectorLabels:
    def test_cell_encoding(self):
        xy = np.array([[13.0, 21.0], [100.0, 3.0]])
        lab = T.detector_labels(xy, np.ones(2, bool), 64, 128)
        # (13, 21): cell (2, 1), offset (y%8=5, x%8=5) → 45
        assert lab[2, 1] == 8 * 5 + 5
        assert lab[0, 12] == 8 * 3 + 4
        assert (lab == 64).sum() == 64 // 8 * (128 // 8) - 2


class TestTrainSmoke:
    def test_loss_decreases(self):
        cam = CameraConfig(image_width=96, image_height=64, fx=80.0, fy=80.0,
                           cx=48.0, cy=32.0, bf=8.0)
        import jax

        from rspl_slam_tpu.models import superpoint

        params = superpoint.init_params(jax.random.PRNGKey(0))
        il, ir, ll, lr_, corr = T.make_batch(cam, 2, seed=0)
        l0 = float(T.loss_fn(params, il, ir, ll, lr_, corr))
        params = T.train(cam, steps=8, batch=2, lr=2e-3, seed=0,
                         params=params, verbose=False)
        l1 = float(T.loss_fn(params, il, ir, ll, lr_, corr))
        assert np.isfinite(l0) and np.isfinite(l1)
        assert l1 < l0, (l0, l1)

    def test_params_roundtrip(self, tmp_path):
        import jax

        from rspl_slam_tpu.models import superpoint

        params = superpoint.init_params(jax.random.PRNGKey(1))
        p = str(tmp_path / "sp.npz")
        T.save_params(params, p)
        loaded = T.load_params(p)
        for name in params:
            np.testing.assert_allclose(
                np.asarray(params[name]["w"]), np.asarray(loaded[name]["w"])
            )

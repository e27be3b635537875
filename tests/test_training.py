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


class TestSuperGlueTraining:
    """Synthetic matcher training (training/superglue_train.py)."""

    def _cfg(self):
        from rspl_slam_tpu.config import SuperGlueConfig

        return SuperGlueConfig(image_width=160, image_height=120,
                               num_gnn_layers=2, sinkhorn_iterations=10)

    def test_overfits_fixed_batch(self):
        """Fast machinery check: the loss collapses and the decode recovers
        the GT assignment on a single repeated batch (full generalization is
        the slow test below)."""
        import numpy as np

        from rspl_slam_tpu.training import superglue_train as G

        cfg = self._cfg()
        fixed = G.make_batch(np.random.default_rng(0), 2, 16, cfg)
        params, hist = G.train(cfg, steps=60, batch=2, K=16, lr=1e-3,
                               verbose=False,
                               batch_fn=lambda *a: fixed)
        assert hist[-1] < hist[0] * 0.3, (hist[0], hist[-1])
        acc = G.matching_accuracy(params, fixed, cfg)
        assert acc > 0.9, acc

    @pytest.mark.slow
    def test_generalizes_to_heldout_problems(self):
        import jax
        import numpy as np

        from rspl_slam_tpu.models import superglue
        from rspl_slam_tpu.training import superglue_train as G

        cfg = self._cfg()
        rng = np.random.default_rng(99)
        eval_batch = G.make_batch(rng, 4, 32, cfg)
        p0 = superglue.init_params(jax.random.PRNGKey(0), cfg)
        acc0 = G.matching_accuracy(p0, eval_batch, cfg)
        params, hist = G.train(cfg, steps=300, batch=8, K=32, verbose=False)
        acc1 = G.matching_accuracy(params, eval_batch, cfg)
        assert hist[-1] < hist[0] * 0.5, (hist[0], hist[-1])
        assert acc1 > 0.9 and acc1 > acc0 + 0.5, (acc0, acc1)

    def test_shift_pair_bank_labels_are_exact(self):
        """Distillation bank (bench's trained-matcher bootstrap): shifted
        sub-pixel crops of a textured image give EXACT correspondence, so
        the self-labeled GT must be geometrically consistent — matched
        keypoints land within tolerance of the un-shifted position, and a
        healthy fraction of keypoints match at all."""
        import jax
        import numpy as np

        from rspl_slam_tpu.config import SuperPointConfig
        from rspl_slam_tpu.models import superpoint
        from rspl_slam_tpu.training import superglue_train as G

        rng_img = np.random.default_rng(0)
        # smooth random texture (pure noise has no stable keypoints)
        img = rng_img.uniform(size=(40, 50)).astype(np.float32)
        img = np.kron(img, np.ones((8, 8), np.float32))  # (320, 400)
        sp_params = superpoint.init_params(jax.random.PRNGKey(1))
        sp_cfg = SuperPointConfig(max_keypoints=64, keypoint_threshold=1e-4)
        bank = G.make_shift_pair_bank(
            [img], sp_params, sp_cfg, n_pairs=4, K=64,
            rng=np.random.default_rng(2), crop_hw=(160, 240),
            shift_range=16.0)
        assert len(bank) == 4
        any_matches = 0
        for xy0, sc0, d0, v0, xy1, sc1, d1, v1, gt0 in bank:
            m = (gt0 >= 0) & (gt0 < 64)
            any_matches += int(m.sum())
            # matched pairs: descriptor similarity above the population
            if m.sum() >= 2:
                sims = np.einsum("ij,ij->i", d0[m], d1[gt0[m]])
                assert sims.mean() > 0.9
            assert (gt0[~v0] == -1).all()
        assert any_matches >= 20, any_matches

    def test_label_by_landmarks(self):
        """Landmark-table labeling (the stereo/temporal distillation bank):
        keypoints bound to the same visible landmark match; keypoints far
        from every landmark — and keypoints whose landmark is missing in
        the other view — go to the dustbin; invalid rows are −1."""
        import numpy as np

        from rspl_slam_tpu.training import superglue_train as G

        lm0 = np.array([[10.0, 10], [50, 20], [90, 40], [130, 80]])
        lm1 = lm0 - [16.0, 0]  # "disparity" per landmark
        vis = np.array([True, True, True, False])  # landmark 3 not shared
        # view-0 keypoints: near lm0..lm2, one spurious, one invalid slot
        xy0 = np.array([[11.0, 9], [49, 21], [91, 39], [200, 200], [0, 0]])
        v0 = np.array([True, True, True, True, False])
        # view-1 keypoints: near lm1 of 0 and 2 only (landmark 1 undetected)
        xy1 = np.array([[-6.0, 10], [75, 40], [114, 80]])
        v1 = np.ones(3, bool)
        gt0 = G.label_by_landmarks(xy0, v0, xy1, v1, lm0, lm1, vis,
                                   tol_px=5.0)
        K1 = 3
        assert gt0[0] == 0          # lm0 seen in both
        assert gt0[1] == K1         # lm1 undetected in view 1 → dustbin
        assert gt0[2] == 1          # lm2 → keypoint 1 of view 1
        assert gt0[3] == K1         # spurious keypoint → dustbin
        assert gt0[4] == -1         # invalid row

    def test_bank_batch_fn_stacks(self):
        import numpy as np

        from rspl_slam_tpu.training import superglue_train as G

        cfg = self._cfg()
        # reuse the synthetic generator to fabricate bank items
        b = G.make_batch(np.random.default_rng(0), 3, 16, cfg)
        bank = [tuple(np.asarray(a)[i] for a in b) for i in range(3)]
        fn = G.bank_batch_fn(bank)
        out = fn(np.random.default_rng(1), 2, 16, cfg)
        assert out[0].shape == (2, 16, 2)
        assert out[-1].shape == (2, 16)

    def test_ground_truth_batch_sanity(self):
        import numpy as np

        from rspl_slam_tpu.training import superglue_train as G

        cfg = self._cfg()
        rng = np.random.default_rng(3)
        xy0, sc0, d0, v0, xy1, sc1, d1, v1, gt0 = (
            np.asarray(a) for a in G.make_batch(rng, 2, 24, cfg)
        )
        K = 24
        m = (gt0 >= 0) & (gt0 < K)
        assert m.sum() > 0
        # matched descriptors are close (same landmark + noise)
        b, i = np.nonzero(m)
        sims = np.sum(d0[b, i] * d1[b, gt0[b, i]], -1)
        assert sims.mean() > 0.8, sims.mean()
        # invalid rows are excluded
        assert (gt0[~v0] == -1).all()


@pytest.mark.slow
def test_trained_superpoint_localizes_better_than_random():
    """The mechanism by which pretraining helps tracking: keypoint
    localization against rendered ground truth (measured: recall@2px
    roughly doubles and median error drops ~35% after 120 steps)."""
    import jax
    import jax.numpy as jnp

    from rspl_slam_tpu.config import SuperPointConfig
    from rspl_slam_tpu.evaluation import synthetic
    from rspl_slam_tpu.models import superpoint

    cam = CameraConfig(image_width=160, image_height=120, fx=120.0,
                       fy=120.0, cx=80.0, cy=60.0, bf=12.0)
    cfg = SuperPointConfig(max_keypoints=100, keypoint_threshold=1e-4)

    def localization(params, seeds=(11, 12, 13)):
        recalls, errs = [], []
        for s in seeds:
            scene = synthetic.make_scene(num_points=120, num_lines=0,
                                         seed=s, extent=(4.0, 3.0, 4.0))
            il, _ = synthetic.render_images(scene, cam, np.eye(4), seed=s)
            obs = synthetic.observe_points(scene, cam, np.eye(4))
            gt = obs["uv_left"][obs["visible"]]
            f = superpoint.extract(params, jnp.asarray(il[None]), cfg,
                                   jnp.float32)
            xy = np.asarray(f.xy[0])[np.asarray(f.valid[0])]
            d = np.linalg.norm(gt[:, None] - xy[None], axis=-1).min(1)
            recalls.append(float((d < 2.0).mean()))
            errs.append(float(np.median(d)))
        return float(np.mean(recalls)), float(np.mean(errs))

    p0 = superpoint.init_params(jax.random.PRNGKey(0))
    r0, e0 = localization(p0)
    tp = T.train(cam, steps=120, batch=2, lr=1e-3, seed=0, verbose=False)
    r1, e1 = localization(tp)
    assert r1 > r0 + 0.08, (r0, r1)
    assert e1 < e0, (e0, e1)

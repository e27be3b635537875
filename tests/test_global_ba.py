"""Full-map (global) bundle adjustment — SLAMSystem.run_global_ba.

The reference's consistency ends at the ~9-keyframe covisibility window
(map.cc:471-525); run_global_ba jointly refines ALL keyframes + landmarks
with the same Huber/chi²-gated two-phase LM, optionally with the
constraint dimension sharded over a device mesh (psum-reduced normal
equations, parallel/dist_ba.py).
"""

import copy

import numpy as np

from rspl_slam_tpu.config import PipelineConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.backend import map_store
from rspl_slam_tpu.parallel import mesh as meshlib
from rspl_slam_tpu.slam import SLAMSystem


def _build_map(n_frames=35, noise_px=0.6, seed=2, use_lines=False):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
        use_lines=use_lines,
    )
    scene = synthetic.make_scene(num_points=900, seed=seed,
                                 num_lines=10 if use_lines else 0,
                                 extent=(10.0, 6.0, 16.0))
    traj = synthetic.make_trajectory(n_frames, step=0.05, yaw_rate=0.003)
    fe = OracleFrontend(cfg, scene, noise_px=noise_px, seed=seed,
                        use_lines=use_lines)
    fe.poses = traj
    # no local BA: the map keeps its raw triangulation/tracking noise so
    # global BA has real work to do
    slam = SLAMSystem(cfg, fe, enable_ba=False)
    for i in range(n_frames):
        slam.add_frame(i, i * 0.05, None, None)
    return slam


def _perturb(slam, sigma_pose=0.01, sigma_pt=0.02, seed=0):
    rng = np.random.default_rng(seed)
    m = slam.map
    for k in range(1, m.n_kf):  # keyframe 0 stays fixed (gauge)
        m.kf_pose[k][:3, 3] += rng.standard_normal(3) * sigma_pose
    good = np.nonzero(m.pt_status[: m.n_pt] == map_store.PT_GOOD)[0]
    m.pt_pos[good] += rng.standard_normal((len(good), 3)) * sigma_pt


def _reproj_rms(slam):
    """RMS stereo reprojection error over all observations — the objective
    global BA minimizes, measured independently of it."""
    m = slam.map
    K = slam.K
    errs = []
    for pt in np.nonzero(m.pt_status[: m.n_pt] == map_store.PT_GOOD)[0]:
        for o in range(m.pt_obs_n[pt]):
            kf, kp = int(m.pt_obs_kf[pt, o]), int(m.pt_obs_kpt[pt, o])
            if kf < 0:
                continue
            Tcw = np.linalg.inv(m.kf_pose[kf])
            Xc = Tcw[:3, :3] @ m.pt_pos[pt] + Tcw[:3, 3]
            if Xc[2] <= 0.1:
                continue
            u = K.fx * Xc[0] / Xc[2] + K.cx
            v = K.fy * Xc[1] / Xc[2] + K.cy
            meas = m.kf_meas[kf, kp]
            errs.append((u - meas[0]) ** 2 + (v - meas[1]) ** 2)
    return float(np.sqrt(np.mean(errs)))


class TestGlobalBA:
    def test_refines_perturbed_map(self):
        slam = _build_map()
        assert slam.map.n_kf >= 4
        _perturb(slam)
        before = _reproj_rms(slam)
        pose0 = slam.map.kf_pose[0].copy()
        cost = slam.run_global_ba()
        assert cost is not None
        after = _reproj_rms(slam)
        assert after < before * 0.5, (before, after)
        assert after < 1.5, after  # px, ~noise floor at noise_px=0.6
        # gauge held: keyframe 0 untouched
        np.testing.assert_allclose(slam.map.kf_pose[0], pose0)

    def test_with_lines(self):
        slam = _build_map(use_lines=True)
        _perturb(slam, sigma_pose=0.005, sigma_pt=0.01, seed=3)
        before = _reproj_rms(slam)
        cost = slam.run_global_ba()
        assert cost is not None
        assert _reproj_rms(slam) < before

    def test_sharded_matches_single_device(self):
        slam = _build_map()
        _perturb(slam)
        twin = copy.deepcopy(slam)

        cost1 = slam.run_global_ba()
        mesh = meshlib.make_mesh(n_data=8)
        cost8 = twin.run_global_ba(mesh=mesh)
        assert cost1 is not None and cost8 is not None
        # same problem, same schedule; only the psum reduction order differs
        np.testing.assert_allclose(cost8, cost1, rtol=1e-3)
        np.testing.assert_allclose(
            twin.map.kf_pose[: twin.map.n_kf],
            slam.map.kf_pose[: slam.map.n_kf], atol=1e-3,
        )
        pts = np.nonzero(slam.map.pt_status[: slam.map.n_pt] == map_store.PT_GOOD)[0]
        # weakly-observed landmarks are sensitive to f32 reduction order
        # (a handful move a few cm); the bulk must agree tightly
        d = np.linalg.norm(twin.map.pt_pos[pts] - slam.map.pt_pos[pts], axis=1)
        assert np.median(d) < 1e-4, float(np.median(d))
        assert d.max() < 0.1, float(d.max())

    def test_too_small_map_is_noop(self):
        slam = _build_map(n_frames=1)
        assert slam.run_global_ba() is None


def _reproj_rms_full(slam):
    """RMS reprojection error over the COMPLETE kf_track back-pointer
    table — includes observations ring-evicted past MAX_OBS, which the
    ring-based _reproj_rms above cannot see."""
    m = slam.map
    K = slam.K
    errs = []
    for kf in range(m.n_kf):
        for kp in np.nonzero(m.kf_track[kf] >= 0)[0]:
            pt = int(m.kf_track[kf, kp])
            if m.pt_status[pt] != map_store.PT_GOOD:
                continue
            Tcw = np.linalg.inv(m.kf_pose[kf])
            Xc = Tcw[:3, :3] @ m.pt_pos[pt] + Tcw[:3, 3]
            if Xc[2] <= 0.1:
                continue
            u = K.fx * Xc[0] / Xc[2] + K.cx
            v = K.fy * Xc[1] / Xc[2] + K.cy
            meas = m.kf_meas[kf, kp]
            errs.append((u - meas[0]) ** 2 + (v - meas[1]) ** 2)
    return float(np.sqrt(np.mean(errs)))


class TestGlobalBALongLoop:
    """Loops LONGER than the MAX_OBS=16 observation ring (VERDICT r04
    item 9): global BA gathers from the complete kf_track table, so the
    joint refinement uses observations the rings evicted."""

    N_KF = 20
    N_PT = 60

    def _long_loop_slam(self):
        from rspl_slam_tpu.backend.map_store import MAX_OBS, MapStore
        from rspl_slam_tpu.frontend.frontends import OracleFrontend

        assert self.N_KF > MAX_OBS
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=64),
            pipeline=PipelineConfig(max_map_keyframes=32, max_map_points=256,
                                    ba_max_points=256),
        )
        scene = synthetic.make_scene(num_points=10, seed=0)
        slam = SLAMSystem(cfg, OracleFrontend(cfg, scene), enable_ba=False)
        cam = cfg.camera
        m = MapStore(64, cfg.line_detector.max_lines, cfg.pipeline,
                     desc_dim=cfg.superglue.descriptor_dim)
        m.set_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
        rng = np.random.default_rng(5)
        pts_w = rng.uniform([-2, -1.5, 5], [2, 1.5, 10], (self.N_PT, 3))
        descs = rng.standard_normal((self.N_PT, 256)).astype(np.float32)
        pt_ids = m.new_mappoints_batch(pts_w, descs)
        for k in range(self.N_KF):
            Twc = np.eye(4)
            Twc[0, 3] = 0.02 * k  # every keyframe sees every landmark
            Tcw = np.linalg.inv(Twc)
            Xc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
            meas = np.zeros((64, 3), np.float32)
            meas[: self.N_PT, 0] = cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx
            meas[: self.N_PT, 1] = cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy
            meas[: self.N_PT, 2] = meas[: self.N_PT, 0] - cam.bf / Xc[:, 2]
            valid = np.arange(64) < self.N_PT
            kf = m.add_keyframe(k, 0.05 * k, Twc, meas, valid,
                                np.zeros((64, 256), np.float16),
                                np.ones(64, np.float16), fixed=k == 0)
            m.add_point_obs_batch(pt_ids, kf, np.arange(self.N_PT))
            m.update_covisibility(kf)
        slam.map = m
        slam.initialized = True
        slam._ref_kf = m.n_kf - 1
        return slam, pt_ids

    def test_global_ba_uses_evicted_observations(self):
        from rspl_slam_tpu.backend.map_store import MAX_OBS

        slam, pt_ids = self._long_loop_slam()
        m = slam.map
        # the rings saturated at MAX_OBS, but the full table kept all N_KF
        assert (m.pt_obs_n[pt_ids] == MAX_OBS).all()
        per_pt_tracked = (m.kf_track[: m.n_kf] >= 0).sum(0)
        assert (per_pt_tracked[: self.N_PT] == self.N_KF).all()

        # the global gather must contain ALL N_KF×N_PT constraints —
        # including the N_KF−MAX_OBS oldest (ring-evicted) keyframes
        frames = np.arange(m.n_kf)
        _, mapping = m.gather_ba_window(
            m.n_kf - 1, 32, 256, 8, 2048, 32, frames=frames, full_obs=True)
        assert mapping["ncp"] == self.N_KF * self.N_PT
        assert set(np.unique(mapping["p_pose"])) == set(range(self.N_KF))
        # the ring gather, by contrast, is capped
        _, ring_map = m.gather_ba_window(
            m.n_kf - 1, 32, 256, 8, 2048, 32, frames=frames)
        assert ring_map["ncp"] == MAX_OBS * self.N_PT

        # and run_global_ba (which uses the full table) drives the
        # FULL-table reprojection error down — evicted observations
        # included in the metric
        rng = np.random.default_rng(7)
        for k in range(1, m.n_kf):
            m.kf_pose[k][:3, 3] += rng.standard_normal(3) * 0.01
        m.pt_pos[pt_ids] += rng.standard_normal((self.N_PT, 3)) * 0.02
        before = _reproj_rms_full(slam)
        cost = slam.run_global_ba()
        assert cost is not None
        after = _reproj_rms_full(slam)
        assert after < before * 0.2, (before, after)
        assert after < 0.5, after  # noiseless synthetic: near machine floor

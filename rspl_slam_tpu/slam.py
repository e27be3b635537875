"""Top-level SLAM system — the orchestrator replacing MapBuilder
(map_builder.cc) with a functional host loop around jitted device steps.

Per-frame flow (≙ ExtractFeatureThread + TrackingThread, map_builder.cc:
72-262, collapsed into explicit stages — the async pipelined version lives
in pipeline.py):

1. frontend.extract_pair: batched SuperPoint (+SuperGlue stereo) for the
   pair; yields fixed-K features with stereo depth.
2. Initialization (first frame): ≥150 keypoints, ≥100 stereo matches,
   ≥100 stereo points; first pose = the reference's hard-coded
   gravity-aligned matrix, held fixed (map_builder.cc:358-377).
3. Tracking: match against the reference keyframe; collect mappoint
   correspondences; PnP-RANSAC init + pose-only LM; 0.5 m jump check
   (map_builder.cc:517-521); fallback re-track against the previous frame
   promoted to keyframe when matches < min_num_match (218-236).
4. Keyframe policy: matches < max_num_match ∨ Δangle > max_angle ∨
   Δdist > max_distance ∨ Δframes > max_num_passed_frame (616-636).
5. Keyframe insertion: extend matched mappoints, spawn stereo mappoints,
   multi-view triangulate, update covisibility, run local BA on the
   covisibility window, prune outliers (map.cc:24-109, 537-808).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.backend import local_ba, map_store, pnp, pose_solver
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.config import SystemConfig
from rspl_slam_tpu.datasets import write_tum_trajectory
from rspl_slam_tpu.frontend.frontends import FrameFeatures
from rspl_slam_tpu.geometry import se3, triangulation

__all__ = ["SLAMSystem", "INIT_POSE"]

# the reference's hard-coded gravity-aligned first pose (map_builder.cc:368-371)
INIT_POSE = np.array(
    [[1.0, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 1], [0, 0, 0, 1]]
)


def _members_to_lists(members: np.ndarray | None, width: int = 32) -> np.ndarray | None:
    """(L, K) bool membership → (L, width) int32 keypoint index lists."""
    if members is None:
        return None
    LN = members.shape[0]
    out = np.full((LN, width), -1, np.int32)
    if LN == 0:
        return out
    rank = members.cumsum(1) - 1  # per-row rank of each member
    li, ki = np.nonzero(members)
    r = rank[li, ki]
    m = r < width
    out[li[m], r[m]] = ki[m]
    return out


@jax.jit
def _tri_points_packed(pose_table, okf, uvn, mask):
    """vmapped multi-view triangulation with a single packed download
    [pts; ok] — separate fetches each cost a round trip on a tunneled
    device. Observer poses arrive as a SMALL keyframe pose table plus
    (B, MAX_OBS) int32 indices and are gathered on device: the naive
    per-observation (B, MAX_OBS, 4, 4) upload is ~95% repeated rows and
    was the third-largest transfer in the measured production loop."""
    Twc = jnp.take(pose_table, okf, axis=0)  # (B, M, 4, 4)
    pts, ok = jax.vmap(triangulation.triangulate_point_multiview)(
        Twc, uvn, mask)
    return jnp.concatenate(
        [pts.reshape(-1).astype(jnp.float32), ok.astype(jnp.float32)])


@jax.jit
def _fit_lines_packed(arr, mask):
    """vmapped 3D line fits, packed [plucker; endpoints; ok]."""
    L, eps, ok = jax.vmap(triangulation.fit_line3d_to_points)(arr, mask)
    return jnp.concatenate([
        L.reshape(-1).astype(jnp.float32),
        eps.reshape(-1).astype(jnp.float32), ok.astype(jnp.float32)])


@jax.jit
def _line_endpoints_packed(plk, arr, mask):
    """vmapped endpoint refresh, packed [endpoints; ok]."""
    eps, ok = jax.vmap(triangulation.triangulate_line_endpoints)(
        plk, arr, mask)
    return jnp.concatenate(
        [eps.reshape(-1).astype(jnp.float32), ok.astype(jnp.float32)])


def _pad_pow2_batch(arrs: list, masks: list, P: int, lo: int = 32):
    """Stack per-line point sets and pad the batch dim to the next power
    of two with a floor of ``lo`` (all-False masks on padded rows): the
    vmapped triangulation kernels compile for one or two bucket sizes
    instead of every distinct line count — a fresh compile costs seconds
    (tens of seconds over a tunneled device), far more than the padded
    rows' arithmetic ever will."""
    B = len(arrs)
    cap = max(lo, 1 << (B - 1).bit_length() if B > 1 else 1)
    arr = np.zeros((cap, P, 3))
    mask = np.zeros((cap, P), bool)
    arr[:B] = np.stack(arrs)
    mask[:B] = np.stack(masks)
    return arr, mask


@dataclass
class FrameRecord:
    frame_id: int
    time: float
    Twc: np.ndarray
    is_keyframe: bool = False
    kf_slot: int = -1
    num_inliers: int = 0


class SLAMSystem:
    # wants_images() runs on the PipelinedRunner's extraction thread while
    # add_frame* runs on the tracking thread: the lazy CombinedTracker build
    # must not race into two trackers (and two redundant jit traces). Class-
    # level (not per-instance) so SLAMSystem stays deep-copyable.
    _combined_lock = threading.Lock()

    def __init__(self, cfg: SystemConfig, frontend, enable_ba: bool = True,
                 enable_lines: bool | None = None,
                 enable_loop_closure: bool = False,
                 enable_relocalization: bool | None = None,
                 reloc_after: int = 3,
                 global_ba_on_loop: bool = False,
                 fused_tracking: bool | None = None):
        self.cfg = cfg
        self.frontend = frontend
        self.enable_ba = enable_ba
        # fused tracking (match+PnP+LM in one dispatch, fused_track.py)
        # auto-enables for frontends with a device-side matcher
        if fused_tracking is None:
            fused_tracking = (
                getattr(frontend, "matcher", None) in ("superglue", "cosine")
                # epipolar rejection lives on the host match path
                and not cfg.pipeline.match_outlier_rejection
            )
        self._fused_enabled = fused_tracking
        self._fused = None
        self._combined = None  # lazily-built frame_step.CombinedTracker
        self._pending_ba = None  # in-flight async local BA (async_ba)
        self.enable_lines = cfg.use_lines if enable_lines is None else enable_lines
        cam = cfg.camera
        self.K = CameraIntrinsics(cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
        # loop closure (an extension over the reference, which drifts
        # unboundedly): place recognition + geometric verification feeding
        # measured constraints into the global pose graph
        self.loop_detector = None
        self.loop_constraints: list = []
        # relocalization (also absent in the reference): after ``reloc_after``
        # consecutive lost frames, query the same place-recognition database
        # to re-anchor tracking on ANY previous keyframe
        if enable_relocalization is None:
            enable_relocalization = enable_loop_closure
        self.enable_relocalization = enable_relocalization
        self.reloc_after = reloc_after
        self.reloc_count = 0
        if enable_loop_closure or enable_relocalization:
            from rspl_slam_tpu.backend.loop_closure import LoopDetector
            self.loop_detector = LoopDetector(bf=cam.bf)
            self._loop_closure_on = enable_loop_closure
        else:
            self._loop_closure_on = False
        self._global_ba_on_loop = global_ba_on_loop
        self.map = map_store.MapStore(
            cfg.superpoint.max_keypoints, cfg.line_detector.max_lines,
            cfg.pipeline, desc_dim=cfg.superglue.descriptor_dim,
        )
        self.map.set_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
        self.initialized = False
        self.records: list[FrameRecord] = []
        self.key = jax.random.PRNGKey(7)
        # tracking state
        self._last_Twc = INIT_POSE.copy()
        self._ref_kf = -1  # map slot of the reference keyframe
        self._ref_feats: FrameFeatures | None = None
        self._last_feats: FrameFeatures | None = None
        self._last_frame_meta = None  # (frame_id, time)
        self._last_track_ok = True
        self._lost_count = 0  # consecutive frames without a pose fix
        self._index_offset = 0  # shifts caller frame ids after a resume
        self._capacity_warned = False
        self.timings: dict[str, list] = {}

    # ------------------------------------------------------------------ api
    def add_frame(self, index: int, t: float, img_l, img_r) -> FrameRecord:
        if self.wants_images():
            return self._add_frame_combined(index, t, img_l, img_r)
        t0 = time.perf_counter()
        feats = self.frontend.extract_pair(img_l, img_r)
        self._t("extract", t0)
        return self.add_frame_features(index, t, feats)

    def wants_images(self) -> bool:
        """True when the combined one-dispatch frame step applies: raw
        images should flow to :meth:`add_frame` rather than through a
        separate extraction stage (PipelinedRunner consults this)."""
        if not (
            self.initialized and self._fused_enabled
            and self.cfg.pipeline.combined_frame_step
            and getattr(self.frontend, "lazy_right", False)
        ):
            return False
        if self._combined is None:
            with self._combined_lock:
                if self._combined is None:
                    from rspl_slam_tpu.frame_step import CombinedTracker

                    tcfg = self.cfg.optimization.tracking
                    self._combined = CombinedTracker(
                        self.frontend, self.K,
                        tcfg.mono_point, tcfg.stereo_point)
        return self._combined.supported(self._ref_feats)

    def _add_frame_combined(self, index: int, t: float, img_l,
                            img_r) -> FrameRecord:
        """Extraction + tracking in one dispatch chain
        (frame_step.CombinedTracker), then the regular tracking policy."""
        t0 = time.perf_counter()
        index = index + self._index_offset
        ref_pt = self.map.kf_track[self._ref_kf]
        safe = np.maximum(ref_pt, 0)
        ref_good = (ref_pt >= 0) & (
            self.map.pt_status[safe] == map_store.PT_GOOD)
        ref_pos = self.map.pt_pos[safe]
        ff, i0, Twc, n_inl, inlier = self._combined.step(
            img_l, img_r, self._ref_feats, ref_pos, ref_good,
            self._last_Twc)
        # post-LM sanity jump check, same as the other paths
        if np.linalg.norm(Twc[:3, 3] - self._last_Twc[:3, 3]) > 0.5:
            Twc = self._last_Twc.copy()
        self._t("frame_combined", t0)
        rec = self._track(index, t, ff, i0=i0,
                          fused_pose=(Twc, n_inl, inlier))
        self.records.append(rec)
        self._last_feats = ff
        self._last_frame_meta = (index, t, rec.Twc)
        return rec

    def add_frame_features(self, index: int, t: float, feats,
                           i0: np.ndarray | None = None) -> FrameRecord:
        """Tracking-side entry: consume pre-extracted features (stage B of
        the pipelined runner — ≙ TrackingThread, map_builder.cc:187-262).
        ``i0`` optionally supplies precomputed temporal matches against the
        current reference keyframe (multi-sequence batched matching)."""
        index = index + self._index_offset
        if not self.initialized:
            rec = self._init_map(index, t, feats)
        else:
            rec = self._track(index, t, feats, i0)
        self.records.append(rec)
        self._last_feats = feats
        self._last_frame_meta = (index, t, rec.Twc)
        return rec

    def save_trajectory(self, path: str, keyframes_only: bool = True):
        self.flush_ba()
        if keyframes_only:
            times, poses = self.map.keyframe_trajectory()
        else:
            times = np.asarray([r.time for r in self.records])
            poses = np.stack([r.Twc for r in self.records])
        write_tum_trajectory(path, times, poses)

    def save_map(self, path: str):
        self.flush_ba()
        self.map.save(path)

    def resume_from_map(self, path: str):
        """Load a saved map checkpoint and resume tracking against it — a
        capability the reference lacks entirely (it writes text maps it
        never reads back, map.cc:1026-1077). The tracking anchor becomes
        the last stored keyframe, with its features rebuilt straight from
        the map arrays; frames fed after resume re-associate by normal
        matching, or — if the camera moved while the system was down — via
        relocalization (enable_relocalization). Caller frame indices are
        shifted past the stored ones automatically (the keyframe cadence
        counts frames since the reference keyframe, and duplicate frame ids
        would collide in the text map dump), so drivers may restart at 0."""
        self._pending_ba = None  # any in-flight solve targets the old map
        self.map = map_store.MapStore.load(path, self.cfg.pipeline)
        if self.map.K != self.cfg.superpoint.max_keypoints:
            raise ValueError(
                f"checkpoint keypoint capacity K={self.map.K} != configured "
                f"max_keypoints={self.cfg.superpoint.max_keypoints}; resume "
                f"with the config the map was built under"
            )
        self.initialized = self.map.n_kf > 0
        self.records = []
        self.loop_constraints = []
        if self.loop_detector is not None:
            self.loop_detector._gdesc = []  # derived; rebuilt lazily
        if self.initialized:
            self._ref_kf = self.map.n_kf - 1
            self._ref_feats = self._features_from_keyframe(self._ref_kf)
            self._last_Twc = self.map.kf_pose[self._ref_kf].copy()
            self._last_feats = None
            self._last_frame_meta = None
            self._last_track_ok = True
            self._lost_count = 0
            self._index_offset = int(
                self.map.kf_frame_id[: self.map.n_kf].max()
            ) + 1

    # ----------------------------------------------------------------- init
    def _init_map(self, index: int, t: float, feats: FrameFeatures) -> FrameRecord:
        # lazy-right mode holds back right-image extraction on tracked
        # frames; initialization needs the full stereo gate set, so finish
        # it here (≙ Init runs full stereo every attempt, map_builder.cc:361)
        feats = self._complete_stereo(feats)
        n_kpts = int(feats.valid.sum())
        stereo_ok = feats.valid & (feats.depth > 0)
        if n_kpts < 150 or int(stereo_ok.sum()) < 100:
            return FrameRecord(index, t, INIT_POSE.copy())
        Twc = INIT_POSE.copy()
        has_lines = self.enable_lines and feats.lines is not None
        kf = self.map.add_keyframe(
            index, t, Twc, feats.meas, feats.valid, feats.desc, feats.score,
            fixed=True,
            lines=feats.lines if has_lines else None,
            lines_right=feats.lines_right if has_lines else None,
            line_valid=feats.line_valid if has_lines else None,
            line_has_right=feats.line_has_right if has_lines else None,
            line_points=_members_to_lists(feats.line_members) if has_lines else None,
        )
        Rwc, twc = Twc[:3, :3], Twc[:3, 3]
        # all gates were checked up front (≥150 kpts, ≥100 stereo) so map
        # mutation below cannot need rolling back; landmark creation is one
        # batched back-projection (≙ the Init loop, map_builder.cc:390-404)
        cam = self.cfg.camera
        idx = np.nonzero(stereo_ok)[0]
        d = feats.depth[idx]
        pc = np.stack([
            (feats.xy[idx, 0] - cam.cx) / cam.fx * d,
            (feats.xy[idx, 1] - cam.cy) / cam.fy * d,
            d,
        ], -1)
        pw = pc @ Rwc.T + twc
        pts = self.map.new_mappoints_batch(pw, feats.desc[idx])
        self.map.add_point_obs_batch(pts, kf, idx)
        created = len(idx)
        if has_lines:
            self._process_keyframe_lines(kf, feats, np.full(len(feats.xy), -1))
        self.initialized = True
        self._ref_kf = kf
        self._ref_feats = feats
        self._last_Twc = Twc
        return FrameRecord(index, t, Twc, True, kf, created)

    # ------------------------------------------------------------- tracking
    def _fused_track(self, feats: FrameFeatures):
        """One-dispatch temporal match + association + PnP + pose LM
        (fused_track.FusedTracker). Returns (i0, (Twc, n_inl, inlier))."""
        if self._fused is None:
            from rspl_slam_tpu.fused_track import FusedTracker

            tcfg = self.cfg.optimization.tracking
            self._fused = FusedTracker(self.frontend, self.K,
                                       tcfg.mono_point, tcfg.stereo_point)
        ref_pt = self.map.kf_track[self._ref_kf]
        safe = np.maximum(ref_pt, 0)
        ref_good = (ref_pt >= 0) & (
            self.map.pt_status[safe] == map_store.PT_GOOD)
        ref_pos = self.map.pt_pos[safe]
        i0, Twc, n_inl, inlier = self._fused.track(
            feats, self._ref_feats, ref_pos, ref_good, self._last_Twc)
        # post-LM sanity jump check, same as the slow path
        if np.linalg.norm(Twc[:3, 3] - self._last_Twc[:3, 3]) > 0.5:
            Twc = self._last_Twc.copy()
        return i0, (Twc, n_inl, inlier)

    def _track(self, index: int, t: float, feats: FrameFeatures,
               i0: np.ndarray | None = None,
               fused_pose=None) -> FrameRecord:
        t0 = time.perf_counter()
        if fused_pose is None and i0 is None and self._fused_enabled:
            i0, fused_pose = self._fused_track(feats)
            self._t("track_fused", t0)
        elif i0 is None:
            i0 = self.frontend.match(feats, self._ref_feats)
            self._t("match", t0)
        num_match = int((i0 >= 0).sum())

        # relocalization (capability the reference lacks): after
        # ``reloc_after`` consecutive frames without a pose fix, query the
        # place-recognition database with the RAW frame features and
        # re-anchor tracking on the best geometrically-verified keyframe
        if (
            self.enable_relocalization
            and self._lost_count >= self.reloc_after
            and num_match < self.cfg.keyframe.min_num_match
        ):
            t0 = time.perf_counter()
            r = self.loop_detector.relocalize(
                self.map, feats.desc, feats.valid, feats.meas
            )
            if r is not None:
                c, Twc_r, _ = r
                self._ref_kf = int(c)
                self._ref_feats = self._features_from_keyframe(int(c))
                self._last_Twc = np.asarray(Twc_r)
                self.reloc_count += 1
                i0 = self.frontend.match(feats, self._ref_feats)
                num_match = int((i0 >= 0).sum())
                fused_pose = None  # re-anchored: redo the pose solve
            self._t("reloc", t0)

        # fallback: weak association with the ref keyframe → promote the
        # previous frame to keyframe and re-anchor. Guarded like the
        # reference's `_num_since_last_keyframe < 1` check
        # (map_builder.cc:218-236): never re-insert a frame that already IS
        # the reference keyframe (self-matching would duplicate every
        # landmark).
        if (
            num_match < self.cfg.keyframe.min_num_match
            and self._last_feats is not None
            and self._last_track_ok
            and self._last_frame_meta is not None
            and self._last_frame_meta[0] != int(self.map.kf_frame_id[self._ref_kf])
        ):
            self._promote_last_frame_to_keyframe()
            i0 = self.frontend.match(feats, self._ref_feats)
            num_match = int((i0 >= 0).sum())
            fused_pose = None  # re-anchored: redo the pose solve

        if fused_pose is not None:
            Twc, n_inl, inlier_row = fused_pose
        else:
            Twc, n_inl, inlier_row = self._pose_optimize(feats, i0)
        track_ok = n_inl >= max(self.cfg.keyframe.min_num_match, 10)
        if not track_ok:
            Twc = self._last_Twc.copy()
        self._lost_count = 0 if track_ok else self._lost_count + 1
        self._last_track_ok = track_ok
        self._last_Twc = Twc

        rec = FrameRecord(index, t, Twc, num_inliers=n_inl)
        # keyframe trigger uses the POST-optimization inlier count, exactly
        # like the reference feeding TrackFrame's return into AddKeyframe
        # (map_builder.cc:233,616-636)
        if track_ok and self._should_add_keyframe(Twc, index, n_inl):
            kf = self._insert_keyframe(index, t, Twc, feats, i0, inlier_row)
            rec.is_keyframe = True
            rec.kf_slot = kf
        return rec

    def _complete_stereo(self, feats: FrameFeatures) -> FrameFeatures:
        """Route through the frontend's deferred right-image extraction when
        it has one (NeuralFrontend in lazy-right mode); frontends without
        the method always deliver complete stereo."""
        if getattr(feats, "pending_right", None) is None:
            return feats
        cs = getattr(self.frontend, "complete_stereo", None)
        return cs(feats) if cs is not None else feats

    def _cap_new_landmarks(self, idx: np.ndarray) -> np.ndarray:
        """Saturate new-landmark creation at the map's fixed capacity: a
        sequence longer than the store degrades to extending/optimizing
        existing landmarks instead of crashing on the allocator assert.
        (The reference grows its pointer map unboundedly, map.cc:24-109.)"""
        room = self.map.points_remaining
        if len(idx) > room:
            if not self._capacity_warned:
                print(f"map point capacity reached ({self.map.n_pt}): new "
                      "landmark creation saturates; tracking continues on "
                      "the existing map")
                self._capacity_warned = True
            idx = idx[:room]
        return idx

    def _features_from_keyframe(self, kf: int) -> FrameFeatures:
        """Rebuild a matching-sufficient FrameFeatures view of a stored
        keyframe. After relocalization the new reference keyframe's live
        features are long gone; the map store holds everything temporal
        matching and pose optimization need (xy/score/desc/valid/meas)."""
        m = self.map
        meas = m.kf_meas[kf].copy()
        uR = meas[:, 2]
        disp = meas[:, 0] - uR
        depth = np.where(
            uR > 0, self.K.bf / np.maximum(disp, 1e-6), 0.0
        ).astype(np.float32)
        return FrameFeatures(
            xy=meas[:, :2].copy(),
            score=m.kf_score[kf].astype(np.float32),
            desc=m.kf_desc[kf].astype(np.float32),
            valid=m.kf_kpt_valid[kf].copy(),
            meas=meas,
            depth=depth,
        )

    def _pose_optimize(self, feats: FrameFeatures, i0: np.ndarray):
        """PnP init + pose-only LM against mappoints matched via the
        reference keyframe (FramePoseOptimization, map_builder.cc:509-611)."""
        K_cap = len(i0)
        ref_tracks = self.map.kf_track[self._ref_kf]
        j = np.maximum(i0, 0)
        pt = ref_tracks[j]
        valid = (
            (i0 >= 0) & feats.valid & (pt >= 0)
            & (self.map.pt_status[np.maximum(pt, 0)] == map_store.PT_GOOD)
        )
        pt_safe = np.where(valid, pt, 0)
        Xw = np.where(valid[:, None], self.map.pt_pos[pt_safe], 0.0)
        stereo = valid & (feats.meas[:, 2] > 0)
        meas = np.zeros((K_cap, 3))
        meas[:, :2] = np.where(valid[:, None], feats.xy, 0.0)
        meas[:, 2] = np.where(stereo, feats.meas[:, 2], 0.0)
        n_valid = int(valid.sum())
        if n_valid < 8:
            return self._last_Twc.copy(), 0, valid & False

        t0 = time.perf_counter()
        self.key, k = jax.random.split(self.key)
        pr = pnp.pnp_ransac(
            self.K, jnp.asarray(self._last_Twc), jnp.asarray(Xw),
            jnp.asarray(meas[:, :2]), jnp.asarray(valid), k,
        )
        Twc_init = np.asarray(se3.inverse(pr.Tcw))
        # sanity jump check ≙ map_builder.cc:517-521
        if (not bool(pr.ok)) or np.linalg.norm(
            Twc_init[:3, 3] - self._last_Twc[:3, 3]
        ) > 0.5:
            Twc_init = self._last_Twc.copy()
        tcfg = self.cfg.optimization.tracking
        out = pose_solver.optimize_pose(
            self.K, jnp.asarray(Twc_init), jnp.asarray(Xw), jnp.asarray(meas),
            jnp.asarray(stereo), jnp.asarray(valid),
            chi2_mono=tcfg.mono_point, chi2_stereo=tcfg.stereo_point,
        )
        self._t("pose_opt", t0)
        Twc = np.asarray(se3.inverse(out.Tcw))
        n_inl = int(out.num_inliers)
        # reject absurd jumps after LM as well
        if np.linalg.norm(Twc[:3, 3] - self._last_Twc[:3, 3]) > 0.5:
            Twc = self._last_Twc.copy()
        return Twc, n_inl, np.asarray(out.inlier)

    def _should_add_keyframe(self, Twc, index, num_match) -> bool:
        kf_cfg = self.cfg.keyframe
        last_kf_pose = self.map.kf_pose[self._ref_kf]
        dR = last_kf_pose[:3, :3].T @ Twc[:3, :3]
        d_angle = float(
            np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        )
        d_dist = float(np.linalg.norm(Twc[:3, 3] - last_kf_pose[:3, 3]))
        passed = index - int(self.map.kf_frame_id[self._ref_kf])
        return (
            num_match < kf_cfg.max_num_match
            or d_angle > kf_cfg.max_angle
            or d_dist > kf_cfg.max_distance
            or passed > kf_cfg.max_num_passed_frame
        )

    def _promote_last_frame_to_keyframe(self):
        """Tracking-degradation fallback: make the previous frame a keyframe
        and re-anchor tracking on it (map_builder.cc:218-236)."""
        if self._last_feats is None or self._last_frame_meta is None:
            return
        index, t, Twc = self._last_frame_meta
        feats = self._last_feats
        # associate by matching to the current ref keyframe, then
        # RE-OPTIMIZE the promoted frame's pose on those matches so its
        # observations are chi²-gated before they seed landmarks — the
        # reference re-extracts and re-optimizes too (map_builder.cc:
        # 218-236); trusting ungated matches exactly when tracking is
        # already weak would poison the map with outliers.
        i0 = self.frontend.match(feats, self._ref_feats)
        Twc_opt, n_inl, inlier_row = self._pose_optimize(feats, i0)
        if n_inl >= max(self.cfg.keyframe.min_num_match, 10):
            Twc = Twc_opt
        # when the solve is under-constrained, inlier_row is all-False:
        # no match is extended; only self-consistent fresh stereo landmarks
        # are created from the promoted frame
        self._insert_keyframe(index, t, Twc, feats, i0, inlier_row)

    # -------------------------------------------------------------- keyframe
    def _insert_keyframe(self, index, t, Twc, feats: FrameFeatures,
                         i0: np.ndarray, inlier_row: np.ndarray) -> int:
        t0 = time.perf_counter()
        # settle the previous keyframe's in-flight async solve BEFORE this
        # keyframe mutates the map: scatter_ba_result's outlier removal and
        # covisibility decay must target the exact map state its window was
        # gathered from, not one that since gained observations
        self.flush_ba()
        # lazy-right mode: run the deferred right-image extraction + stereo
        # association now, exactly where the reference does it
        # (InsertKeyframe → ExtractFeatureAndMatch, map_builder.cc:639-682)
        feats = self._complete_stereo(feats)
        has_lines = self.enable_lines and feats.lines is not None
        line_points = _members_to_lists(feats.line_members) if has_lines else None
        kf = self.map.add_keyframe(
            index, t, Twc, feats.meas, feats.valid, feats.desc, feats.score,
            lines=feats.lines if has_lines else None,
            lines_right=feats.lines_right if has_lines else None,
            line_valid=feats.line_valid if has_lines else None,
            line_has_right=feats.line_has_right if has_lines else None,
            line_points=line_points,
        )
        ref_tracks = self.map.kf_track[self._ref_kf]
        Rwc, twc = Twc[:3, :3], Twc[:3, 3]
        cam = self.cfg.camera
        # vectorized landmark categorization over the K keypoint slots
        # (≙ the per-feature branch in map.cc:40-73)
        K_cap = len(i0)
        valid = np.asarray(feats.valid, bool)
        j = np.asarray(i0)
        pt = np.where(j >= 0, ref_tracks[np.maximum(j, 0)], -1)
        status = self.map.pt_status[np.maximum(pt, 0)]
        inl_ok = (
            np.ones(K_cap, bool) if len(inlier_row) == 0
            else (np.asarray(inlier_row, bool) | (j < 0))
        )
        extend_good = valid & (pt >= 0) & (status == map_store.PT_GOOD) & inl_ok
        # local-map association (track_local_map): BEFORE spawning fresh
        # landmarks, try to re-associate unmatched keypoints with GOOD
        # landmarks of the covisible local map by projection + descriptor
        # (search_by_projection ≙ the reference's never-called
        # TrackLocalMap, map_builder.cc:684-785) — a missed temporal match
        # otherwise duplicates its landmark as a fresh stereo point
        rec_pt = np.full(K_cap, -1, np.int64)
        if self.cfg.pipeline.track_local_map:
            for p_, k_ in self._associate_local_map(
                    kf, np.where(extend_good, pt, -1)):
                if valid[k_] and not extend_good[k_] and rec_pt[k_] < 0:
                    rec_pt[k_] = p_
        recovered = rec_pt >= 0
        new_stereo = valid & ~extend_good & ~recovered & (feats.depth > 0)
        extend_pend = (valid & ~extend_good & ~recovered & ~new_stereo
                       & (pt >= 0) & (status == map_store.PT_UNTRIANGULATED))
        new_mono = (valid & ~extend_good & ~recovered & ~new_stereo
                    & ~extend_pend)
        idx = np.nonzero(recovered)[0]
        if len(idx):
            _, first = np.unique(rec_pt[idx], return_index=True)
            idx = idx[np.sort(first)]
            self.map.add_point_obs_batch(rec_pt[idx], kf, idx)

        # extend existing mappoints (map.cc:40-60); if several keypoints
        # resolved to the same landmark (degenerate matching), keep the first
        idx = np.nonzero(extend_good | extend_pend)[0]
        if len(idx):
            _, first = np.unique(pt[idx], return_index=True)
            idx = idx[np.sort(first)]
            self.map.add_point_obs_batch(pt[idx], kf, idx)
        # new stereo landmarks, back-projected in one batch (map.cc:61-73)
        idx = self._cap_new_landmarks(np.nonzero(new_stereo)[0])
        if len(idx):
            d = feats.depth[idx]
            pc = np.stack([
                (feats.xy[idx, 0] - cam.cx) / cam.fx * d,
                (feats.xy[idx, 1] - cam.cy) / cam.fy * d,
                d,
            ], -1)
            pw = pc @ Rwc.T + twc
            new_pts = self.map.new_mappoints_batch(pw, feats.desc[idx])
            self.map.add_point_obs_batch(new_pts, kf, idx)
        # mono-only keypoints → pending landmarks, multi-view triangulated
        # once ≥2 keyframes observe them
        idx = self._cap_new_landmarks(np.nonzero(new_mono)[0])
        if len(idx):
            new_pts = self.map.new_mappoints_batch(
                np.zeros((len(idx), 3)), feats.desc[idx],
                status=map_store.PT_UNTRIANGULATED,
            )
            self.map.add_point_obs_batch(new_pts, kf, idx)
        self._triangulate_pending_points(kf)
        if has_lines:
            self._process_keyframe_lines(kf, feats, i0)
            # stamp the frame's mapline associations for the overlay
            # renderer (visualization.draw_features colors matched lines
            # per track, like the reference's DrawFeatures utils.cc:52-66)
            feats.line_tracks = self.map.kf_line_track[kf].copy()
        self.map.update_covisibility(kf)
        self._t("kf_insert", t0)

        if self.enable_ba and self.map.n_kf >= 2:
            t0 = time.perf_counter()
            # (any in-flight solve was already settled at the top of this
            # method, before the map mutated)
            if self.cfg.pipeline.async_ba:
                self._dispatch_local_ba(kf)
            else:
                self._run_local_ba(kf)
            self._t("local_ba", t0)

        if self._loop_closure_on:
            t0 = time.perf_counter()
            lc = self.loop_detector.detect(self.map, kf)
            self._t("loop_detect", t0)
            if lc is not None:
                self.loop_constraints.append(lc)
                # a verified loop is actionable immediately: correct the
                # whole trajectory + rigidly re-anchor landmarks
                self.run_pose_graph()
                if self._global_ba_on_loop:
                    # polish the rigidly re-anchored landmarks with a
                    # full-map joint refinement
                    self.run_global_ba()

        self._ref_kf = kf
        self._ref_feats = feats
        return kf

    def _process_keyframe_lines(self, kf: int, feats: FrameFeatures,
                                i0: np.ndarray):
        """Line landmark management at keyframe insertion: temporal line
        matching against the reference keyframe via the point-vote matrix
        (TrackFrame → MatchLines, map_builder.cc:455), mapline
        creation/extension (map.cc:74-97), and points-based triangulation
        (TriangulateMaplineByMappoints, map.cc:341-419)."""
        from rspl_slam_tpu.ops import lines as lops

        nl = int(feats.line_valid.sum())
        if nl == 0:
            return
        # temporal line matching: votes from temporal point matches
        ref_members = None
        if (
            self._ref_feats is not None
            and self._ref_feats.line_members is not None
        ):
            ref_members = self._ref_feats.line_members
        line_match = np.full(nl, -1, np.int64)
        if self._ref_kf >= 0 and ref_members is not None and ref_members.shape[0]:
            nl_ref = int(self._ref_feats.line_valid.sum())
            line_match = lops.match_lines(
                feats.line_members[:nl], ref_members[:nl_ref], i0
            )
        ref_line_tracks = (
            self.map.kf_line_track[self._ref_kf]
            if self._ref_kf >= 0
            else np.full(1, -1, np.int64)
        )
        for li in range(nl):
            ln = -1
            if line_match[li] >= 0:
                cand = ref_line_tracks[line_match[li]]
                if cand >= 0 and self.map.ln_valid[cand]:
                    ln = int(cand)
            if ln < 0:
                if self.map.lines_remaining == 0:
                    continue  # capacity saturated (see _cap_new_landmarks)
                ln = self.map.new_mapline()
            self.map.add_line_obs(ln, kf, li)
        # (re)triangulate maplines observed here from their on-line mappoints
        self._triangulate_keyframe_maplines(kf, feats)

    def _mapline_support(self, ln: int):
        """Unique GOOD mappoints on all of mapline ``ln``'s observed 2D
        lines, with their multi-view repeat counts — one vectorized gather
        over the observation table (map.cc:341-379)."""
        m = self.map
        n = m.ln_obs_n[ln]
        if n == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        kfs = m.ln_obs_kf[ln, :n]
        lis = m.ln_obs_idx[ln, :n]
        ok = kfs >= 0
        kfs, lis = kfs[ok], lis[ok]
        ks = m.kf_line_points[kfs, lis]  # (n, 32) keypoint slots
        pts = m.kf_track[kfs[:, None], np.maximum(ks, 0)]
        good = (ks >= 0) & (pts >= 0)
        flat = pts[good]
        flat = flat[m.pt_status[flat] == map_store.PT_GOOD]
        return np.unique(flat, return_counts=True)

    def _gather_mapline_points(self, ln: int) -> np.ndarray:
        """Mappoint positions supporting a mapline. Points seen on the line
        from ≥2 viewpoints are preferred — accidental projective members
        differ between viewpoints, true on-line points repeat."""
        uniq, counts = self._mapline_support(ln)
        multi = uniq[counts >= 2]
        pts_idx = multi if len(multi) >= 3 else uniq
        return self.map.pt_pos[pts_idx]

    def _triangulate_keyframe_maplines(self, kf: int, feats: FrameFeatures):
        """(Re)fit 3D lines for every mapline observed by this keyframe in
        ONE vmapped device call — the per-line Python dispatch loop this
        replaces cost up to max_lines round trips per keyframe insertion
        (≙ the reference's per-line TriangulateMaplineByMappoints loop,
        map.cc:74-97, which is serial CPU)."""
        import jax
        import jax.numpy as jnp

        from rspl_slam_tpu.geometry import triangulation as tri

        nl = int(feats.line_valid.sum())
        P = 32
        lns, arrs, masks = [], [], []
        for li in range(nl):
            ln = self.map.kf_line_track[kf, li]
            if ln < 0:
                continue
            pts = self._gather_mapline_points(ln)
            # single-observation fits are projectively ambiguous — require a
            # second viewpoint before accepting a 3D line
            if len(pts) < 3 or self.map.ln_obs_n[ln] < 2:
                continue
            arr = np.zeros((P, 3))
            n = min(len(pts), P)
            arr[:n] = np.asarray(pts)[:n]
            lns.append(int(ln))
            arrs.append(arr)
            masks.append(np.arange(P) < n)
        if not lns:
            return
        arr_b, mask_b = _pad_pow2_batch(arrs, masks, P)
        B = len(mask_b)
        buf = np.asarray(_fit_lines_packed(arr_b, mask_b))  # one round trip
        L = buf[: 6 * B].reshape(B, 6)
        eps = buf[6 * B: 12 * B].reshape(B, 2, 3)
        ok = buf[12 * B:] > 0.5
        for i, ln in enumerate(lns):
            if ok[i]:
                self.map.ln_plucker[ln] = L[i]
                self.map.ln_endpoints[ln] = eps[i]
                self.map.ln_has_endpoints[ln] = True

    def _associate_local_map(self, kf: int,
                             matched_pts: np.ndarray) -> list:
        """Candidate (pt, kpt) re-associations for keyframe ``kf``:
        project GOOD mappoints seen by the CURRENT local map (the
        reference keyframe + its covisible neighbors — ``kf`` itself has
        no covisibility yet) into ``kf`` and match them to keypoints by
        descriptor (search_by_projection, ≙ map.cc:952-1005 — machinery
        the reference defines but never calls, map_builder.cc:684-785).
        ``matched_pts`` (landmark per keypoint slot, −1 = none) excludes
        landmarks the temporal match already resolved."""
        m = self.map
        anchor = self._ref_kf
        neigh = np.unique(np.concatenate(
            [[anchor], m.neighbor_keyframes(anchor, max_n=9)])).astype(int)
        seen = m.kf_track[neigh]
        cand = np.unique(seen[seen >= 0])
        cand = cand[~np.isin(cand, matched_pts[matched_pts >= 0])]
        if len(cand) == 0:
            return []
        return m.search_by_projection(kf, cand)

    def _triangulate_pending_points(self, kf: int):
        """Batch multi-view triangulation of untriangulated mappoints that
        gained their ≥2nd observation (TriangulateMappoint, map.cc:292-339):
        gather rays per candidate, vmap the bearing least-squares kernel,
        promote successes to GOOD."""
        import jax.numpy as jnp

        cam = self.cfg.camera
        tracks = self.map.kf_track[kf]
        cand = tracks[(tracks >= 0)]
        cand = np.unique(cand[self.map.pt_status[cand] == map_store.PT_UNTRIANGULATED])
        cand = cand[self.map.pt_obs_n[cand] >= 2]
        if len(cand) == 0:
            return
        okf = self.map.pt_obs_kf[cand]  # (n, MAX_OBS)
        okp = self.map.pt_obs_kpt[cand]
        mask = okf >= 0
        uv = self.map.kf_meas[np.maximum(okf, 0), np.maximum(okp, 0), :2]
        uvn = np.where(
            mask[..., None],
            (uv - [cam.cx, cam.cy]) / [cam.fx, cam.fy],
            0.0,
        ).astype(np.float32)
        # observer poses go up as a pow-2-padded pose TABLE (F, 4, 4) +
        # int32 indices, gathered on device (everything is f32 under jit
        # anyway; the old per-observation f64 pose upload was ~1 MB per
        # keyframe of mostly repeated rows)
        n_kf = self.map.n_kf
        Fp = max(16, 1 << (n_kf - 1).bit_length() if n_kf > 1 else 1)
        pose_table = np.tile(np.eye(4, dtype=np.float32), (Fp, 1, 1))
        pose_table[:n_kf] = self.map.kf_pose[:n_kf]
        okf_i = np.maximum(okf, 0).astype(np.int32)
        # pad the candidate dim to a power of two with a generous floor:
        # one or two compiled graphs total instead of per distinct
        # candidate count; padded rows have all-False masks (→ ok False)
        n = len(cand)
        B = max(512, 1 << (n - 1).bit_length() if n > 1 else 1)
        if B > n:
            okf_i = np.concatenate(
                [okf_i, np.zeros((B - n, okf_i.shape[1]), np.int32)])
            uvn = np.concatenate(
                [uvn, np.zeros((B - n,) + uvn.shape[1:], np.float32)])
            mask = np.concatenate(
                [mask, np.zeros((B - n, mask.shape[1]), bool)])
        buf = np.asarray(
            _tri_points_packed(pose_table, okf_i, uvn, mask))  # 1 round trip
        pts = buf[: 3 * B].reshape(B, 3)[:n]
        ok = (buf[3 * B:] > 0.5)[:n]
        sel = cand[ok]
        self.map.pt_pos[sel] = pts[ok]
        self.map.pt_status[sel] = map_store.PT_GOOD
        # refresh representative descriptors of multi-view points
        self.map.update_mappoint_descriptors(sel)

    def gather_ba_problem(self, center_kf: int):
        """Assemble the BA window around ``center_kf`` as (BAProblem,
        mapping), or (None, None) when under-constrained. Split out so the
        multi-sequence runner can batch windows from several maps into one
        device call (parallel/multi_sequence.py)."""
        p = self.cfg.pipeline
        o = self.cfg.optimization
        self.flush_ba()  # settle any in-flight window before gathering
        problem_np, mapping = self.map.gather_ba_window(
            center_kf,
            max_frames=o.max_window_keyframes,
            max_points=p.ba_max_points,
            max_lines_w=p.ba_max_lines,
            cp_capacity=p.ba_max_points * 4,
            cl_capacity=p.ba_max_lines * 4,
        )
        if mapping["ncp"] < 30:
            return None, None
        # keep the problem as HOST numpy: the jitted solver transfers the
        # arguments as part of its dispatch, where per-field jnp.asarray
        # uploads would each pay a round trip on a tunneled device
        prob = local_ba.BAProblem(**problem_np)
        return prob, mapping

    def apply_ba_result(self, result, mapping, center_kf: int):
        result = local_ba.fetch_result(result)  # ONE packed download
        self.map.scatter_ba_result(result, mapping)
        self._refresh_line_endpoints(mapping["lns"])
        # keep the tracking anchor pose in sync with the optimized map
        self._last_Twc = self.map.kf_pose[center_kf].copy()

    def _solve_local_ba(self, center_kf: int):
        """Dispatch the window solve; returns (device_result, mapping) or
        (None, None). Does NOT fetch — JAX dispatch is async, so the
        caller chooses when to synchronize."""
        prob, mapping = self.gather_ba_problem(center_kf)
        if prob is None:
            return None, None
        o = self.cfg.optimization
        bcfg = o.backend
        result = local_ba.optimize_local_map(
            self.K, prob,
            chi2_mono=bcfg.mono_point, chi2_stereo=bcfg.stereo_point,
            chi2_mono_line=bcfg.mono_line, chi2_stereo_line=bcfg.stereo_line,
            iters1=o.ba_iters_phase1, iters2=o.ba_iters_phase2,
        )
        return result, mapping

    def _run_local_ba(self, center_kf: int):
        result, mapping = self._solve_local_ba(center_kf)
        if result is None:
            return
        self.apply_ba_result(result, mapping, center_kf)

    def _dispatch_local_ba(self, center_kf: int):
        """Async mode: leave the solve in flight AND fetch its result on a
        background thread — the blocking device→host download (a full
        round trip on a tunneled device) overlaps the next frames'
        tracking instead of stalling the next keyframe's flush. The thread
        only downloads; all map mutation stays on the tracking thread at
        :meth:`flush_ba`."""
        result, mapping = self._solve_local_ba(center_kf)
        if result is None:
            return
        holder: dict = {}

        def _fetch():
            try:
                holder["result"] = local_ba.fetch_result(result)
            except BaseException as e:  # surfaced at flush_ba
                holder["error"] = e

        t = threading.Thread(target=_fetch, daemon=True, name="ba-fetch")
        t.start()
        self._pending_ba = (holder, t, mapping, center_kf)

    def flush_ba(self):
        """Join + scatter an in-flight async BA result, if any. Called
        before the next window gather, any global backend pass, culling,
        and map/trajectory saves; harmless no-op otherwise."""
        if self._pending_ba is None:
            return
        holder, t, mapping, center_kf = self._pending_ba
        self._pending_ba = None
        t0 = time.perf_counter()
        t.join()
        if "error" in holder:
            raise holder["error"]
        self.map.scatter_ba_result(holder["result"], mapping)
        self._refresh_line_endpoints(mapping["lns"])
        # deliberately NOT re-anchoring _last_Twc here: tracking has moved
        # past the solved window's center; teleporting the anchor back
        # would corrupt the current frame's prior
        self._t("ba_apply", t0)

    def _refresh_line_endpoints(self, lns: np.ndarray):
        """After BA, refresh cartesian endpoints of optimized maplines from
        their supporting mappoints (UpdateMaplineEndpoints, map.cc:121-269)
        — one vmapped device call over the window's lines instead of a
        per-line dispatch loop."""
        import jax
        import jax.numpy as jnp

        from rspl_slam_tpu.geometry import triangulation as tri

        P = 32
        keep, arrs, masks = [], [], []
        for ln in lns:
            uniq, _ = self._mapline_support(ln)
            pts = self.map.pt_pos[uniq]
            if len(pts) < 2:
                continue
            arr = np.zeros((P, 3))
            n = min(len(pts), P)
            arr[:n] = np.asarray(pts)[:n]
            keep.append(int(ln))
            arrs.append(arr)
            masks.append(np.arange(P) < n)
        if not keep:
            return
        arr_b, mask_b = _pad_pow2_batch(arrs, masks, P)
        B = len(mask_b)
        plk = np.zeros((B, 6))
        plk[: len(keep)] = self.map.ln_plucker[np.asarray(keep)]
        plk[len(keep):, 3] = 1.0  # unit direction keeps padded rows finite
        buf = np.asarray(_line_endpoints_packed(plk, arr_b, mask_b))
        eps = buf[: 6 * B].reshape(B, 2, 3)
        ok = buf[6 * B:] > 0.5
        for i, ln in enumerate(keep):
            if ok[i]:
                self.map.ln_endpoints[ln] = eps[i]

    # -------------------------------------------------------------- culling
    def cull_redundant_keyframes(self, min_other_obs: int = 3,
                                 ratio: float = 0.9,
                                 keep_recent: int = 3) -> int:
        """Remove keyframes whose GOOD landmarks are ≥``ratio`` covered by
        ≥``min_other_obs`` other keyframes — bounds map growth for
        life-long operation (the reference has no culling; its map grows
        unboundedly). Never culls the gauge/fixed frames, the current
        tracking anchor, or the ``keep_recent`` newest keyframes. Returns
        the number culled."""
        self.flush_ba()
        m = self.map
        if m.n_kf < keep_recent + 2:
            return 0
        protect = {self._ref_kf} | set(
            range(max(0, m.n_kf - keep_recent), m.n_kf)
        )
        victims = m.find_redundant_keyframes(
            min_other_obs=min_other_obs, ratio=ratio, protect=protect,
        )
        for k in victims:
            m.cull_keyframe(int(k))
        return len(victims)

    # ------------------------------------------------------------- global BA
    def run_global_ba(self, mesh=None, min_keyframes: int = 3,
                      iters1: int | None = None, iters2: int | None = None):
        """Full-map bundle adjustment: ALL keyframes, points and lines
        optimized jointly — a capability the reference lacks (its
        consistency ends at the ~9-keyframe covisibility window,
        map.cc:471-525). Runs the same two-phase Huber/chi²-gated LM as the
        local solver; capacities are rounded to powers of two so repeated
        calls at growing map sizes reuse a handful of compiled graphs.

        With ``mesh`` (a jax Mesh with a "data" axis), the constraint
        dimension is sharded over the devices and each LM step's
        normal-equation assembly is psum-reduced across them
        (parallel/dist_ba.sharded_constraints_ba) — this is the path that
        scales full-map refinement beyond one chip. Returns the final cost,
        or None when the map is too small.

        Constraints are gathered from the COMPLETE back-pointer tables
        (``full_obs``), not the per-landmark MAX_OBS (16) rings — so on
        loops longer than 16 keyframes the joint refinement really does use
        every surviving observation of every landmark (the rings only bound
        the LOCAL windows, where ≤10 frames can never overflow them)."""
        self.flush_ba()
        m = self.map
        if m.n_kf < min_keyframes:
            return None
        t0 = time.perf_counter()
        frames = np.nonzero(m.kf_valid[: m.n_kf])[0]

        def pow2(n, lo):
            return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))

        good = m.pt_status[: m.n_pt] == map_store.PT_GOOD
        # observation counts from the full back-pointer tables (can exceed
        # the rings' MAX_OBS-per-landmark total on long loops)
        tr = m.kf_track[frames]
        p_all = tr[tr >= 0]
        n_obs = int((m.pt_status[p_all] == map_store.PT_GOOD).sum())
        n_lobs = int((m.kf_line_track[frames] >= 0).sum())
        F = pow2(len(frames), 4)
        P = pow2(int(good.sum()), 64)
        L = pow2(max(m.n_ln, 1), 8)
        CP = pow2(n_obs, 128)
        CL = pow2(max(n_lobs, 1), 32)
        problem_np, mapping = m.gather_ba_window(
            int(frames[-1]), F, P, L, CP, CL, frames=frames, full_obs=True,
        )
        if mapping["ncp"] < 30:
            return None
        prob = local_ba.BAProblem(**{
            k: jnp.asarray(v) for k, v in problem_np.items()
        })
        o = self.cfg.optimization
        bcfg = o.backend
        kw = dict(
            chi2_mono=bcfg.mono_point, chi2_stereo=bcfg.stereo_point,
            chi2_mono_line=bcfg.mono_line, chi2_stereo_line=bcfg.stereo_line,
            iters1=o.ba_iters_phase1 if iters1 is None else iters1,
            iters2=o.ba_iters_phase2 if iters2 is None else iters2,
        )
        if mesh is not None:
            from rspl_slam_tpu.parallel import dist_ba

            ndev = mesh.shape["data"]
            prob = dist_ba.pad_constraints(prob, ndev)
            result = dist_ba.sharded_constraints_ba(self.K, prob, mesh, **kw)
        else:
            result = local_ba.optimize_local_map(self.K, prob, **kw)
        self.apply_ba_result(result, mapping, int(frames[-1]))
        self._t("global_ba", t0)
        return float(result.cost)

    # ------------------------------------------------------------ pose graph
    def run_pose_graph(self, min_weight: int = 10, iters: int = 20,
                       require_loops: bool = True):
        """Global pose-graph optimization over all keyframes (a capability
        the reference lacks — its consistency ends at the local BA window).
        Builds relative-pose constraints from covisibility + odometry PLUS
        the measured loop-closure constraints accumulated by the detector,
        solves with the jitted LM PGO (backend/pose_graph.py), and rigidly
        re-anchors landmarks to the corrected keyframe poses.

        Without loop constraints the covisibility/odometry graph is built
        from the current estimates and is already at its optimum — by
        default the solve is skipped then (``require_loops``) rather than
        perturbing a converged map with solver noise."""
        from rspl_slam_tpu.backend import pose_graph as pg

        self.flush_ba()
        m = self.map
        if m.n_kf < 3:
            return None
        if require_loops and not self.loop_constraints:
            return None
        t0 = time.perf_counter()
        prob = pg.relative_constraints_from_covisibility(
            m.kf_pose, np.maximum(m.covis, m.covis.T), m.n_kf,
            min_weight=min_weight, loops=self.loop_constraints,
        )
        res = pg.optimize_pose_graph(prob, iters=iters)
        new_Twc = np.linalg.inv(np.asarray(res.Tcw))
        m.apply_pose_corrections(new_Twc)
        self._last_Twc = m.kf_pose[m.n_kf - 1].copy()
        self._t("pose_graph", t0)
        return float(res.cost)

    def _t(self, name, t0):
        self.timings.setdefault(name, []).append(time.perf_counter() - t0)

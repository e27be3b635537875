"""Combined per-frame step: extraction AND tracking in ONE dispatch chain.

The pipelined r04 loop ran two fused dispatch chains per tracked frame —
extract (image upload + execute) and track (state upload + execute + packed
fetch) — each chain paying tunnel round trips. But extraction and tracking
of the SAME frame are strictly data-dependent, so they compose into one
graph: upload the left image + the per-frame host state, execute SuperPoint
(+RCF+Hough) → match → associate → PnP → pose LM, and fetch ONE buffer
holding both the frame's features and the tracking result. This is the
transfer-optimal schedule on a tunneled device and the dispatch-minimal
schedule everywhere (bench.py's frame_step_lazy + track_core, now the
production path).

The reference's closest analogue is its per-frame stage-A + stage-B split
(map_builder.cc:72-262) — two threads with a queue; here the equivalent
overlap comes from JAX's async dispatch, and the split would only add
round trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.frontend import frontends as fe_mod
from rspl_slam_tpu.frontend.frontends import FrameFeatures
from rspl_slam_tpu.fused_track import fused_track_core

__all__ = ["CombinedTracker"]


@partial(jax.jit, static_argnames=(
    "match_fn", "Kc", "sp_cfg", "ds", "min_len", "inlier_dist", "max_segs",
    "use_lines", "chi2_mono", "chi2_stereo", "compute_dtype"))
def _combined_frame_step(
    match_fn, m_params, sp_params, rcf_params,
    Kc: CameraIntrinsics,
    img,  # (1, H, W) uint8/float left image (np: upload rides dispatch)
    maps,  # (1, H, W, 2) rectify maps or None
    r_xy, r_score, r_desc, r_valid,  # reference keyframe features (device)
    host,  # (K*4 + 17,) [ref_pos(K,3); ref_good(K); Twc_last(16); seed]
    sp_cfg, ds: int, min_len: float, inlier_dist: float, max_segs: int,
    use_lines: bool, chi2_mono: float, chi2_stereo: float, compute_dtype,
):
    feats, packed_extract = fe_mod.lazy_extract_core(
        sp_params, rcf_params, img, maps, sp_cfg, ds, min_len, inlier_dist,
        max_segs, use_lines, compute_dtype,
    )
    Kp = feats.xy.shape[1]
    ref_pos = host[: 3 * Kp].reshape(Kp, 3)
    ref_good = host[3 * Kp: 4 * Kp] > 0.5
    Twc_last = host[4 * Kp: 4 * Kp + 16].reshape(4, 4)
    key = jax.random.PRNGKey(host[4 * Kp + 16].astype(jnp.int32))
    # lazy schedule: tracked frames have no stereo yet (all-mono, exactly
    # like the reference's non-keyframe frames, map_builder.cc:165-166)
    q_ur = jnp.full((Kp,), -1.0, jnp.float32)
    packed_track = fused_track_core(
        match_fn, m_params, Kc,
        feats.xy[0], feats.score[0], feats.desc[0], feats.valid[0],
        r_xy, r_score, r_desc, r_valid,
        q_ur, ref_pos, ref_good, Twc_last, key, chi2_mono, chi2_stereo,
    )
    # transfer split: the per-frame fetch carries only what the host needs
    # EVERY frame ([xy, score, valid] rows + the line section + the track
    # result, ~10 KB); the (K, D) descriptor block — ~400 KB/frame at
    # EuRoC scale, consumed on the host only when the frame becomes a
    # keyframe — stays device-resident and returns as a separate f16
    # handle (the map stores descriptors as f16 anyway)
    D = feats.desc.shape[-1]
    row = 4 + D
    fk = packed_extract[: Kp * row].reshape(Kp, row)
    small = jnp.concatenate(
        [fk[:, :4].reshape(-1), packed_extract[Kp * row:], packed_track])
    return feats, small, feats.desc[0].astype(jnp.float16)


class CombinedTracker:
    """One dispatch chain per tracked frame for a lazy-mode NeuralFrontend:
    binds the frontend's extraction params/matcher with the solver config,
    caches the reference keyframe's device features, and parses the single
    combined fetch into (FrameFeatures, i0, pose result)."""

    def __init__(self, frontend, Kc: CameraIntrinsics, chi2_mono: float,
                 chi2_stereo: float):
        self.fe = frontend
        self.Kc = Kc
        self.chi2 = (float(chi2_mono), float(chi2_stereo))
        self._ref_obj = None  # strong ref: identity stays valid while held
        self._ref_dev = None
        self._seed = 0

    def supported(self, feats_ref) -> bool:
        fe = self.fe
        if not getattr(fe, "lazy_right", False):
            return False
        if getattr(fe, "_orej", False):
            return False  # epipolar rejection lives on the host match path
        ld = fe.cfg.line_detector
        ds = max(1, int(getattr(ld, "downsample", 1)))
        cam = fe.cfg.camera
        if fe.use_lines and not (
            ds > 1 and ld.rcf_at_detection_scale
            and cam.image_height % (4 * ds) == 0
            and cam.image_width % (4 * ds) == 0
        ):
            return False
        return True

    def _ref_arrays(self, ref_feats):
        # strong-ref identity cache — see FusedTracker._ref_arrays: a stored
        # id() of a garbage-collected FrameFeatures can collide with a
        # recycled address; holding the object makes ``is`` sound
        if self._ref_obj is not ref_feats:
            if getattr(ref_feats, "dev", None) is not None:
                self._ref_dev = ref_feats.dev
            else:
                self._ref_dev = tuple(jnp.asarray(np.asarray(a)) for a in (
                    ref_feats.xy, ref_feats.score, ref_feats.desc,
                    ref_feats.valid,
                ))
            self._ref_obj = ref_feats
        return self._ref_dev

    def step(self, img_l: np.ndarray, img_r: np.ndarray, ref_feats,
             ref_pos: np.ndarray, ref_good: np.ndarray,
             Twc_last: np.ndarray):
        """Returns (FrameFeatures [materialized], i0, Twc, n_inl, inlier)."""
        fe = self.fe
        ld = fe.cfg.line_detector
        ds = max(1, int(getattr(ld, "downsample", 1)))
        K = fe.cfg.superpoint.max_keypoints
        map_l = None if fe._rect_maps is None else fe._rect_maps[:1]
        r_xy, r_score, r_desc, r_valid = self._ref_arrays(ref_feats)
        self._seed = (self._seed + 1) % (1 << 22)
        host = np.empty(4 * K + 17, np.float32)
        host[: 3 * K] = np.asarray(ref_pos, np.float32).reshape(-1)
        host[3 * K: 4 * K] = ref_good
        host[4 * K: 4 * K + 16] = np.asarray(
            Twc_last, np.float32).reshape(-1)
        host[4 * K + 16] = self._seed
        il_u8 = fe_mod._host_to_u8(img_l)[None]
        feats, packed, desc_dev = _combined_frame_step(
            fe._graph_match_fn, fe._graph_match_params, fe.sp_params,
            fe.rcf_params if fe.use_lines else (),
            self.Kc, il_u8, map_l,
            r_xy, r_score, r_desc, r_valid, host,
            fe.cfg.superpoint, ds, float(ld.length_threshold),
            float(ld.distance_threshold), int(ld.max_lines), fe.use_lines,
            self.chi2[0], self.chi2[1], fe.compute_dtype,
        )
        buf = np.asarray(packed)  # THE round trip of this frame (~10 KB)
        D = feats.desc.shape[-1]
        n_extract = K * 4 + (5 * int(ld.max_lines) if fe.use_lines else 0)
        unpack = fe.make_lazy_unpack(D, ds, with_desc=False)
        fields = unpack(buf[:n_extract])
        ff = FrameFeatures(
            pending_right=fe_mod._host_to_u8(img_r),
            dev=(feats.xy[0], feats.score[0], feats.desc[0],
                 feats.valid[0]),
            # host descriptors materialize from this f16 device handle
            # only when the frame becomes a keyframe (~1 in 10)
            packed=desc_dev,
            unpack=lambda b: {"desc": np.asarray(b, np.float32)},
            **fields,
        )
        if fe.keep_images:
            ff.image = np.asarray(fe_mod._prep_image(il_u8, map_l)[0])
        tb = buf[n_extract:]
        i0 = tb[:K].astype(np.int64)
        inlier = tb[K: 2 * K] > 0.5
        Twc = tb[2 * K: 2 * K + 16].reshape(4, 4).astype(np.float64)
        n_inl = int(tb[2 * K + 16])
        return ff, i0, Twc, n_inl, inlier

"""Fused per-frame tracking step: temporal matching + map association +
PnP-RANSAC + pose-only LM in ONE device dispatch, ONE packed host→device
upload, and ONE packed device→host download.

The serial host loop this replaces (slam.py r03) issued three dispatches
per tracked frame with host synchronization between them —
``frontend.match`` → host gather of matched mappoints → ``pnp_ransac`` →
``optimize_pose``. On a tunneled device every dispatch AND every
materialized output array is a blocking round trip (~25 ms RTT measured),
so the transfer schedule is as load-bearing as the compute schedule:

- query features stay DEVICE-RESIDENT from extraction (FrameFeatures.dev)
  — the descriptor block is never re-uploaded;
- the per-frame host state (stereo uR column, the reference keyframe's
  landmark table, the prior pose, the RANSAC seed) is packed into one
  f32 buffer;
- every host-bound result (match indices, inlier mask, optimized pose,
  inlier count) comes back in one f32 vector.

The reference has the same logical structure serially on CPU/GPU
(TrackFrame: MatchingPoints → SolvePnPWithCV → FrameOptimization,
map_builder.cc:448-611). The PnP sanity jump check (map_builder.cc:
517-521) runs in-graph as a ``where`` on the translation delta; the
post-LM jump check stays on the host (slam.py) because the fallback
decision feeds host-side keyframe policy anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.backend import pnp, pose_solver
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.geometry import se3

__all__ = ["FusedTracker"]


def fused_track_core(
    match_fn,
    sg_params,
    K: CameraIntrinsics,
    q_xy, q_score, q_desc, q_valid,  # (Kp,...) query features (traced)
    r_xy, r_score, r_desc, r_valid,  # reference keyframe features
    q_ur,  # (Kp,) right-image u column (−1 = mono)
    ref_pos, ref_good, Twc_last, key,
    chi2_mono: float,
    chi2_stereo: float,
):
    """Matching + association + PnP + pose LM, traceable inside a larger
    graph. Returns the packed track vector [i0; inlier; Twc(16); n_inl]."""
    i0 = match_fn(
        sg_params,
        q_xy[None], q_score[None], q_desc[None], q_valid[None],
        r_xy[None], r_score[None], r_desc[None], r_valid[None],
    )[0]
    j = jnp.maximum(i0, 0)
    valid = (i0 >= 0) & q_valid & ref_good[j]
    Xw = jnp.where(valid[:, None], ref_pos[j], 0.0)
    stereo = valid & (q_ur > 0)
    meas = jnp.concatenate(
        [jnp.where(valid[:, None], q_xy, 0.0),
         jnp.where(stereo, q_ur, 0.0)[:, None]], -1,
    )
    n_valid = jnp.sum(valid.astype(jnp.int32))

    pr = pnp.pnp_ransac(K, Twc_last, Xw, meas[:, :2], valid, key)
    Twc_pnp = se3.inverse(pr.Tcw)
    jump = jnp.linalg.norm(Twc_pnp[:3, 3] - Twc_last[:3, 3])
    use_prior = (~pr.ok) | (jump > 0.5)  # ≙ map_builder.cc:517-521
    Twc_init = jnp.where(use_prior, Twc_last, Twc_pnp)

    out = pose_solver.optimize_pose(
        K, Twc_init, Xw, meas, stereo, valid,
        chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
    )
    # under-constrained (<8 correspondences): hold the last pose, report
    # zero inliers — the host's slow path does exactly this (slam.py)
    enough = n_valid >= 8
    Twc_opt = jnp.where(enough, se3.inverse(out.Tcw), Twc_last)
    n_inl = jnp.where(enough, out.num_inliers, 0)
    inlier = out.inlier & enough
    f32 = jnp.float32
    return jnp.concatenate([
        i0.astype(f32), inlier.astype(f32), Twc_opt.reshape(16).astype(f32),
        n_inl[None].astype(f32),
    ])


@partial(jax.jit, static_argnames=("match_fn", "chi2_mono", "chi2_stereo"))
def _fused_step(
    match_fn,
    sg_params,
    K: CameraIntrinsics,
    q_xy, q_score, q_desc, q_valid,  # (Kp,...) query features (device)
    r_xy, r_score, r_desc, r_valid,  # reference keyframe features (device)
    host,  # (Kp*5 + 17,) packed host state: [uR; ref_pos; ref_good;
    #        Twc_last(16); seed]
    chi2_mono: float,
    chi2_stereo: float,
):
    Kp = q_xy.shape[0]
    q_ur = host[:Kp]
    ref_pos = host[Kp: 4 * Kp].reshape(Kp, 3)
    ref_good = host[4 * Kp: 5 * Kp] > 0.5
    Twc_last = host[5 * Kp: 5 * Kp + 16].reshape(4, 4)
    key = jax.random.PRNGKey(host[5 * Kp + 16].astype(jnp.int32))
    return fused_track_core(
        match_fn, sg_params, K, q_xy, q_score, q_desc, q_valid,
        r_xy, r_score, r_desc, r_valid, q_ur, ref_pos, ref_good, Twc_last,
        key, chi2_mono, chi2_stereo,
    )


class FusedTracker:
    """Binds a NeuralFrontend's matcher + the camera/opt config into the
    one-dispatch tracking step, and caches the reference keyframe's
    features on device (re-uploaded only when the reference changes)."""

    def __init__(self, frontend, K: CameraIntrinsics, chi2_mono: float,
                 chi2_stereo: float):
        self.K = K
        self.chi2 = (float(chi2_mono), float(chi2_stereo))
        # reuse the frontend's in-graph matcher closure so this step and
        # the fused keyframe completion share one compiled matcher family
        self._match_fn = frontend._graph_match_fn
        self._params = frontend._graph_match_params
        self._ref_obj = None  # strong ref: identity stays valid while held
        self._ref_dev = None
        self._seed = 0

    def _ref_arrays(self, ref_feats):
        """Device copies of the reference keyframe features, cached by
        object identity (one upload per keyframe change). The cache holds a
        STRONG reference to the keyed object — comparing ``is`` against a
        live object is sound, whereas a stored ``id()`` of a dead one can
        collide with a recycled address and silently track against the
        wrong keyframe's features."""
        if self._ref_obj is not ref_feats:
            if getattr(ref_feats, "dev", None) is not None:
                self._ref_dev = ref_feats.dev  # already device-resident
            else:
                self._ref_dev = tuple(jnp.asarray(np.asarray(a)) for a in (
                    ref_feats.xy, ref_feats.score, ref_feats.desc,
                    ref_feats.valid,
                ))
            self._ref_obj = ref_feats
        return self._ref_dev

    def track(self, feats, ref_feats, ref_pos: np.ndarray,
              ref_good: np.ndarray, Twc_last: np.ndarray):
        """One fused dispatch: one packed upload, one packed download.
        Returns host (i0, Twc, n_inliers, inlier)."""
        r_xy, r_score, r_desc, r_valid = self._ref_arrays(ref_feats)
        if feats.dev is not None:
            # device-resident features from extraction: no re-upload
            q_xy, q_score, q_desc, q_valid = feats.dev
        else:
            q_xy, q_score, q_desc, q_valid = (
                jnp.asarray(feats.xy), jnp.asarray(feats.score),
                jnp.asarray(feats.desc), jnp.asarray(feats.valid))
        self._seed = (self._seed + 1) % (1 << 22)
        Kp = int(q_xy.shape[0])
        host = np.empty(5 * Kp + 17, np.float32)
        ur = feats.stereo_ur() if hasattr(feats, "stereo_ur") else \
            feats.meas[:, 2]
        host[:Kp] = -1.0 if ur is None else ur
        host[Kp: 4 * Kp] = np.asarray(ref_pos, np.float32).reshape(-1)
        host[4 * Kp: 5 * Kp] = ref_good
        host[5 * Kp: 5 * Kp + 16] = np.asarray(
            Twc_last, np.float32).reshape(-1)
        host[5 * Kp + 16] = self._seed
        packed = _fused_step(
            self._match_fn, self._params, self.K,
            q_xy, q_score, q_desc, q_valid,
            r_xy, r_score, r_desc, r_valid,
            host,  # np: uploads as part of the dispatch, no separate RPC
            chi2_mono=self.chi2[0], chi2_stereo=self.chi2[1],
        )
        buf = np.asarray(packed)  # the single blocking round trip
        i0 = buf[:Kp].astype(np.int64)
        inlier = buf[Kp: 2 * Kp] > 0.5
        Twc = buf[2 * Kp: 2 * Kp + 16].reshape(4, 4).astype(np.float64)
        n_inl = int(buf[2 * Kp + 16])
        return i0, Twc, n_inl, inlier

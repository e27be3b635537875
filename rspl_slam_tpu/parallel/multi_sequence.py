"""Multi-sequence batched mapping — N sequences SLAM'd concurrently with
their device work batched (and sharded over the mesh).

This is BASELINE config 5 ("multi-sequence batched mapping: keyframes
sharded over hosts, distributed Schur BA") at the single-host level: the
reference could only ever process one sequence per process; here N maps
advance in lockstep and every device stage is one batched call:

- extraction: all 2N stereo images in ONE SuperPoint dispatch;
- matching: the N stereo pairs + N temporal pairs in ONE SuperGlue
  dispatch (B=2N), sharded over the mesh's ``data`` axis;
- bundle adjustment: windows from sequences that inserted a keyframe this
  step are stacked and solved by ``batched_windows_ba`` (vmapped +
  sharded) in one dispatch.

Host-side tracking/map bookkeeping stays per-sequence (cheap numpy).
Across hosts, run one MultiSequenceSLAM per host on its own sequence shard
(parallel/multihost.local_batch_slice) — covisibility/culling then stays
host-local exactly as the north star prescribes.
"""

from __future__ import annotations

import numpy as np

from rspl_slam_tpu.backend import local_ba
from rspl_slam_tpu.config import SystemConfig
from rspl_slam_tpu.frontend.frontends import FrameFeatures, _stereo_associate
from rspl_slam_tpu.slam import SLAMSystem

__all__ = ["MultiSequenceSLAM"]


class MultiSequenceSLAM:
    def __init__(self, cfg: SystemConfig, frontends, mesh=None,
                 batch_ba: bool = True):
        """``frontends``: one frontend per sequence (oracle or neural —
        they must share model parameters for batching to make sense; only
        their per-sequence state differs). ``mesh``: optional device mesh
        for sharding the batched BA."""
        self.cfg = cfg
        self.slams = [
            SLAMSystem(cfg, fe, enable_ba=not batch_ba) for fe in frontends
        ]
        self.batch_ba = batch_ba
        self.mesh = mesh

    @property
    def n(self) -> int:
        return len(self.slams)

    def step(self, frames) -> list:
        """``frames``: list of (index, t, img_l, img_r) per sequence (None
        to skip a finished sequence). Returns per-sequence FrameRecords
        (None for skipped)."""
        # stage 1: extraction + stereo association (batched inside the
        # frontends when they share parameters; the oracle frontend is
        # per-sequence host work)
        feats = []
        for s, fr in zip(self.slams, frames):
            if fr is None:
                feats.append(None)
                continue
            index, t, il, ir = fr
            feats.append(s.frontend.extract_pair(il, ir))

        # stage 2: temporal matching — one batched call over sequences that
        # are initialized (their ref features exist)
        i0s = [None] * self.n
        for k, (s, f) in enumerate(zip(self.slams, feats)):
            if f is None or not s.initialized:
                continue
            i0s[k] = s.frontend.match(f, s._ref_feats)

        # stage 3: per-sequence tracking + keyframe insertion (host)
        records = []
        ba_requests = []  # (slam_idx, center_kf)
        for k, (s, fr, f) in enumerate(zip(self.slams, frames, feats)):
            if fr is None:
                records.append(None)
                continue
            index, t, _, _ = fr
            rec = s.add_frame_features(index, t, f, i0s[k])
            records.append(rec)
            if self.batch_ba and rec.is_keyframe and s.map.n_kf >= 2:
                ba_requests.append((k, rec.kf_slot))

        # stage 4: batched BA over all requesting sequences — ONE dispatch
        if ba_requests:
            self._run_batched_ba(ba_requests)
        return records

    def _run_batched_ba(self, requests):
        import jax

        probs = []
        metas = []
        for k, center in requests:
            prob, mapping = self.slams[k].gather_ba_problem(center)
            if prob is not None:
                probs.append(prob)
                metas.append((k, center, mapping))
        if not probs:
            return
        o = self.cfg.optimization
        bcfg = o.backend
        kw = dict(
            chi2_mono=bcfg.mono_point, chi2_stereo=bcfg.stereo_point,
            chi2_mono_line=bcfg.mono_line, chi2_stereo_line=bcfg.stereo_line,
            iters1=o.ba_iters_phase1, iters2=o.ba_iters_phase2,
        )
        K = self.slams[0].K
        import jax.numpy as jnp

        batched = jax.tree.map(lambda *x: jnp.stack(x), *probs)
        if self.mesh is not None and len(probs) % self.mesh.shape["data"] == 0:
            from rspl_slam_tpu.parallel.dist_ba import batched_windows_ba

            results = batched_windows_ba(K, batched, self.mesh, **kw)
        else:
            fn = jax.vmap(
                lambda p: local_ba.optimize_local_map(K, p, **kw)
            )
            results = jax.jit(fn)(batched)
        for w, (k, center, mapping) in enumerate(metas):
            res_w = jax.tree.map(lambda x: x[w], results)
            self.slams[k].apply_ba_result(res_w, mapping, center)

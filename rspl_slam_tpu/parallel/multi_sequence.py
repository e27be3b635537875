"""Multi-sequence batched mapping — N sequences SLAM'd concurrently with
their device work batched (and sharded over the mesh).

This is BASELINE config 5 ("multi-sequence batched mapping: keyframes
sharded over hosts, distributed Schur BA") at the single-host level: the
reference could only ever process one sequence per process; here N maps
advance in lockstep and every device stage is one batched call:

- extraction: all 2N stereo images in ONE SuperPoint dispatch and the N
  stereo matching problems in one matcher dispatch (neural frontends with
  shared parameters; oracle frontends are host work and loop);
- temporal matching: the N frame↔keyframe problems in one dispatch;
- bundle adjustment: windows from sequences that inserted a keyframe this
  step are stacked and solved by ``batched_windows_ba`` (vmapped +
  sharded over the mesh's ``data`` axis) in one dispatch.

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
        # stage 1: extraction + stereo association. Neural frontends with
        # shared parameters take the batched path: ONE SuperPoint dispatch
        # over all 2N images + ONE stereo-matcher dispatch over N problems
        # (extract_pairs_batched). Oracle/other frontends fall back to the
        # per-sequence loop (their extraction is host work anyway).
        active = [k for k, fr in enumerate(frames) if fr is not None]
        feats: list = [None] * self.n
        fes = [self.slams[k].frontend for k in active]
        can_batch = (
            len(active) > 1
            and all(hasattr(f, "extract_pairs_batched") for f in fes)
            and all(f.sp_params is fes[0].sp_params for f in fes)
        )
        if can_batch:
            pairs = [(frames[k][2], frames[k][3]) for k in active]
            batched = fes[0].extract_pairs_batched(pairs, fes)
            for k, f in zip(active, batched):
                feats[k] = f
        else:
            for k in active:
                _, _, il, ir = frames[k]
                feats[k] = self.slams[k].frontend.extract_pair(il, ir)

        # stage 2: temporal matching — batched over initialized sequences
        # when the frontend supports it
        i0s = [None] * self.n
        match_idx = [
            k for k in active
            if self.slams[k].initialized and feats[k] is not None
        ]
        if can_batch and len(match_idx) > 1 and hasattr(fes[0], "match_batched"):
            pairs = [
                (feats[k], self.slams[k]._ref_feats) for k in match_idx
            ]
            for k, i0 in zip(match_idx, fes[0].match_batched(pairs)):
                i0s[k] = i0
        else:
            for k in match_idx:
                i0s[k] = self.slams[k].frontend.match(
                    feats[k], self.slams[k]._ref_feats
                )

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

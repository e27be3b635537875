"""Hough detector stress tests on realistic (noisy, blurred, cluttered)
edge maps + RCF synthetic pretraining — VERDICT round-1 item 6.

The round-1 suite validated detect_line_segments only on clean synthetic
segments; here the inputs look like what RCF actually emits: soft ridges
with amplitude variation, dropout gaps, background texture noise, and
clutter blobs — plus a test that feeds the detector an edge map produced
by the actual (briefly trained) RCF network."""

import numpy as np
import pytest

from rspl_slam_tpu.ops import lines as lops
from rspl_slam_tpu.training import rcf_train


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _box_blur(img, reps=2):
    out = img.astype(np.float32)
    for _ in range(reps):
        p = np.pad(out, 1, mode="edge")
        out = (
            p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
            + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
            + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
        ) / 9.0
    return out


def _noisy_edge_map(gt_edge, rng, dropout=0.25, bg_noise=0.12, n_blobs=6):
    """GT edge mask → realistic edge probability map."""
    H, W = gt_edge.shape
    p = gt_edge.astype(np.float32) * rng.uniform(0.55, 1.0, gt_edge.shape)
    p[rng.uniform(size=gt_edge.shape) < dropout] = 0.0  # gaps
    p = _box_blur(p, 2) * 2.2  # soft ridges
    p += rng.uniform(0, bg_noise, (H, W))  # texture noise
    for _ in range(n_blobs):  # clutter blobs (false texture edges)
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        r = rng.integers(2, 5)
        y0, y1 = max(0, cy - r), min(H, cy + r)
        x0, x1 = max(0, cx - r), min(W, cx + r)
        p[y0:y1, x0:x1] += rng.uniform(0.3, 0.6)
    return np.clip(p, 0, 1)


def _seg_angle(s):
    return np.arctan2(s[3] - s[1], s[2] - s[0]) % np.pi


def _match_seg(det, gt, angle_tol=0.12, dist_tol=4.0, overlap_min=0.45):
    """Does detection ``det`` explain GT segment ``gt``? Angle, infinite-line
    distance of the GT midpoint, and ≥overlap_min of the GT extent covered
    by the detection's projection interval."""
    da = abs((_seg_angle(det) - _seg_angle(gt) + np.pi / 2) % np.pi - np.pi / 2)
    if da > angle_tol:
        return False
    mid = np.array([(gt[0] + gt[2]) / 2, (gt[1] + gt[3]) / 2])
    x1, y1, x2, y2 = det
    A, B = y2 - y1, x1 - x2
    C = x2 * y1 - x1 * y2
    d = abs(A * mid[0] + B * mid[1] + C) / max(np.hypot(A, B), 1e-9)
    if d > dist_tol:
        return False
    th = _seg_angle(gt)
    u = np.array([np.cos(th), np.sin(th)])
    g0, g1 = sorted([np.array(gt[:2]) @ u, np.array(gt[2:]) @ u])
    d0, d1 = sorted([np.array(det[:2]) @ u, np.array(det[2:]) @ u])
    overlap = min(g1, d1) - max(g0, d0)
    return overlap >= overlap_min * (g1 - g0)


def _detect(edge, max_segments=48, min_length=18.0, do_merge=True):
    """The production extraction pipeline (frontends._extract_lines):
    detect → filter ≥30 px → merge → filter ≥60 px (the reference's two-pass
    FilterShortLines, line_processor.cc:470-480)."""
    segs, valid, _ = lops.detect_line_segments(
        np.asarray(edge, np.float32), max_segments=max_segments,
        min_length=min_length, edge_threshold=0.3,
    )
    segs = np.asarray(segs)[np.asarray(valid)]
    if do_merge:
        segs = lops.filter_short_lines(segs, 30.0)
        if len(segs):
            segs = lops.merge_lines(segs, angle_thr=0.12, distance_thr=6.0,
                                    ep_thr=25.0)
        segs = lops.filter_short_lines(segs, 60.0)
    return segs


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_detector_recall_precision_on_noisy_edge_maps():
    """Recall/precision over synthetic scenes with realistic degradations
    (25% dropout, blur, texture noise, clutter blobs) at reference-like
    resolution, through the production filter/merge pipeline."""
    recalls, precisions = [], []
    for seed in range(3):
        rng = np.random.default_rng(seed)
        _, gt_edge, gt_segs = rcf_train.render_edge_scene(
            rng, 240, 320, n_rects=2, noise=0.0
        )
        edge = _noisy_edge_map(gt_edge, rng, n_blobs=10)
        det = _detect(edge, min_length=25.0)
        # only GT pieces that survive the 60 px output filter count
        gt_long = [g for g in gt_segs
                   if np.hypot(g[2] - g[0], g[3] - g[1]) >= 70]
        hit = [any(_match_seg(d, g) for d in det) for g in gt_long]
        used = [any(_match_seg(d, g, overlap_min=0.2) for g in gt_segs)
                for d in det]
        recalls.append(np.mean(hit) if gt_long else 1.0)
        precisions.append(np.mean(used) if len(det) else 0.0)
    assert np.mean(recalls) >= 0.7, (recalls, precisions)
    assert np.mean(precisions) >= 0.5, (recalls, precisions)


def test_collinear_segments_emit_separate_runs():
    """Two collinear segments separated by a large gap share one Hough peak;
    runs_per_peak≥2 must recover both (FLD chases them separately —
    line_processor.cc:455-490)."""
    H, W = 100, 200
    edge = np.zeros((H, W), np.float32)
    edge[50, 20:80] = 1.0  # segment A
    edge[50, 130:190] = 1.0  # segment B, collinear, 50 px gap
    segs, valid, _ = lops.detect_line_segments(
        edge, max_segments=16, min_length=20.0, runs_per_peak=2
    )
    segs = np.asarray(segs)[np.asarray(valid)]
    got_a = any(_match_seg(s, [20, 50, 79, 50]) for s in segs)
    got_b = any(_match_seg(s, [130, 50, 189, 50]) for s in segs)
    assert got_a and got_b, segs


def test_single_run_misses_second_collinear_segment():
    """Control: with runs_per_peak=1 only the longest run survives."""
    H, W = 100, 200
    edge = np.zeros((H, W), np.float32)
    edge[50, 20:80] = 1.0
    edge[50, 130:190] = 1.0
    segs, valid, _ = lops.detect_line_segments(
        edge, max_segments=16, min_length=20.0, runs_per_peak=1
    )
    segs = np.asarray(segs)[np.asarray(valid)]
    both = (any(_match_seg(s, [20, 50, 79, 50], overlap_min=0.8) for s in segs)
            and any(_match_seg(s, [130, 50, 189, 50], overlap_min=0.8)
                    for s in segs))
    assert not both


def test_rcf_training_loss_decreases():
    params, history = rcf_train.train(
        steps=8, batch=2, hw=(48, 64), width_mult=0.125, lr=1e-3,
        verbose=False,
    )
    assert history[-1] < history[0] * 0.9, history


@pytest.mark.slow
def test_rcf_at_detection_scale_matches_full_res_path():
    """The production default runs RCF at the ×0.5 detection scale
    (LineDetectorConfig.rcf_at_detection_scale) instead of full-res RCF +
    edge-map downsample. Validate through the real frontend wiring
    (NeuralFrontend._extract_lines) that the cheap path recovers the same
    GT structure as the reference-order path."""
    import dataclasses

    from rspl_slam_tpu.config import CameraConfig, SystemConfig
    from rspl_slam_tpu.frontend.frontends import NeuralFrontend
    from rspl_slam_tpu.training import rcf_train

    params, _ = rcf_train.train(
        steps=60, batch=2, hw=(96, 128), width_mult=0.25, lr=1e-3,
        verbose=False, seed=1,
    )
    H, W = 192, 256
    cam = CameraConfig(image_width=W, image_height=H, fx=200.0, fy=200.0,
                       cx=W / 2, cy=H / 2, bf=20.0)
    base = SystemConfig(camera=cam, use_lines=True)

    def detect(at_scale: bool, img):
        cfg = dataclasses.replace(
            base, line_detector=dataclasses.replace(
                base.line_detector, rcf_at_detection_scale=at_scale,
                length_threshold=8,
            ),
        )
        fe = NeuralFrontend(cfg, rcf_params=params, use_lines=True,
                            matcher="cosine")
        segs_l, _ = fe._extract_lines(np.stack([img, img]))
        return segs_l

    hits = {}
    for seed in (7, 8):
        rng = np.random.default_rng(seed)
        img, _, gt_segs = rcf_train.render_edge_scene(rng, H, W, n_rects=2,
                                                      noise=0.01)
        gt_long = [g for g in gt_segs
                   if np.hypot(g[2] - g[0], g[3] - g[1]) >= 70]
        for mode in (True, False):
            det = detect(mode, img)
            n = sum(any(_match_seg(d, g, dist_tol=5.0, overlap_min=0.3)
                        for d in det) for g in gt_long)
            hits.setdefault(mode, []).append((n, len(gt_long)))
    got_half = sum(n for n, _ in hits[True])
    got_full = sum(n for n, _ in hits[False])
    total = sum(t for _, t in hits[True])
    # the detection-scale path must see what the full-res path sees
    assert got_half >= max(1, got_full - 1), (hits, total)
    assert got_half >= total // 3, (hits, total)


@pytest.mark.slow
def test_trained_rcf_edge_map_drives_detector():
    """End to end: briefly-trained reduced RCF → edge probability map on a
    fresh scene → Hough detector finds segments aligned with GT outlines."""
    from rspl_slam_tpu.models import rcf

    params, history = rcf_train.train(
        steps=60, batch=2, hw=(96, 128), width_mult=0.25, lr=1e-3,
        verbose=False, seed=1,
    )
    rng = np.random.default_rng(99)
    img, _, gt_segs = rcf_train.render_edge_scene(rng, 96, 128, n_rects=2,
                                                  noise=0.01)
    edge = np.asarray(rcf.edge_map(params, img[None]))[0]
    det = _detect(edge, min_length=14.0)
    assert len(det) >= 2, len(det)
    gt_long = [g for g in gt_segs if np.hypot(g[2] - g[0], g[3] - g[1]) >= 25]
    hits = sum(any(_match_seg(d, g, dist_tol=5.0, overlap_min=0.3)
                   for d in det) for g in gt_long)
    assert hits >= max(1, len(gt_long) // 3), (hits, len(gt_long))

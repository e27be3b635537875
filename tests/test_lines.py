"""Line pipeline tests: Hough segment detection, merging, assignment,
vote matching."""

import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.ops import lines as L


def draw_segment(img, p0, p1, value=1.0):
    n = int(np.hypot(*(np.asarray(p1) - p0)) * 2) + 1
    for t in np.linspace(0, 1, n):
        x, y = (1 - t) * np.asarray(p0) + t * np.asarray(p1)
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < img.shape[1] and 0 <= yi < img.shape[0]:
            img[yi, xi] = value
    return img


def seg_endpoint_error(seg, p0, p1):
    """Min over the two endpoint orderings of max endpoint distance."""
    a = np.array(seg[:2]), np.array(seg[2:])
    d1 = max(np.linalg.norm(a[0] - p0), np.linalg.norm(a[1] - p1))
    d2 = max(np.linalg.norm(a[0] - p1), np.linalg.norm(a[1] - p0))
    return min(d1, d2)


class TestHoughDetector:
    def test_single_segment(self):
        img = np.zeros((120, 160), np.float32)
        p0, p1 = (20.0, 30.0), (120.0, 90.0)
        draw_segment(img, p0, p1)
        segs, valid, length = L.detect_line_segments(jnp.asarray(img))
        segs = np.asarray(segs)[np.asarray(valid)]
        assert len(segs) >= 1
        errs = [seg_endpoint_error(s, p0, p1) for s in segs]
        assert min(errs) < 6.0, (min(errs), segs[:3])

    def test_multiple_segments(self):
        img = np.zeros((120, 160), np.float32)
        gt = [((10.0, 10.0), (150.0, 10.0)),
              ((30.0, 100.0), (130.0, 40.0)),
              ((80.0, 20.0), (80.0, 110.0))]
        for p0, p1 in gt:
            draw_segment(img, p0, p1)
        segs, valid, _ = L.detect_line_segments(jnp.asarray(img))
        segs = np.asarray(segs)[np.asarray(valid)]
        for p0, p1 in gt:
            errs = [seg_endpoint_error(s, p0, p1) for s in segs]
            assert min(errs) < 8.0, (p0, p1, min(errs))

    def test_empty_map(self):
        img = np.zeros((120, 160), np.float32)
        segs, valid, _ = L.detect_line_segments(jnp.asarray(img))
        assert not np.asarray(valid).any()

    def test_segment_not_full_line(self):
        """A short segment must not be extended across the whole image."""
        img = np.zeros((120, 160), np.float32)
        p0, p1 = (60.0, 60.0), (100.0, 60.0)
        draw_segment(img, p0, p1)
        segs, valid, length = L.detect_line_segments(jnp.asarray(img))
        segs = np.asarray(segs)[np.asarray(valid)]
        lens = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
        assert (lens < 60).all(), lens  # true length 40, not 160


class TestMerge:
    def test_collinear_pieces_merge(self):
        a = np.array([10.0, 10, 60, 10])
        b = np.array([70.0, 10.5, 120, 10.5])  # collinear-ish, 10 px gap
        merged = L.merge_lines(np.stack([a, b]))
        assert len(merged) == 1
        assert seg_endpoint_error(merged[0], (10, 10), (120, 10.5)) < 2.0

    def test_different_angles_stay(self):
        a = np.array([10.0, 10, 60, 10])
        b = np.array([10.0, 20, 40, 60])
        merged = L.merge_lines(np.stack([a, b]))
        assert len(merged) == 2

    def test_parallel_far_stay(self):
        a = np.array([10.0, 10, 60, 10])
        b = np.array([10.0, 60, 60, 60])  # parallel, 50 px apart
        merged = L.merge_lines(np.stack([a, b]))
        assert len(merged) == 2

    def test_filter_short(self):
        segs = np.array([[0, 0, 10, 0], [0, 0, 50, 0.0]])
        out = L.filter_short_lines(segs, 30)
        assert len(out) == 1


class TestAssignAndMatch:
    def test_assign_points(self):
        segs = np.array([[10.0, 10, 110, 10]])
        xy = np.array([[50.0, 12], [50.0, 30], [5.0, 10], [113.0, 11]])
        valid = np.ones(4, bool)
        m = L.assign_points_to_lines(segs, xy, valid)
        assert m[0, 0]  # 2 px off the line → member
        assert not m[0, 1]  # 20 px off → no
        assert not m[0, 2]  # outside bbox −5 < 10−3
        assert m[0, 3]  # within 3 px slack of bbox end

    def test_match_lines_votes(self):
        # frame0: two lines; frame1: two lines; points 0-3 on line0 map to
        # points on line0' etc.
        m0 = np.zeros((2, 8), bool)
        m1 = np.zeros((2, 8), bool)
        m0[0, [0, 1, 2]] = True
        m0[1, [4, 5, 6]] = True
        m1[0, [0, 1, 2]] = True
        m1[1, [4, 5, 6]] = True
        pm = np.arange(8)  # identity point matching
        lm = L.match_lines(m0, m1, pm)
        assert lm[0] == 0 and lm[1] == 1

    def test_match_lines_vote_threshold(self):
        m0 = np.zeros((1, 8), bool)
        m1 = np.zeros((1, 8), bool)
        m0[0, [0]] = True  # only ONE shared point → votes=1 < 2
        m1[0, [0]] = True
        lm = L.match_lines(m0, m1, np.arange(8))
        assert lm[0] == -1

    def test_match_lines_score_threshold(self):
        # votes=2 but |pts0|=8 → score 4/2... score uses min(|pts|)
        m0 = np.zeros((1, 8), bool)
        m1 = np.zeros((1, 8), bool)
        m0[0, :8] = True  # 8 points on the line
        m1[0, [0, 1, 2, 3, 4, 5]] = True  # 6 points
        pm = np.full(8, -1)
        pm[0], pm[1] = 0, 1  # only 2 matched
        # votes=2, min=6 → score 4/6 < 0.8 → reject
        lm = L.match_lines(m0, m1, pm)
        assert lm[0] == -1

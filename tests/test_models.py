"""Tests for the SuperPoint / SuperGlue / RCF JAX models and their ops.

Golden values come from small, independent numpy reference implementations
written here — not from the reference repo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.config import SuperGlueConfig, SuperPointConfig
from rspl_slam_tpu.models import rcf, superglue, superpoint
from rspl_slam_tpu.ops.keypoints import (
    sample_descriptors,
    simple_nms,
    top_k_keypoints,
)
from rspl_slam_tpu.ops.matching import mutual_match_decode, normalize_keypoints
from rspl_slam_tpu.ops.sinkhorn import log_optimal_transport_masked


class TestNMS:
    def test_isolated_peaks_survive(self):
        s = np.zeros((1, 32, 32), np.float32)
        s[0, 5, 5] = 1.0
        s[0, 20, 25] = 0.8
        out = np.asarray(simple_nms(jnp.asarray(s), 4))
        assert out[0, 5, 5] == 1.0
        assert out[0, 20, 25] == pytest.approx(0.8)
        assert (out > 0).sum() == 2

    def test_close_peaks_suppressed(self):
        s = np.zeros((1, 32, 32), np.float32)
        s[0, 10, 10] = 1.0
        s[0, 10, 12] = 0.9  # within radius 4 of the stronger peak
        out = np.asarray(simple_nms(jnp.asarray(s), 4))
        assert out[0, 10, 10] == 1.0
        assert out[0, 10, 12] == 0.0


class TestCellSpaceNMS:
    """The extract path runs NMS/top-K on the pre-pixel-shuffle cell layout
    (B, Hc, Wc, 64) — must be bit-identical to the pixel-space ops."""

    @staticmethod
    def _shuffle(p):
        B, Hc, Wc, C = p.shape
        return (p.reshape(B, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4)
                .reshape(B, Hc * 8, Wc * 8))

    def test_nms_matches_pixel_space(self):
        from rspl_slam_tpu.ops.keypoints import simple_nms_cell

        rng = np.random.default_rng(0)
        p = rng.uniform(size=(2, 6, 9, 64)).astype(np.float32)
        # plateaus exercise the tie/suppression logic
        p[0, 2, 3, :16] = 0.999
        ref = np.asarray(simple_nms(jnp.asarray(self._shuffle(p)), 4))
        got = self._shuffle(np.asarray(simple_nms_cell(jnp.asarray(p), 4)))
        np.testing.assert_array_equal(ref, got)

    def test_topk_matches_pixel_space(self):
        from rspl_slam_tpu.ops.keypoints import (simple_nms_cell,
                                                 top_k_keypoints_cell)

        rng = np.random.default_rng(1)
        p = rng.uniform(size=(1, 8, 12, 64)).astype(np.float32)
        pix = simple_nms(jnp.asarray(self._shuffle(p)), 4)
        cell = simple_nms_cell(jnp.asarray(p), 4)
        xy_p, sc_p, v_p = top_k_keypoints(pix[0], 32, 1e-4, 4)
        xy_c, sc_c, v_c = top_k_keypoints_cell(cell[0], 32, 1e-4, 4)
        np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_c))
        np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_c))
        np.testing.assert_array_equal(np.asarray(xy_p), np.asarray(xy_c))

    def test_extract_consistent_with_dense_heads(self):
        """extract()'s cell path selects exactly the keypoints the public
        pixel-space dense_heads + pixel ops would."""
        cfg = SuperPointConfig(max_keypoints=64, keypoint_threshold=1e-4)
        params = superpoint.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(size=(1, 64, 96)).astype(np.float32))
        feats = superpoint.extract(params, img, cfg, jnp.float32)
        scores, desc = superpoint.dense_heads(params, img, jnp.float32)
        s = simple_nms(scores, cfg.nms_radius)
        xy, sc, valid = top_k_keypoints(s[0], 64, cfg.keypoint_threshold,
                                        cfg.remove_borders)
        np.testing.assert_array_equal(np.asarray(feats.valid[0]),
                                      np.asarray(valid))
        np.testing.assert_allclose(np.asarray(feats.xy[0]), np.asarray(xy))
        np.testing.assert_allclose(np.asarray(feats.score[0]),
                                   np.asarray(sc), rtol=1e-6)


class TestTopK:
    def test_fixed_k_with_mask(self):
        s = np.zeros((64, 64), np.float32)
        pts = [(10, 20, 0.9), (30, 40, 0.8), (50, 12, 0.7)]
        for y, x, v in pts:
            s[y, x] = v
        xy, score, valid = top_k_keypoints(jnp.asarray(s), 8, 0.1, 4)
        assert xy.shape == (8, 2)
        assert int(valid.sum()) == 3
        got = {(int(x), int(y)) for (x, y), v in zip(np.asarray(xy), np.asarray(valid)) if v}
        assert got == {(20, 10), (40, 30), (12, 50)}
        # scores sorted descending among valid
        sv = np.asarray(score)[np.asarray(valid)]
        assert np.all(np.diff(sv) <= 0)

    def test_border_removal(self):
        s = np.zeros((64, 64), np.float32)
        s[1, 1] = 1.0  # inside 4-px border → must be dropped
        s[10, 10] = 0.5
        xy, score, valid = top_k_keypoints(jnp.asarray(s), 4, 0.1, 4)
        assert int(valid.sum()) == 1
        assert tuple(np.asarray(xy)[0]) == (10.0, 10.0)


class TestSampleDescriptors:
    def test_constant_map_unit_norm(self):
        C, Hc, Wc = 16, 8, 10
        dmap = jnp.ones((C, Hc, Wc))
        xy = jnp.asarray([[32.0, 24.0], [8.0, 8.0]])
        d = sample_descriptors(xy, dmap, 8)
        assert d.shape == (2, C)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=1)), 1.0, rtol=1e-5)

    def test_bilinear_interpolation_numpy_ref(self):
        rng = np.random.default_rng(0)
        C, Hc, Wc = 4, 6, 7
        s = 8
        dmap = rng.standard_normal((C, Hc, Wc)).astype(np.float32)
        xy = np.array([[20.0, 28.0], [35.5, 11.25]], np.float32)
        out = np.asarray(sample_descriptors(jnp.asarray(xy), jnp.asarray(dmap), s))
        # numpy reference: align_corners grid_sample semantics
        kx = (xy[:, 0] - s / 2 + 0.5) / (Wc * s - s / 2 - 0.5) * (Wc - 1)
        ky = (xy[:, 1] - s / 2 + 0.5) / (Hc * s - s / 2 - 0.5) * (Hc - 1)
        for i in range(2):
            x0, y0 = int(np.floor(kx[i])), int(np.floor(ky[i]))
            wx, wy = kx[i] - x0, ky[i] - y0
            ref = (
                dmap[:, y0, x0] * (1 - wy) * (1 - wx)
                + dmap[:, y0, x0 + 1] * (1 - wy) * wx
                + dmap[:, y0 + 1, x0] * wy * (1 - wx)
                + dmap[:, y0 + 1, x0 + 1] * wy * wx
            )
            ref = ref / np.linalg.norm(ref)
            np.testing.assert_allclose(out[i], ref, atol=1e-5)


class TestSuperPoint:
    def test_extract_shapes_and_masks(self):
        cfg = SuperPointConfig(max_keypoints=64)
        params = superpoint.init_params(jax.random.PRNGKey(0))
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 96))
        feats = superpoint.extract(params, img, cfg, compute_dtype=jnp.float32)
        assert feats.xy.shape == (2, 64, 2)
        assert feats.desc.shape == (2, 64, 256)
        assert feats.valid.dtype == jnp.bool_
        # descriptors of valid keypoints are unit norm
        norms = np.asarray(jnp.linalg.norm(feats.desc, axis=-1))
        v = np.asarray(feats.valid)
        assert np.allclose(norms[v], 1.0, atol=1e-4)
        # all valid keypoints respect the border
        xy = np.asarray(feats.xy)
        assert (xy[v][:, 0] >= 4).all() and (xy[v][:, 0] < 92).all()

    def test_dense_heads_score_is_distribution(self):
        params = superpoint.init_params(jax.random.PRNGKey(0))
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32))
        scores, desc = superpoint.dense_heads(params, img, jnp.float32)
        assert scores.shape == (1, 32, 32)
        assert desc.shape == (1, 256, 4, 4)
        s = np.asarray(scores)
        assert (s >= 0).all() and (s <= 1).all()
        # descriptor map unit-normalized over channels
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(desc, axis=1)), 1.0, atol=1e-4
        )


def _np_log_sinkhorn(scores, bin_score, iters):
    """Independent numpy log-sinkhorn (unmasked, full) for cross-checking."""
    m, n = scores.shape
    couplings = np.zeros((m + 1, n + 1))
    couplings[:m, :n] = scores
    couplings[m, :] = bin_score
    couplings[:, n] = bin_score
    norm = -np.log(m + n)
    log_mu = np.concatenate([np.full(m, norm), [np.log(n) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(m) + norm]])
    u = np.zeros(m + 1)
    v = np.zeros(n + 1)
    from scipy.special import logsumexp

    for _ in range(iters):
        u = log_mu - logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - logsumexp(couplings + u[:, None], axis=0)
    return couplings + u[:, None] + v[None, :] - norm


class TestSinkhorn:
    def test_matches_numpy_reference_full_mask(self):
        rng = np.random.default_rng(1)
        M, N = 6, 5
        S = rng.standard_normal((M, N)).astype(np.float32)
        Z = log_optimal_transport_masked(
            jnp.asarray(S)[None],
            jnp.ones((1, M), bool),
            jnp.ones((1, N), bool),
            jnp.asarray(0.5),
            iters=50,
        )
        Zref = _np_log_sinkhorn(S.astype(np.float64), 0.5, 50)
        np.testing.assert_allclose(np.asarray(Z)[0], Zref, atol=1e-3)

    def test_masked_slots_get_no_mass(self):
        rng = np.random.default_rng(2)
        M, N = 8, 8
        S = rng.standard_normal((1, M, N)).astype(np.float32) * 5
        mask0 = jnp.asarray(np.arange(M) < 5)[None]
        mask1 = jnp.asarray(np.arange(N) < 6)[None]
        Z = log_optimal_transport_masked(S, mask0, mask1, jnp.asarray(1.0), 80)
        P = np.exp(np.asarray(Z))[0]
        # invalid (padded) rows/cols get no transport mass anywhere
        # (dustbin row M / col N excluded — those legitimately carry mass)
        assert P[5:M, :].sum() < 1e-4
        assert P[:, 6:N].sum() < 1e-4
        # valid rows approximately satisfy their marginal (1/(M+N) each, ×(M+N))
        np.testing.assert_allclose(P[:5, :].sum(1), 1.0, atol=1e-2)

    def test_rows_cols_marginals(self):
        # with equal marginals the plan is doubly stochastic (scaled)
        rng = np.random.default_rng(3)
        S = rng.standard_normal((1, 4, 4)).astype(np.float32)
        Z = log_optimal_transport_masked(
            S, jnp.ones((1, 4), bool), jnp.ones((1, 4), bool), jnp.asarray(0.0), 200
        )
        P = np.exp(np.asarray(Z))[0]
        np.testing.assert_allclose(P[:4].sum(1), 1.0, atol=1e-3)
        np.testing.assert_allclose(P[:, :4].sum(0), 1.0, atol=1e-3)


class TestMatchDecode:
    def test_mutual_and_threshold(self):
        # craft a log-plan: pair (0,1) strong mutual; (1,0) below threshold;
        # row 2 prefers col 1 but col 1 prefers row 0 → not mutual
        Z = np.full((1, 4, 4), -10.0, np.float32)  # 3+1 dustbin
        Z[0, 0, 1] = np.log(0.9)
        Z[0, 1, 0] = np.log(0.1)  # below 0.2 threshold
        Z[0, 2, 1] = np.log(0.5)
        mask0 = jnp.asarray([[True, True, True]])
        mask1 = jnp.asarray([[True, True, True]])
        i0, i1, ms0 = mutual_match_decode(jnp.asarray(Z), mask0, mask1, 0.2)
        i0 = np.asarray(i0)[0]
        assert i0[0] == 1
        assert i0[1] == -1  # below threshold
        assert i0[2] == -1  # not mutual
        assert np.asarray(i1)[0][1] == 0
        assert np.asarray(ms0)[0][0] == pytest.approx(0.9, rel=1e-3)

    def test_normalize_keypoints_reference_formula(self):
        xy = jnp.asarray([[0.0, 0.0], [752.0, 480.0], [376.0, 240.0]])
        out = np.asarray(normalize_keypoints(xy, 752, 480))
        scale = 0.7 * 752
        np.testing.assert_allclose(out[0], [-376.0 / scale, -240.0 / scale], rtol=1e-6)
        np.testing.assert_allclose(out[2], [0.0, 0.0], atol=1e-9)


class TestSuperGlue:
    def test_match_self_identity(self):
        """Matching a keypoint set against itself with distinctive descriptors
        must return the identity assignment (even with random GNN weights the
        descriptor similarity dominates after Sinkhorn)."""
        cfg = SuperGlueConfig(num_gnn_layers=2, sinkhorn_iterations=30)
        params = superglue.init_params(jax.random.PRNGKey(0), cfg)
        K = 16
        rng = np.random.default_rng(4)
        desc = rng.standard_normal((1, K, 256)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        xy = rng.uniform(0, 400, (1, K, 2)).astype(np.float32)
        sc = rng.uniform(0.2, 1, (1, K)).astype(np.float32)
        mask = jnp.ones((1, K), bool)
        # zero-out the GNN/encoder so descriptors pass through unchanged,
        # and make the final projection the identity
        params = jax.tree_util.tree_map(lambda x: x * 0.0, params)
        params["final_proj"]["w"] = jnp.eye(256)
        params["bin_score"] = jnp.asarray(-2.0)
        res = superglue.match_pair(
            params, jnp.asarray(xy), jnp.asarray(sc), jnp.asarray(desc * 20), mask,
            jnp.asarray(xy), jnp.asarray(sc), jnp.asarray(desc * 20), mask,
            cfg, compute_dtype=jnp.float32,
        )
        idx0 = np.asarray(res.indices0)[0]
        assert (idx0 == np.arange(K)).mean() > 0.9

    def test_padded_slots_never_match(self):
        cfg = SuperGlueConfig(num_gnn_layers=2, sinkhorn_iterations=20)
        params = superglue.init_params(jax.random.PRNGKey(1), cfg)
        K = 12
        rng = np.random.default_rng(5)
        desc = jnp.asarray(rng.standard_normal((1, K, 256)), jnp.float32)
        xy = jnp.asarray(rng.uniform(0, 400, (1, K, 2)), jnp.float32)
        sc = jnp.asarray(rng.uniform(size=(1, K)), jnp.float32)
        mask0 = jnp.asarray(np.arange(K) < 7)[None]
        mask1 = jnp.asarray(np.arange(K) < 9)[None]
        res = superglue.match_pair(
            params, xy, sc, desc, mask0, xy, sc, desc, mask1, cfg,
            compute_dtype=jnp.float32,
        )
        i0 = np.asarray(res.indices0)[0]
        i1 = np.asarray(res.indices1)[0]
        assert (i0[7:] == -1).all()
        assert (i1[9:] == -1).all()
        # no valid row matched to an invalid column
        assert all(m < 9 for m in i0[:7] if m >= 0)

    def test_stacked_equals_unstacked(self):
        """M == N routes through the side-stacked GNN (one matmul per
        projection for both descriptor sets); padding side 1 with one
        masked slot forces the two-sided path. A masked slot is invisible
        to attention and Sinkhorn, so valid-slot outputs must agree."""
        cfg = SuperGlueConfig(num_gnn_layers=4, sinkhorn_iterations=30)
        params = superglue.init_params(jax.random.PRNGKey(2), cfg)
        K = 16
        rng = np.random.default_rng(6)
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        xy0, xy1 = (jnp.abs(mk(1, K, 2)) * 100 for _ in range(2))
        sc0, sc1 = (jnp.abs(mk(1, K)) for _ in range(2))
        d0, d1 = mk(1, K, 256), mk(1, K, 256)
        ones = jnp.ones((1, K), bool)
        res_a = superglue.match_pair(
            params, xy0, sc0, d0, ones, xy1, sc1, d1, ones, cfg,
            compute_dtype=jnp.float32,
        )

        def pad(t):
            w = [(0, 0)] * t.ndim
            w[1] = (0, 1)
            return jnp.pad(t, w)

        mask1p = jnp.asarray(np.arange(K + 1) < K)[None]
        res_b = superglue.match_pair(
            params, xy0, sc0, d0, ones, pad(xy1), pad(sc1), pad(d1),
            mask1p, cfg, compute_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(res_a.indices0),
                                      np.asarray(res_b.indices0))
        np.testing.assert_array_equal(np.asarray(res_a.indices1),
                                      np.asarray(res_b.indices1)[:, :K])
        np.testing.assert_allclose(np.asarray(res_a.mscores0),
                                   np.asarray(res_b.mscores0),
                                   rtol=0, atol=1e-4)


class TestRCF:
    def test_edge_map_shape_range(self):
        params = rcf.init_params(jax.random.PRNGKey(0))
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32))
        e = rcf.edge_map(params, img, compute_dtype=jnp.float32)
        assert e.shape == (1, 32, 32)
        en = np.asarray(e)
        assert (en >= 0).all() and (en <= 1).all()

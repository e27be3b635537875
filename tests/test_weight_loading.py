"""Weight-loading parity tests.

The reference validated every exported engine numerically against the
source checkpoint (convert2onnx/convert_superpoint_to_onnx.py:72-74
assert_allclose vs ONNXRuntime). These tests are that validation for our
torch→JAX weight mappers: build a random state dict in the EXACT torch
checkpoint layout (key names, OIHW/Conv1d shapes, BatchNorm running
stats), save it as .pth, load through ``load_torch_weights``, and compare
the JAX forward against an independent torch-functional forward computed
straight from the state dict. This exercises every transpose, the BN
folding, and the attention head-layout permutation.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from rspl_slam_tpu.config import SuperGlueConfig  # noqa: E402
from rspl_slam_tpu.models import rcf, superglue, superpoint  # noqa: E402


def _t(rng, *shape, scale=0.3):
    return torch.from_numpy(
        (rng.standard_normal(shape) * scale).astype(np.float32)
    )


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------


def _superpoint_sd(rng):
    sd = {}
    for name, cin, cout, k in superpoint._LAYERS:
        sd[f"{name}.weight"] = _t(rng, cout, cin, k, k)
        sd[f"{name}.bias"] = _t(rng, cout, scale=0.05)
    return sd


def _torch_superpoint_dense(sd, img):
    """Independent forward from the state dict (architecture per
    convert2onnx/superpoint.py:114-167, pre-NMS dense outputs)."""

    def c(x, name, relu=True, pad=1):
        y = F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=pad)
        return F.relu(y) if relu else y

    x = img
    x = c(x, "conv1a")
    x = c(x, "conv1b")
    x = F.max_pool2d(x, 2)
    x = c(x, "conv2a")
    x = c(x, "conv2b")
    x = F.max_pool2d(x, 2)
    x = c(x, "conv3a")
    x = c(x, "conv3b")
    x = F.max_pool2d(x, 2)
    x = c(x, "conv4a")
    x = c(x, "conv4b")
    cPa = c(x, "convPa")
    scores = c(cPa, "convPb", relu=False, pad=0)
    scores = F.softmax(scores, 1)[:, :-1]
    b, _, h, w = scores.shape
    scores = scores.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
    scores = scores.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
    cDa = c(x, "convDa")
    desc = c(cDa, "convDb", relu=False, pad=0)
    desc = F.normalize(desc, p=2, dim=1)
    return scores, desc


class TestSuperPointWeights:
    def test_dense_parity(self, tmp_path):
        rng = np.random.default_rng(0)
        sd = _superpoint_sd(rng)
        path = tmp_path / "sp.pth"
        torch.save(sd, path)

        params = superpoint.load_torch_weights(str(path))
        img = rng.random((2, 32, 48)).astype(np.float32)
        scores_j, desc_j = superpoint.dense_heads(
            params, jnp.asarray(img), compute_dtype=jnp.float32,
            use_pallas_stem=False,
        )
        with torch.no_grad():
            scores_t, desc_t = _torch_superpoint_dense(
                sd, torch.from_numpy(img).unsqueeze(1)
            )
        np.testing.assert_allclose(
            np.asarray(scores_j), scores_t.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(desc_j), desc_t.numpy(), atol=2e-5
        )


# ---------------------------------------------------------------------------
# SuperGlue (incl. BN folding + head-layout permutation)
# ---------------------------------------------------------------------------

SG_CFG = SuperGlueConfig(
    descriptor_dim=64, keypoint_encoder=(32,), num_gnn_layers=4, num_heads=4,
    sinkhorn_iterations=30, image_width=160, image_height=120,
)


def _bn_sd(sd, prefix, rng, ch):
    sd[f"{prefix}.weight"] = _t(rng, ch, scale=0.2) + 1.0
    sd[f"{prefix}.bias"] = _t(rng, ch, scale=0.1)
    sd[f"{prefix}.running_mean"] = _t(rng, ch, scale=0.2)
    sd[f"{prefix}.running_var"] = torch.from_numpy(
        rng.uniform(0.5, 2.0, ch).astype(np.float32)
    )
    # extra buffer present in real checkpoints; must be ignored by the loader
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(1000)


def _conv1d_sd(sd, prefix, rng, cin, cout):
    # ~He scale keeps activations O(1) through the residual GNN stack so
    # the parity comparison is numerically meaningful
    sd[f"{prefix}.weight"] = _t(rng, cout, cin, 1, scale=1.0 / np.sqrt(cin))
    sd[f"{prefix}.bias"] = _t(rng, cout, scale=0.05)


def _superglue_sd(rng, cfg: SuperGlueConfig):
    d = cfg.descriptor_dim
    sd = {}
    chans = [3, *cfg.keypoint_encoder, d]
    seq = 0
    for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:])):
        _conv1d_sd(sd, f"kenc.encoder.{seq}", rng, cin, cout)
        seq += 1
        if i < len(chans) - 2:
            _bn_sd(sd, f"kenc.encoder.{seq}", rng, cout)
            seq += 2  # BN + ReLU
    for li in range(cfg.num_gnn_layers):
        base = f"gnn.layers.{li}"
        for p in range(3):
            _conv1d_sd(sd, f"{base}.attn.proj.{p}", rng, d, d)
        _conv1d_sd(sd, f"{base}.attn.merge", rng, d, d)
        _conv1d_sd(sd, f"{base}.mlp.0", rng, 2 * d, 2 * d)
        _bn_sd(sd, f"{base}.mlp.1", rng, 2 * d)
        _conv1d_sd(sd, f"{base}.mlp.3", rng, 2 * d, d)
    _conv1d_sd(sd, "final_proj", rng, d, d)
    sd["bin_score"] = torch.tensor(0.8)
    return sd


def _tc(sd, prefix, x):
    return F.conv1d(x, sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])


def _tbn(sd, prefix, x):
    return F.batch_norm(
        x, sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], training=False,
    )


def _torch_attn(sd, base, x, source, heads):
    """Head split per the public model: view(B, head_dim, heads, N)
    (convert2onnx/superglue.py:139-142)."""
    q = _tc(sd, f"{base}.attn.proj.0", x)
    k = _tc(sd, f"{base}.attn.proj.1", source)
    v = _tc(sd, f"{base}.attn.proj.2", source)
    B, C, _ = q.shape
    dh = C // heads
    q, k, v = [t.view(B, dh, heads, -1) for t in (q, k, v)]
    logits = torch.einsum("bdhn,bdhm->bhnm", q, k) / dh ** 0.5
    prob = F.softmax(logits, dim=-1)
    msg = torch.einsum("bhnm,bdhm->bdhn", prob, v)
    return _tc(sd, f"{base}.attn.merge", msg.reshape(B, C, -1))


def _torch_superglue(sd, cfg, xy0, sc0, d0, xy1, sc1, d1):
    """Independent full forward from the state dict: kenc → GNN → final
    proj → scaled similarity → log-Sinkhorn (superglue.py:75-205)."""
    scale = 0.7 * max(cfg.image_width, cfg.image_height)
    ctr = torch.tensor([cfg.image_width / 2.0, cfg.image_height / 2.0])

    def kenc(xy, sc, desc):
        kxy = (xy - ctr) / scale
        x = torch.cat([kxy.transpose(1, 2), sc.unsqueeze(1)], 1)
        x = F.relu(_tbn(sd, "kenc.encoder.1", _tc(sd, "kenc.encoder.0", x)))
        return desc + _tc(sd, "kenc.encoder.3", x)

    t0 = kenc(xy0, sc0, d0)
    t1 = kenc(xy1, sc1, d1)
    for li in range(cfg.num_gnn_layers):
        base = f"gnn.layers.{li}"
        cross = li % 2 == 1
        s0, s1 = (t1, t0) if cross else (t0, t1)
        def mlp(x, msg):
            h = torch.cat([x, msg], 1)
            h = F.relu(_tbn(sd, f"{base}.mlp.1", _tc(sd, f"{base}.mlp.0", h)))
            return _tc(sd, f"{base}.mlp.3", h)
        m0 = _torch_attn(sd, base, t0, s0, cfg.num_heads)
        m1 = _torch_attn(sd, base, t1, s1, cfg.num_heads)
        t0 = t0 + mlp(t0, m0)
        t1 = t1 + mlp(t1, m1)
    md0 = _tc(sd, "final_proj", t0)
    md1 = _tc(sd, "final_proj", t1)
    sim = torch.einsum("bdm,bdn->bmn", md0, md1) / cfg.descriptor_dim ** 0.5

    # log-domain Sinkhorn with uniform marginals, scaled by M+N
    b, m, n = sim.shape
    alpha = sd["bin_score"]
    couplings = torch.cat(
        [
            torch.cat([sim, alpha.expand(b, m, 1)], -1),
            torch.cat([alpha.expand(b, 1, n), alpha.expand(b, 1, 1)], -1),
        ],
        1,
    )
    norm = -torch.log(torch.tensor(float(m + n)))
    log_mu = torch.cat([norm.expand(m), (np.log(n) + norm).reshape(1)])
    log_nu = torch.cat([norm.expand(n), (np.log(m) + norm).reshape(1)])
    log_mu, log_nu = log_mu[None].expand(b, -1), log_nu[None].expand(b, -1)
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(cfg.sinkhorn_iterations):
        u = log_mu - torch.logsumexp(couplings + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
    return couplings + u.unsqueeze(2) + v.unsqueeze(1) - norm


class TestSuperGlueWeights:
    def test_full_forward_parity(self, tmp_path):
        rng = np.random.default_rng(1)
        cfg = SG_CFG
        sd = _superglue_sd(rng, cfg)
        path = tmp_path / "sg.pth"
        torch.save(sd, path)

        params = superglue.load_torch_weights(str(path), cfg)
        M, N = 24, 20
        xy0 = rng.uniform(0, 150, (1, M, 2)).astype(np.float32)
        xy1 = rng.uniform(0, 150, (1, N, 2)).astype(np.float32)
        sc0 = rng.random((1, M)).astype(np.float32)
        sc1 = rng.random((1, N)).astype(np.float32)
        d0 = rng.standard_normal((1, M, cfg.descriptor_dim)).astype(np.float32)
        d1 = rng.standard_normal((1, N, cfg.descriptor_dim)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)

        res = superglue.match_pair(
            params,
            jnp.asarray(xy0), jnp.asarray(sc0), jnp.asarray(d0),
            jnp.ones((1, M), bool),
            jnp.asarray(xy1), jnp.asarray(sc1), jnp.asarray(d1),
            jnp.ones((1, N), bool),
            cfg, compute_dtype=jnp.float32,
        )
        with torch.no_grad():
            Z_t = _torch_superglue(
                sd, cfg,
                torch.from_numpy(xy0), torch.from_numpy(sc0),
                torch.from_numpy(d0).transpose(1, 2),
                torch.from_numpy(xy1), torch.from_numpy(sc1),
                torch.from_numpy(d1).transpose(1, 2),
            ).numpy()
        np.testing.assert_allclose(np.asarray(res.log_plan), Z_t,
                                   atol=1e-3, rtol=1e-4)

        # decode agrees with a direct mutual-argmax on the torch plan
        S = Z_t[0, :-1, :-1]
        max0 = S.argmax(1)
        max1 = S.argmax(0)
        idx_j = np.asarray(res.indices0[0])
        for i in range(M):
            j = max0[i]
            expect = j if (max1[j] == i and np.exp(S[i, j]) > cfg.match_threshold) else -1
            assert idx_j[i] == expect, (i, idx_j[i], expect)

    def test_head_permutation_matters(self, tmp_path):
        """Loading WITHOUT the head permutation must disagree with torch —
        guards against silently reverting to the broken mapping."""
        rng = np.random.default_rng(2)
        cfg = SG_CFG
        sd = _superglue_sd(rng, cfg)
        path = tmp_path / "sg.pth"
        torch.save(sd, path)
        params = superglue.load_torch_weights(str(path), cfg)

        d = cfg.descriptor_dim
        dh = d // cfg.num_heads
        perm = np.arange(d).reshape(dh, cfg.num_heads).T.ravel()
        inv = np.argsort(perm)
        # undo the permutation on one layer → forward must change
        bad = {**params}
        bad["gnn"] = [dict(l) for l in params["gnn"]]
        q = dict(bad["gnn"][0]["q"])
        q["w"] = q["w"][:, inv]
        q["b"] = q["b"][inv]
        bad["gnn"][0]["q"] = q

        M = 16
        xy = jnp.asarray(rng.uniform(0, 100, (1, M, 2)).astype(np.float32))
        sc = jnp.asarray(rng.random((1, M)).astype(np.float32))
        de = jnp.asarray(rng.standard_normal((1, M, d)).astype(np.float32))
        mask = jnp.ones((1, M), bool)
        good_Z = superglue.match_pair(params, xy, sc, de, mask, xy, sc, de,
                                      mask, cfg, compute_dtype=jnp.float32).log_plan
        bad_Z = superglue.match_pair(bad, xy, sc, de, mask, xy, sc, de,
                                     mask, cfg, compute_dtype=jnp.float32).log_plan
        assert float(jnp.abs(good_Z - bad_Z).max()) > 1e-3


# ---------------------------------------------------------------------------
# RCF
# ---------------------------------------------------------------------------


def _rcf_sd(rng):
    sd = {}
    for si, (sname, convs) in enumerate(rcf._STAGES, start=1):
        for i, (cin, cout) in enumerate(convs):
            sd[f"conv{si}_{i + 1}.weight"] = _t(rng, cout, cin, 3, 3, scale=0.05)
            sd[f"conv{si}_{i + 1}.bias"] = _t(rng, cout, scale=0.02)
            sd[f"conv{si}_{i + 1}_down.weight"] = _t(rng, rcf._SIDE_CH, cout, 1, 1, scale=0.05)
            sd[f"conv{si}_{i + 1}_down.bias"] = _t(rng, rcf._SIDE_CH, scale=0.02)
        sd[f"score_dsn{si}.weight"] = _t(rng, 1, rcf._SIDE_CH, 1, 1, scale=0.1)
        sd[f"score_dsn{si}.bias"] = _t(rng, 1, scale=0.02)
    sd["score_final.weight"] = _t(rng, 1, 5, 1, 1, scale=0.3)
    sd["score_final.bias"] = _t(rng, 1, scale=0.02)
    return sd


def _torch_rcf(sd, img, H, W):
    """Forward from the state dict, mirroring our topology (SAME pooling,
    half-pixel bilinear upsampling, dilation-2 stage 5)."""

    def c(x, name, pad=1, dil=1):
        return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"],
                        padding=pad, dilation=dil)

    x = img
    sides = []
    for si, (sname, convs) in enumerate(rcf._STAGES, start=1):
        dil = 2 if si == 5 else 1
        side_sum = None
        for i in range(len(convs)):
            x = F.relu(c(x, f"conv{si}_{i + 1}", pad=dil, dil=dil))
            s = c(x, f"conv{si}_{i + 1}_down", pad=0)
            side_sum = s if side_sum is None else side_sum + s
        score = c(side_sum, f"score_dsn{si}", pad=0)
        sides.append(F.interpolate(score, size=(H, W), mode="bilinear",
                                   align_corners=False))
        if si <= 3:
            x = F.max_pool2d(x, 2)
        elif si == 4:  # stride-1 SAME pool
            x = F.max_pool2d(F.pad(x, (0, 1, 0, 1), value=-1e30), 2, stride=1)
    fused = F.conv2d(torch.cat(sides, 1), sd["score_final.weight"],
                     sd["score_final.bias"])
    return torch.sigmoid(fused[:, 0])


class TestRCFWeights:
    def test_edge_map_parity(self, tmp_path):
        rng = np.random.default_rng(3)
        sd = _rcf_sd(rng)
        path = tmp_path / "rcf.pth"
        torch.save(sd, path)

        params = rcf.load_torch_weights(str(path))
        img = rng.random((1, 32, 48)).astype(np.float32)
        edges_j = rcf.edge_map(params, jnp.asarray(img),
                               compute_dtype=jnp.float32)
        with torch.no_grad():
            x = torch.from_numpy(img * 255.0).unsqueeze(1).repeat(1, 3, 1, 1)
            edges_t = _torch_rcf(sd, x, 32, 48).numpy()
        np.testing.assert_allclose(np.asarray(edges_j), edges_t, atol=5e-4)


# ---------------------------------------------------------------------------
# npz round-trip (torch-free deployment format)
# ---------------------------------------------------------------------------


class TestNpzRoundTrip:
    def test_superglue_npz(self, tmp_path):
        import jax

        from rspl_slam_tpu.models.weights import (load_npz_pytree,
                                                  save_npz_pytree)

        cfg = SG_CFG
        params = superglue.init_params(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "sg.npz")
        save_npz_pytree(path, params)
        back = load_npz_pytree(path)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, back,
        )

    def test_convert_weights_cli(self, tmp_path):
        from rspl_slam_tpu import cli
        from rspl_slam_tpu.models.weights import load_npz_pytree

        rng = np.random.default_rng(4)
        sd = _superpoint_sd(rng)
        pth = str(tmp_path / "sp.pth")
        npz = str(tmp_path / "sp.npz")
        torch.save(sd, pth)
        cli.main(["convert-weights", "--model", "superpoint",
                  "--input", pth, "--output", npz])
        params = load_npz_pytree(npz)
        direct = superpoint.load_torch_weights(pth)
        assert set(params.keys()) == set(direct.keys())
        np.testing.assert_allclose(
            np.asarray(params["conv1a"]["w"]), np.asarray(direct["conv1a"]["w"])
        )

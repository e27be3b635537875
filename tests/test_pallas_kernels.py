"""Pallas kernel tests (interpreter mode — CPU-safe; the TPU path was
validated on hardware: sinkhorn matches XLA to 7e-6, attention to 1.4e-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.config import SuperGlueConfig
from rspl_slam_tpu.models import superglue, superpoint
from rspl_slam_tpu.models.superglue import _apply_mlp, _attention
from rspl_slam_tpu.ops.attention_pallas import attention_layer_fused
from rspl_slam_tpu.ops.conv_stem_pallas import superpoint_stem
from rspl_slam_tpu.ops.sinkhorn import log_optimal_transport_masked
from rspl_slam_tpu.ops.sinkhorn_pallas import log_optimal_transport_masked_pallas


class TestPallasSinkhorn:
    def test_matches_xla_with_masks(self):
        rng = np.random.default_rng(0)
        B, M, N = 2, 24, 40
        S = jnp.asarray(rng.standard_normal((B, M, N)).astype(np.float32))
        m0 = jnp.asarray(np.arange(M)[None] < np.array([[M], [17]]))
        m1 = jnp.asarray(np.arange(N)[None] < np.array([[33], [N]]))
        Zx = log_optimal_transport_masked(S, m0, m1, jnp.asarray(0.7), 50)
        Zp = log_optimal_transport_masked_pallas(
            S, m0, m1, jnp.asarray(0.7), 50, interpret=True
        )
        # compare on valid rows/cols (+ dustbins)
        mv = np.concatenate([np.asarray(m0), np.ones((B, 1), bool)], 1)
        nv = np.concatenate([np.asarray(m1), np.ones((B, 1), bool)], 1)
        sel = mv[:, :, None] & nv[:, None, :]
        err = np.abs(np.asarray(Zx) - np.asarray(Zp))[sel]
        assert err.max() < 1e-4, err.max()


class TestPallasAttention:
    def test_matches_xla_layer(self):
        cfg = SuperGlueConfig(num_gnn_layers=2)
        params = superglue.init_params(jax.random.PRNGKey(0), cfg)
        layer = params["gnn"][1]
        rng = np.random.default_rng(1)
        K, S, C = 48, 56, 256
        x = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
        src = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
        mask = jnp.asarray(np.arange(S) < 41)

        msg = _attention(layer, x[None], src[None], mask[None], 4, jnp.float32)
        delta = _apply_mlp(
            layer["mlp"], jnp.concatenate([x[None], msg], -1), jnp.float32
        )
        ref = (x[None] + delta)[0]
        out = attention_layer_fused(x, src, mask, layer, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=2e-4, rtol=1e-4)


class TestPallasConvStem:
    @pytest.mark.parametrize("H,W", [(32, 64), (40, 64)])  # 40 → half-res 20
    def test_matches_xla_stem(self, H, W):
        """Fused stem ≡ conv1a..conv2b + both pools of dense_heads (bf16).

        H=40 exercises the row-padding path (half-res 20 is not a multiple
        of the 16-row tile) used by OIVIO's 720-row images."""
        params = superpoint.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.random((2, H, W)).astype(np.float32))

        from rspl_slam_tpu.models.superpoint import _conv, _pool2

        relu = jax.nn.relu
        x = imgs[..., None]
        x = relu(_conv(x, params["conv1a"], jnp.bfloat16))
        x = relu(_conv(x, params["conv1b"], jnp.bfloat16))
        x = _pool2(x)
        x = relu(_conv(x, params["conv2a"], jnp.bfloat16))
        x = relu(_conv(x, params["conv2b"], jnp.bfloat16))
        ref = np.asarray(_pool2(x), np.float32)

        out = np.asarray(superpoint_stem(params, imgs, interpret=True),
                         np.float32)
        assert out.shape == ref.shape
        rel = np.abs(ref - out) / (np.abs(ref) + 1e-3)
        assert rel.max() < 0.05, rel.max()

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="needs real TPU (Mosaic lowering)")
    def test_matches_xla_stem_hardware(self):
        """Compiled-kernel parity on real hardware: exercises the Mosaic
        pieces the interpreter cannot (pltpu.roll 32-bit round-trip, halo
        DMA, VMEM block specs)."""
        params = superpoint.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.random((2, 64, 96)).astype(np.float32))

        from rspl_slam_tpu.models.superpoint import _conv, _pool2

        relu = jax.nn.relu
        x = imgs[..., None]
        x = relu(_conv(x, params["conv1a"], jnp.bfloat16))
        x = relu(_conv(x, params["conv1b"], jnp.bfloat16))
        x = _pool2(x)
        x = relu(_conv(x, params["conv2a"], jnp.bfloat16))
        x = relu(_conv(x, params["conv2b"], jnp.bfloat16))
        ref = np.asarray(_pool2(x), np.float32)

        out = np.asarray(superpoint_stem(params, imgs, interpret=False),
                         np.float32)
        assert out.shape == ref.shape
        rel = np.abs(ref - out) / (np.abs(ref) + 1e-3)
        assert rel.max() < 0.05, rel.max()

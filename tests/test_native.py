"""Native runtime tests: decode parity with PIL, remap parity with the JAX
path, threaded loader ordering + error handling."""

import os

import numpy as np
import pytest

from rspl_slam_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = (rng.uniform(size=(48, 64)) * 255).astype(np.uint8)
        p = str(d / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append((p, img))
    return paths


class TestDecode:
    def test_png_matches_pil(self, png_dir):
        p, img = png_dir[0]
        out = native.decode_gray(p, 48, 64)
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_jpeg_roundtrip(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(1)
        img = (rng.uniform(size=(32, 40)) * 255).astype(np.uint8)
        p = str(tmp_path / "x.jpg")
        Image.fromarray(img).save(p, quality=95)
        out = native.decode_gray(p, 32, 40)
        ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        assert np.abs(out - ref).max() < 0.02  # jpeg decoder tolerance

    def test_wrong_size_fails(self, png_dir):
        p, _ = png_dir[0]
        with pytest.raises(IOError):
            native.decode_gray(p, 100, 100)


class TestRemap:
    def test_matches_jax_path(self):
        import jax.numpy as jnp

        from rspl_slam_tpu.camera import remap_bilinear as jax_remap

        rng = np.random.default_rng(2)
        src = rng.uniform(size=(40, 56)).astype(np.float32)
        x, y = np.meshgrid(np.arange(56, dtype=np.float32),
                           np.arange(40, dtype=np.float32))
        maps = np.stack([x + rng.uniform(-2, 2, x.shape).astype(np.float32),
                         y + rng.uniform(-2, 2, y.shape).astype(np.float32)], -1)
        ref = np.asarray(jax_remap(jnp.asarray(src), jnp.asarray(maps)))
        out = native.remap_bilinear(src, maps)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestLoader:
    def test_ordered_prefetch(self, png_dir):
        paths = [p for p, _ in png_dir]
        loader = native.NativeStereoLoader(paths, paths, 48, 64, depth=2,
                                           threads=3)
        seen = []
        for idx, left, right in loader:
            seen.append(idx)
            np.testing.assert_allclose(left, right)
        loader.close()
        assert seen == list(range(6))

    def test_missing_file_raises(self, png_dir):
        paths = [p for p, _ in png_dir[:2]]
        bad = paths + ["/nonexistent.png"]
        loader = native.NativeStereoLoader(bad, bad, 48, 64)
        it = iter(loader)
        next(it)
        next(it)
        with pytest.raises(IOError):
            next(it)
        loader.close()

    def test_with_rectification(self, png_dir):
        paths = [p for p, _ in png_dir[:2]]
        x, y = np.meshgrid(np.arange(64, dtype=np.float32),
                           np.arange(48, dtype=np.float32))
        ident = np.stack([x, y], -1)
        loader = native.NativeStereoLoader(paths, paths, 48, 64,
                                           map_l=ident, map_r=ident)
        idx, left, right = next(iter(loader))
        ref = native.decode_gray(paths[0], 48, 64)
        # identity remap reproduces the source away from the clamp border
        np.testing.assert_allclose(left[:47, :63], ref[:47, :63], atol=1e-5)
        loader.close()


class TestNativeMergeLines:
    """Native MergeLines (rspl_runtime.cc::rspl_merge_lines) must be
    numerically interchangeable with the numpy implementation it
    accelerates (ops/lines.py::merge_lines, line_processor.cc:492-665)."""

    @pytest.mark.skipif(not native.available(), reason="native lib missing")
    def test_parity_random(self):
        rng = np.random.default_rng(7)
        from rspl_slam_tpu.ops import lines as lops

        for _ in range(60):
            n = int(rng.integers(2, 100))
            base = rng.uniform([0, 0, 0, 0], [752, 480, 752, 480],
                               (max(n // 2, 1), 4))
            segs = np.concatenate(
                [base, base + rng.normal(0, 3, base.shape)])[:n]
            a = lops.merge_lines(segs, 0.1, 15.0, 30.0, force_numpy=True)
            b = lops.merge_lines(segs, 0.1, 15.0, 30.0)
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-9)

    @pytest.mark.skipif(not native.available(), reason="native lib missing")
    def test_edge_cases(self):
        from rspl_slam_tpu.ops import lines as lops

        empty = np.zeros((0, 4))
        assert len(lops.merge_lines(empty)) == 0
        one = np.array([[0.0, 0.0, 50.0, 0.0]])
        np.testing.assert_allclose(lops.merge_lines(one), one)
        # two collinear overlapping segments merge into one
        two = np.array([[0.0, 0.0, 50.0, 0.0], [40.0, 0.5, 90.0, 0.5]])
        m = lops.merge_lines(two)
        assert m.shape == (1, 4)
        np.testing.assert_allclose(
            m, lops.merge_lines(two, force_numpy=True), atol=1e-9)

#!/usr/bin/env python
"""Cumulative-prefix timing of SuperPoint's internals on the chip."""

import time

import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rspl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rspl_slam_tpu.config import SuperPointConfig
    from rspl_slam_tpu.models import superpoint
    from rspl_slam_tpu.models.superpoint import _conv, _pool2
    from rspl_slam_tpu.ops.conv_stem_pallas import superpoint_stem

    H, W, K = 480, 752, 400
    sp_cfg = SuperPointConfig(max_keypoints=K, keypoint_threshold=1e-4)
    params = superpoint.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, H, W)).astype(np.float32))
    relu = jax.nn.relu
    cd = jnp.bfloat16

    def pfx_stem(im):
        return superpoint_stem(params, im)

    def pfx_s2(im):
        x = pfx_stem(im)
        x = relu(_conv(x, params["conv2a"], cd, cd))
        x = relu(_conv(x, params["conv2b"], cd, cd))
        return _pool2(x)

    def pfx_s3(im):
        x = pfx_s2(im)
        x = relu(_conv(x, params["conv3a"], cd, cd))
        x = relu(_conv(x, params["conv3b"], cd, cd))
        return _pool2(x)

    def pfx_s4(im):
        x = pfx_s3(im)
        x = relu(_conv(x, params["conv4a"], cd, cd))
        x = relu(_conv(x, params["conv4b"], cd, cd))
        return x

    def pfx_heads(im):
        x = pfx_s4(im)
        cPa = relu(_conv(x, params["convPa"], cd, cd))
        logits = _conv(cPa, params["convPb"], cd)
        probs = jax.nn.softmax(logits, axis=-1)[..., :64]
        cDa = relu(_conv(x, params["convDa"], cd, cd))
        desc = _conv(cDa, params["convDb"], cd)
        return probs, desc

    def full_extract(im):
        f = superpoint.extract(params, im, sp_cfg)
        return f.xy, f.desc

    # post-process sub-steps on the cell layout (the production path)
    from rspl_slam_tpu.models.superpoint import _forward_cell
    from rspl_slam_tpu.ops.keypoints import (sample_descriptors,
                                             simple_nms_cell,
                                             top_k_keypoints_cell)

    def pfx_nms(im):
        probs, desc = _forward_cell(params, im, cd)
        return simple_nms_cell(probs, sp_cfg.nms_radius), desc

    def pfx_topk(im):
        s, desc = pfx_nms(im)
        out = jax.vmap(lambda ss: top_k_keypoints_cell(
            ss, sp_cfg.max_keypoints, sp_cfg.keypoint_threshold,
            sp_cfg.remove_borders))(s)
        return out + (desc,)


    def chained(stage, iters=50):
        @jax.jit
        def run(im):
            def body(carry, _):
                out = stage(carry)
                live = sum(jnp.sum(o.astype(jnp.float32)) for o in
                           jax.tree_util.tree_leaves(out)) * 1e-12
                return carry + live * 1e-3, live
            _, ts = jax.lax.scan(body, im, None, length=iters)
            return ts.sum()
        return run

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.zeros(())))
    rtt = min(_timed(lambda: float(noop(jnp.zeros(())))) for _ in range(5))

    prev = 0.0
    for name, stage in [
        ("stem(1a+1b+pool)", pfx_stem),
        ("+stage2", pfx_s2),
        ("+stage3", pfx_s3),
        ("+stage4", pfx_s4),
        ("+heads", pfx_heads),
        ("+cell nms", pfx_nms),
        ("+topk", pfx_topk),
        ("full extract()", full_extract),
    ]:
        run = chained(stage)
        float(run(images))
        wall = min(_timed(lambda: float(run(images))) for _ in range(3))
        t = max(wall - rtt, 0.0) / 50 * 1e3
        print(f"{name:>18}: {t:7.3f} ms  (delta {t - prev:+.3f})")
        prev = t


if __name__ == "__main__":
    main()

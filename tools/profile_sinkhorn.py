#!/usr/bin/env python
"""XLA-scan vs fused-Pallas Sinkhorn at the matcher shape (B=2, 400, 400),
chained on-device so dispatch latency cannot hide anything."""

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

    from rspl_slam_tpu.ops.sinkhorn import log_optimal_transport_masked
    from rspl_slam_tpu.ops.sinkhorn_pallas import (
        log_optimal_transport_masked_pallas,
    )

    B, K = 2, 400
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((B, K, K)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, K)) < 0.9)
    mask1 = jnp.asarray(rng.random((B, K)) < 0.9)
    alpha = jnp.asarray(1.0)

    def chained(fn, iters=30):
        @jax.jit
        def run(s):
            def body(carry, _):
                Z = fn(carry, mask, mask1, alpha, 100)
                return carry + Z[:, :K, :K] * 1e-9, jnp.sum(Z) * 1e-12

            _, ts = jax.lax.scan(body, s, None, length=iters)
            return ts.sum()

        return run

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.zeros(())))
    rtt = min(_timed(lambda: float(noop(jnp.zeros(())))) for _ in range(5))

    for name, fn in [
        ("xla scan", log_optimal_transport_masked),
        ("pallas fused", log_optimal_transport_masked_pallas),
    ]:
        run = chained(fn)
        float(run(scores))
        wall = min(_timed(lambda: float(run(scores))) for _ in range(3))
        print(f"{name:>14}: {max(wall - rtt, 0.0) / 30 * 1e3:7.3f} ms")

    Za = log_optimal_transport_masked(scores, mask, mask1, alpha, 100)
    Zb = log_optimal_transport_masked_pallas(scores, mask, mask1, alpha, 100)
    err = float(jnp.max(jnp.abs(jnp.where(jnp.isfinite(Za), Za - Zb, 0.0))))
    print(f"max |diff| on finite entries: {err:.2e}")


if __name__ == "__main__":
    main()

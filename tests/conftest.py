"""Test harness: force JAX onto a virtual 8-device CPU mesh so multi-chip
sharding paths compile and run without TPU hardware.

Note: this environment may pre-import JAX and pin JAX_PLATFORMS to a TPU
plugin via sitecustomize, so setting the env var alone is not enough — the
config update below wins regardless of registration order. XLA_FLAGS must
still be set before the CPU backend is first initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

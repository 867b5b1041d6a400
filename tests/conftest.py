"""Test harness: run everything on a fake 8-device CPU backend so the
multi-chip sharding paths are exercised without TPU hardware (the TPU
analogue of a fake process group).

NOTE: this image pins JAX_PLATFORMS=axon via sitecustomize at interpreter
start, so env vars are too late — we must flip the platform through
jax.config before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, "expected 8 fake CPU devices for tests"

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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, "expected 8 fake CPU devices for tests"


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r3 #6). The default tier keeps every
    unit/oracle-math test plus ONE pod smoke
    (test_two_process_distributed_initialize) and must stay under ~6 min
    on a 1-core host; the `heavy` tier holds the 85-95 s subprocess pod
    proofs, the torch trajectory oracles, and the multi-minute
    convergence legs (the legacy `slow` marker is gated the same way).

    Selection: LR2PPO_HEAVY=1 runs everything (the verify skill sets it
    before shipping); naming a heavy test directly on the command line
    also runs it, so `pytest tests/test_multihost.py::test_x` still
    works without the env var.
    """
    if os.environ.get("LR2PPO_HEAVY") == "1":
        return
    # `pytest -m heavy` (or any -m expression naming the tiers) is an
    # explicit opt-in: deselection already happened, don't skip-mark the
    # survivors into a 0-passed run.
    markexpr = getattr(config.option, "markexpr", "") or ""
    if "heavy" in markexpr or "slow" in markexpr:
        return
    # Explicit CLI selection compares the nodeid's ::-suffix (which
    # includes any TestClass segment), not item.name, so
    # file::Class::test and parametrized ids both opt in.
    explicit = {a.split("::", 1)[1] for a in config.args if "::" in a}
    skip = pytest.mark.skip(
        reason="heavy tier: set LR2PPO_HEAVY=1 (verify skill runs it)")
    for item in items:
        if "heavy" in item.keywords or "slow" in item.keywords:
            ident = item.nodeid.split("::", 1)[1]
            if any(ident == e or ident.startswith(e + "[")
                   or ident.startswith(e + "::") for e in explicit):
                continue
            item.add_marker(skip)

"""Root conftest: force a deterministic 8-device CPU mesh for all tests.

The surrounding environment registers a tunneled TPU backend at interpreter
startup (sitecustomize imports jax itself), so plain env-var overrides are
ignored by the time pytest runs. We therefore override via jax.config, which
works as long as no computation has been dispatched yet. The 8 fake CPU
devices emulate an 8-chip TPU slice for sharding/collective tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

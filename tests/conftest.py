"""Test configuration: run on a virtual 8-device CPU platform.

The environment boots with an `axon` TPU plugin pre-registered (and
``JAX_PLATFORMS=axon`` exported), so plain env-var overrides are ignored;
``jax.config.update`` after import is the reliable switch.  Multi-chip
sharding is validated on host-platform devices — the box has at most one
real TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (see SURVEY.md §7).

The container's sitecustomize registers the 'axon' TPU-tunnel PJRT plugin and
programmatically sets jax_platforms='axon,cpu', overriding JAX_PLATFORMS from
the environment — so we must override via jax.config *after* import, before
any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

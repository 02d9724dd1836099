"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (the driver separately dry-runs multichip).

The TPU environment here registers its PJRT backend from sitecustomize and
pins JAX_PLATFORMS, so overriding the env var is not enough — we must flip
the jax config after import, before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# async tests run through aiohttp's pytest plugin (pytest-asyncio is not in
# the image)
pytest_plugins = ("aiohttp.pytest_plugin",)

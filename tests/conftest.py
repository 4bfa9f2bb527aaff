"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU plugin and force-sets
jax.config jax_platforms="axon,cpu" (overriding the JAX_PLATFORMS env var), so
tests must override via jax.config too — before any backend initializes.
bench.py keeps the real TPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

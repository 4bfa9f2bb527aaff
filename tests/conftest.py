"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment presets JAX_PLATFORMS=axon (one real TPU chip via tunnel);
tests must override -- force, not setdefault -- so sharding tests see 8 CPU
devices and jit compiles stay fast. bench.py keeps the real TPU.
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

"""TPU-marked regression job: runs on the REAL backend (no CPU forcing).

The main suite (tests/) forces a virtual 8-device CPU mesh; Pallas kernels
there run interpret=True only. This job closes the gap between "a bench
artifact says the kernel ran once on silicon" and "regression-tested on
silicon" (reference analog: the CTest+sanitizer lattice,
CMakeLists.txt:263-265). Collection is skipped entirely off-TPU.

Run: python -m pytest tests_tpu/ -q   (or tools/ci.sh, which includes it
when a TPU is visible).
"""
import pytest


def pytest_collection_modifyitems(config, items):
    import jax
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a real TPU backend")
        for it in items:
            it.add_marker(skip)

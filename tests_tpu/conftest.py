"""On-hardware test configuration — real TPU, NOT the virtual CPU mesh.

The main suite (tests/) forces JAX_PLATFORMS=cpu so sharding tests run on
a virtual 8-device mesh; everything Pallas there runs in interpret mode.
This directory holds the non-interpret parity tests that must execute on
actual TPU hardware (Mosaic compilation, tile alignment, mixed-precision
MXU behavior). Run manually:

    python -m pytest tests_tpu/ -q

Skipped automatically when no TPU backend is available.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon") \
            or "TPU" in str(jax.devices()[0])
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            item.add_marker(skip)

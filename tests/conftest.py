"""Test configuration: force a virtual 8-device CPU mesh before JAX import
so multi-chip sharding paths are exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS from the environment; the config
# update below reliably pins tests to the virtual 8-device CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_precip():
    """Synthetic radar-like precipitation sequence in mm/h.

    Gaussian rain cells with a multiscale correlated texture, advected by a
    known constant motion — the framework's stand-in for the pysteps-data
    archives (unavailable offline); mirrors the synthetic-truth strategy of
    the reference's motion tests (pysteps/tests/test_motion.py:44-123).
    """
    from helpers import make_synthetic_sequence
    return make_synthetic_sequence()


@pytest.fixture(scope="session")
def synthetic_metadata():
    return {
        "accutime": 5,
        "unit": "mm/h",
        "transform": None,
        "zerovalue": 0.0,
        "threshold": 0.1,
        "xpixelsize": 1000.0,
        "ypixelsize": 1000.0,
        "x1": 0.0,
        "x2": 256000.0,
        "y1": 0.0,
        "y2": 256000.0,
        "yorigin": "upper",
    }

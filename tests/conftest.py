"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This mirrors the reference's no-cluster multi-process tests
(habitat-lab/test/test_habitat_env.py:101-163) — we validate multi-chip
sharding logic without TPU hardware via XLA's host-device virtualization.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This mirrors the reference's no-cluster multi-process tests
(habitat-lab/test/test_habitat_env.py:101-163) — we validate multi-chip
sharding logic without TPU hardware via XLA's host-device virtualization.

NOTE: the environment pre-imports jax with JAX_PLATFORMS=axon baked into the
config defaults, so the env var alone is not enough — jax.config.update is
required before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

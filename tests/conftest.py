"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no fake-backend mechanism (SURVEY.md section 4); here every
test runs without TPU hardware via XLA's host-platform device virtualization,
so multi-chip sharding tests execute on any machine.
"""

import os

# Force the CPU backend (the session environment presets JAX_PLATFORMS to the
# TPU tunnel; tests must not depend on hardware).  Set OCP_TEST_PLATFORM to
# override, e.g. for on-TPU smoke testing.
os.environ["JAX_PLATFORMS"] = os.environ.get("OCP_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no fake-backend mechanism (SURVEY.md section 4); here every
test runs without TPU hardware via XLA's host-platform device virtualization,
so multi-chip sharding tests execute on any machine.

Note: the session image pre-registers a TPU backend from ``sitecustomize``
(interpreter startup, before pytest/conftest can touch the environment), so
setting ``JAX_PLATFORMS`` here is not enough — we must also clear the
already-initialized backends and re-resolve onto CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("OCP_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
try:
    from jax.extend import backend as _jax_backend

    _jax_backend.clear_backends()
except Exception:  # pragma: no cover - best effort; env vars may suffice
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

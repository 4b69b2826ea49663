"""Test environment: force a virtual 8-device CPU mesh so sharding/pjit tests
run without TPU hardware (mirrors SURVEY.md §4 multi-host test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # numerics tests are deterministic on CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon site-package overrides JAX_PLATFORMS; pin the platform explicitly
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_close(a, b, rtol=1e-5, atol=1e-5, msg=""):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=msg)

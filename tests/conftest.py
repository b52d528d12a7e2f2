"""Test configuration: force the CPU backend with 8 virtual devices so the
whole suite — including multi-chip sharding tests — runs without TPUs."""

import os

# The ambient environment may pin JAX_PLATFORMS to the TPU backend; tests
# always run on CPU (with a virtual 8-device mesh) unless explicitly opted in.
if os.environ.get("WLD_TEST_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("WLD_TEST_ON_TPU") != "1":
    # A sitecustomize hook may already have imported jax (baking in the
    # ambient JAX_PLATFORMS) and registered an experimental TPU-tunnel PJRT
    # plugin whose lazy init performs network I/O with multi-minute stalls.
    # Tests are CPU-only: pin the live config to cpu and drop the factory
    # before any backend init.
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

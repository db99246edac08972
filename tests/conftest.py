"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (mesh/pjit/shard_map) is exercised without TPU hardware.

The ambient environment pre-imports jax and registers the ``axon`` TPU
backend via ``/root/.axon_site/sitecustomize.py`` (PYTHONPATH), which wins
over the JAX_PLATFORMS env var — so the platform must be forced through
``jax.config`` after import, and XLA_FLAGS must be set before the backend
is first resolved.
"""

import os

# The shipped environment sets JAX_PLATFORMS=axon; env-gated TPU paths (the
# cli hard-exit teardown workaround) must never see it during an in-process
# test run — with it set, the first cli.main() call used to os._exit(0) the
# whole pytest process after 7 tests with rc=0 (round-4 silent false
# success). The backend itself is forced to CPU below via jax.config.
os.environ.pop("JAX_PLATFORMS", None)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

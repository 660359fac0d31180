"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated
against XLA's CPU backend with 8 virtual devices (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# NOTE: the environment pre-sets JAX_PLATFORMS=axon (single real TPU via
# tunnel); tests force the CPU backend with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter startup, overriding JAX_PLATFORMS; force CPU
# back for the test suite.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the LDPC while_loop and scan pipelines are slow to
# compile on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_projectultra")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data", "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


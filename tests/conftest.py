"""Test config: CPU backend with 8 virtual devices.

Mirrors the reference's test strategy (SURVEY.md §4): exact tiny-graph
tests run anywhere; multi-chip sharding is exercised on a virtual
8-device CPU mesh (the TPU substitute for the reference's
thread+barrier concurrency tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache cuts suite time on re-runs.
import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var in this
# environment; the config API wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/graph_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

RESOURCES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "resources")
REF_RESOURCES = "/root/reference/resources"


def resource(name: str) -> str:
    """Path to a test fixture; prefers repo-local, falls back to reference."""
    local = os.path.join(RESOURCES, name)
    if os.path.exists(local):
        return local
    ref = os.path.join(REF_RESOURCES, name)
    if os.path.exists(ref):
        return ref
    raise FileNotFoundError(name)


@pytest.fixture(scope="session")
def scale8_path():
    return resource("scale_8.graph500")


@pytest.fixture(scope="session")
def test_el_path():
    return resource("test.el")


@pytest.fixture(scope="session")
def test_wel_path():
    return resource("test.wel")

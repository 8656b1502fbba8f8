"""Test harness: force CPU backend with 8 virtual devices so multi-chip
sharding paths (mesh/shard_map) are exercised without TPU hardware — this is
the 'fake backend' test strategy SURVEY.md §4 calls for. Must run before jax
is imported anywhere."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(1234)

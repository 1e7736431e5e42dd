"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must be hermetic and exercise multi-chip sharding without TPU hardware,
so we pin the CPU platform with 8 virtual devices (SURVEY.md section 4,
"multi-host tests that shard a small trace over a CPU mesh").

Note: this environment's sitecustomize registers an `axon` TPU PJRT plugin
and force-sets ``jax_platforms="axon,cpu"`` via jax.config — env vars alone
cannot override it, so we call ``jax.config.update`` after import (backends
initialize lazily, so this takes effect as long as it runs before first use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# The persistent compilation cache is deliberately NOT enabled here: with it
# on, the full suite segfaults deterministically inside jaxlib's cache
# (de)serialization on this host — r4 saw it in put_executable_and_time
# during the mesh-rows-8 prove, and the r5 repro crashed in
# get_executable_and_time at test_config_profiler.py:96 (logs in
# docs/testlogs/).  In-process jit caching still applies; only cross-run
# persistence is lost.  Opt back in with ZKVM_TEST_CACHE=1 to bisect.
if os.environ.get("ZKVM_TEST_CACHE", "") == "1":
    from zkvm.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache("/tmp/zkvm_jax_cache_tests")

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)

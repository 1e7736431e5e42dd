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

# Root cause of the r4/r5 full-suite segfaults (finally pinned in r5): the
# suite JIT-compiles thousands of XLA:CPU executables in one process; each
# holds mmap'd JIT code regions, and the process crosses the kernel's
# vm.max_map_count (65530 here) mid-run — the next mmap fails and
# jaxlib/LLVM segfault, whether the executable comes from a fresh compile
# (backend_compile_and_load) or a persistent-cache load
# (get_executable_and_time).  Measured: ~33k maps two minutes in; crashes
# landed deterministically at the first sizeable compile/load past the
# limit (~54% of the suite), independent of stack size and of which test
# ran there (docs/testlogs/r5_*).
#
# Defense: drop compiled executables at module boundaries so live mappings
# stay bounded (fixture below), and enable the persistent compilation
# cache so re-deriving a shared stage in a later module is a fast cache
# load instead of a minutes-long recompile.  Disable with ZKVM_TEST_CACHE=0.
if os.environ.get("ZKVM_TEST_CACHE", "") != "0":
    from zkvm.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache("/tmp/zkvm_jax_cache_tests")

import random

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mappings():
    """Free compiled executables after each test module (see header)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)

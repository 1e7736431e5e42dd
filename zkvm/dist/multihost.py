"""Multi-host runtime: ``jax.distributed`` bootstrap + host-spanning meshes.

SURVEY.md section 2.3 P5: the distributed backend for the TPU build is the
XLA collective runtime itself — ICI within a slice, DCN across hosts via
``jax.distributed`` — no NCCL/MPI layer exists or is needed (the reference
is single-threaded, Cargo.lock has no rayon).

One process per host. Every process calls :func:`initialize` with the same
coordinator, then builds the same global mesh with :func:`make_global_mesh`.
The prover's device stages (four-step NTT, halo constraint evaluation,
Merkle forest) are pure SPMD — shard_map + explicit collectives — so they
run unchanged over a host-spanning mesh, with the class-boundary
``all_to_all``s riding ICI within a slice and DCN across hosts.  The
host-side proof assembly (root fetch, query-path gathers) additionally
needs each value replicated to every process, which
:func:`replicate_to_hosts` provides.

Environment-variable driven (ZKVM_COORDINATOR, ZKVM_NUM_PROCESSES,
ZKVM_PROCESS_ID) so a pod launch is just the same command on every host;
on TPU pods the three values can also be auto-detected by jax.distributed
itself, in which case plain ``initialize()`` suffices.

Testable without a pod: ``scripts/multihost_smoke.py`` launches two
CPU processes that each own half the virtual devices of one mesh and
checks the proof-byte invariant across process counts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


_INITIALIZED = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or create) the jax.distributed runtime; idempotent.

    Arguments default to ZKVM_COORDINATOR / ZKVM_NUM_PROCESSES /
    ZKVM_PROCESS_ID, then to jax's own cluster auto-detection (TPU pods).
    Safe to call in a single-process run with no configuration at all — it
    then does nothing, and the local devices are the world.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator = coordinator or os.environ.get("ZKVM_COORDINATOR")
    n = num_processes if num_processes is not None else os.environ.get(
        "ZKVM_NUM_PROCESSES"
    )
    pid = process_id if process_id is not None else os.environ.get(
        "ZKVM_PROCESS_ID"
    )
    if coordinator is None and n is None and pid is None:
        in_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        )
        if not in_pod:
            return  # single-process: local devices are the world
        jax.distributed.initialize()
    else:
        # partial configuration would make jax.distributed hang on
        # auto-detection or fail obscurely — demand all three up front
        missing = [
            name
            for name, val in (
                ("ZKVM_COORDINATOR", coordinator),
                ("ZKVM_NUM_PROCESSES", n),
                ("ZKVM_PROCESS_ID", pid),
            )
            if val is None
        ]
        if missing:
            raise ValueError(
                "jax.distributed configuration is incomplete: missing "
                + ", ".join(missing)
                + " (set all of ZKVM_COORDINATOR, ZKVM_NUM_PROCESSES, "
                "ZKVM_PROCESS_ID, or none for single-process/auto-detect)"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(n),
            process_id=int(pid),
        )
    _INITIALIZED = True


def make_global_mesh(axis: str = "row"):
    """1-D mesh over ALL processes' devices (jax.devices() is global after
    :func:`initialize`).  Mesh axis order is identical on every process,
    which is all SPMD needs."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def replicate_to_hosts(x):
    """Fetch a (possibly non-addressable) global array to host numpy on
    EVERY process.  Single-process: a plain transfer."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def process_info() -> dict:
    """Host-level topology facts for logs / profilers."""
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )

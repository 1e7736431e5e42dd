"""Distributed layer: multi-chip sharding of the prover (SURVEY.md section 2.3).

The prover's long axis is the LDE row dimension (up to 2^23 rows); it is
sharded across chips via a ``jax.sharding.Mesh`` ("sequence parallel"
analogue).  The heavy stages use explicit collectives:

* :mod:`zkvm.dist.ntt_dist` — four-step NTT with three ``all_to_all``
  exchanges (the butterfly network's global data movement, SURVEY P3);
* :mod:`zkvm.air.constraints_dist` — constraint evaluation with a single
  ``ppermute`` halo exchange for the next-row frame;
* :func:`zkvm.hash.blake3_jax.merkle_forest_flat` — per-device Merkle
  subtrees, host-combined top (SURVEY P4).

``zkvm.prover.prove(..., mesh=...)`` threads a mesh through the full real
pipeline and produces byte-identical proofs at any mesh size.

Multi-host (DCN) runs bootstrap through :mod:`zkvm.dist.multihost`
(``jax.distributed`` + host-spanning meshes; two-process CPU smoke in
scripts/multihost_smoke.py).
"""

from .mesh import make_mesh, row_sharding, replicated
from .multihost import initialize, make_global_mesh, replicate_to_hosts
from .ntt_dist import ntt_sharded, intt_sharded, coset_lde_sharded
from .sharded import sharded_prove_step

__all__ = [
    "make_mesh",
    "row_sharding",
    "replicated",
    "initialize",
    "make_global_mesh",
    "replicate_to_hosts",
    "ntt_sharded",
    "intt_sharded",
    "coset_lde_sharded",
    "sharded_prove_step",
]

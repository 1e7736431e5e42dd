"""Distributed layer: multi-chip sharding of the prover (SURVEY.md section 2.3).

The prover's long axis is the LDE row dimension (up to 2^23 rows); it is
sharded across chips via a ``jax.sharding.Mesh`` ("sequence parallel"
analogue).  Collectives arise implicitly from XLA:

* the next-row frame shift (``jnp.roll``) becomes a collective permute over
  ICI (ring exchange of the boundary block);
* NTT butterfly stages whose stride crosses the shard boundary become
  all-to-alls;
* Merkle level reduction gathers log2(shard) upper levels.

The composition's 8 columns and the 28 trace columns map onto a second mesh
axis ("tensor parallel" analogue) when available.
"""

from .mesh import make_mesh, row_sharding, replicated
from .sharded import sharded_prove_step

__all__ = ["make_mesh", "row_sharding", "replicated", "sharded_prove_step"]

"""Sharded transition-constraint evaluation (explicit halo exchange).

The constraint merge is elementwise over the LDE domain except for the
"next row" view, which is the same array shifted by ``blowup`` rows — on a
row-sharded mesh each device only needs the first ``blowup`` rows of its
right neighbour.  This wraps :func:`zkvm.air.constraints_jax.merged_transition`
in a ``shard_map`` whose only collective is ONE ``ppermute`` of a
``(28, blowup, 8)`` halo block per device — no global roll, no gathers.

Bit-identical to the single-device path (pure relabeling of the same exact
integer arithmetic).  Reference analogue: hot loop #3 (air/src/lib.rs:104-168)
had no parallelism; this is SURVEY.md section 2.3 P1+P3 applied to W4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .constraints_jax import merged_transition


@functools.partial(
    jax.jit, static_argnames=("blowup", "delta", "mesh", "axis")
)
def merged_transition_sharded(
    lde: jnp.ndarray,
    blowup: int,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
    alphas: jnp.ndarray,
    mesh: Mesh,
    axis: str = "row",
) -> jnp.ndarray:
    """merged_transition over a row-sharded LDE; returns (D, 8) row-sharded."""
    p = mesh.shape[axis]
    perm = [(i, (i - 1) % p) for i in range(p)]

    def local(lde_l, mask_l, ark_l, alphas_l):
        # halo: my first `blowup` rows go to my left neighbour, whose next
        # rows wrap into my block's tail
        head = lde_l[:, :blowup, :]
        from_right = jax.lax.ppermute(head, axis, perm)
        nxt_l = jnp.concatenate([lde_l[:, blowup:, :], from_right], axis=1)
        return merged_transition(
            lde_l, blowup, mask_l, ark_l, delta, alphas_l, nxt=nxt_l
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(axis, None),
            P(None, axis, None),
            P(None, None),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )(lde, mask, ark, alphas)

"""Distributed NTT: four-step decomposition over a device mesh (SURVEY P3).

This is the project's sequence-parallel / ring-attention analogue: the LDE
row axis (up to 2^23) is sharded over the mesh, and the butterfly network's
global data movement is factored into THREE explicit ``all_to_all``
exchanges over ICI, with every arithmetic stage purely local.

Four-step derivation for N = P * L (P devices, L rows per device), writing
an input index n = n1*L + n2 (n1 = device, n2 local) and an output index
k = k1 + P*k2:

    X[k1 + P*k2] = NTT_L over n2 [ w^(n2*k1) * NTT_P over n1 [ x[n1*L + n2] ] ]

1. all_to_all #1: (device=n1, local n2) -> (all n1, n2-slice) — each
   device receives the full block-index axis for L/P of its columns;
2. local P-point NTTs along n1 + twiddle multiply by w^(n2*k1)
   (twiddles built on device from one P-entry replicated table);
3. all_to_all #2: regroup so device q holds k1=q for ALL n2;
4. local L-point NTT along n2;
5. all_to_all #3 + local transpose: convert the k = q + P*k2 strided
   layout back to natural contiguous shards.

All arithmetic is exact limb arithmetic — results are bit-identical to the
single-device :func:`zkvm.ntt.ntt_jax.ntt` (golden-tested).  The reference
has no parallelism at all (SURVEY.md section 2.3); this replaces winterfell's
single-core LDE (winter-prover's DefaultTraceLde) at multi-chip scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.ntt import ntt_jax as nj


def _local_ntt(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Single-device NTT along axis -2 (delegates to the Pease-network core)."""
    if x.shape[-2] == 1:
        return x
    return nj._ntt_core(x, inverse)


def _twiddles(n: int, p: int, chunk: int, q, inverse: bool) -> jnp.ndarray:
    """(P, chunk, 8) limb array of w_N^(k1*n2), n2 = q*chunk + i (traced q).

    Built from one replicated P-entry table of w^(r*chunk) plus an on-device
    ladder — no O(N) twiddle tensor is ever materialized or gathered.
    """
    w = f128.get_root_of_unity(n)
    if inverse:
        w = f128.finv(w)
    starts = jnp.asarray(
        jf.to_limbs([pow(w, r * chunk, f128.P) for r in range(p)])
    )  # (P, 8) replicated
    base = jnp.asarray(jf.to_limbs(w))
    v = nj.ladder(base, starts[q], chunk)  # (chunk, 8) = w^(n2) for local i
    rows = [jf.ones((chunk,))]
    for _ in range(p - 1):
        rows.append(jf.fmul(rows[-1], v))
    return jnp.stack(rows, axis=0)  # (P, chunk, 8), row k1 = w^(k1*n2)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "inverse", "scale")
)
def _ntt_dist(x: jnp.ndarray, mesh: Mesh, axis: str, inverse: bool, scale: int):
    """x: (..., N, 8) sharded on axis -2 -> NTT(x), same sharding, natural order."""
    n = x.shape[-2]
    p = mesh.shape[axis]
    l = n // p
    chunk = l // p
    assert n % p == 0 and l % p == 0, "need N >= P^2 with power-of-two shapes"
    batch = x.shape[:-2]
    nb = len(batch)

    def local(xb):  # (..., L, 8): rows n = q*L + n2
        q = jax.lax.axis_index(axis)
        # exchange #1: split n2 into P chunks -> (all n1, one n2-chunk) each
        y = xb.reshape(batch + (p, chunk, jf.NLIMBS))
        y = jax.lax.all_to_all(y, axis, split_axis=nb, concat_axis=nb)
        # local P-point NTTs along n1 + twiddle w^(n2*k1)
        y = jnp.moveaxis(_local_ntt(jnp.moveaxis(y, nb, -2), inverse), -2, nb)
        y = jf.fmul(y, _twiddles(n, p, chunk, q, inverse))
        # exchange #2: device q takes k1=q for ALL n2
        y = jnp.expand_dims(y, nb + 1)  # (..., P, 1, chunk, 8)
        y = jax.lax.all_to_all(y, axis, split_axis=nb, concat_axis=nb + 1)
        y = y.reshape(batch + (l, jf.NLIMBS))  # k1=q, n2 natural
        # local L-point NTT along n2 -> X[q + P*k2] over k2
        y = _local_ntt(y, inverse)
        # exchange #3: back to natural contiguous shards
        y = y.reshape(batch + (p, chunk, jf.NLIMBS))  # chunk r: k2 block r
        y = jax.lax.all_to_all(y, axis, split_axis=nb, concat_axis=nb)
        # received [src q', j] = X[r*L + q' + P*j] -> natural local order
        y = jnp.moveaxis(y, nb, nb + 1).reshape(batch + (l, jf.NLIMBS))
        if scale != 1:
            y = jf.fmul(y, jf.constant(scale % f128.P))
        return y

    spec = P(*([None] * nb), axis, None)
    sharded = NamedSharding(mesh, spec)
    fn = shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    return fn(jax.lax.with_sharding_constraint(x, sharded))


def _four_step_ok(n: int, mesh: Mesh, axis: str) -> bool:
    p = mesh.shape[axis]
    return n % p == 0 and (n // p) % p == 0


def ntt_sharded(x: jnp.ndarray, mesh: Mesh, axis: str = "row") -> jnp.ndarray:
    """Forward NTT of (..., N, 8) sharded over ``axis`` (natural order).

    Arrays too small for the four-step split (N < P^2) fall back to the
    single-device network under GSPMD — same values, trivial sizes.
    """
    if not _four_step_ok(x.shape[-2], mesh, axis):
        return nj.ntt(x)
    return _ntt_dist(x, mesh, axis, False, 1)


def intt_sharded(x: jnp.ndarray, mesh: Mesh, axis: str = "row") -> jnp.ndarray:
    """Inverse NTT (scales by 1/N) of a sharded (..., N, 8) array."""
    n = x.shape[-2]
    if not _four_step_ok(n, mesh, axis):
        return nj.intt(x)
    return _ntt_dist(x, mesh, axis, True, f128.finv(n))


def coset_lde_sharded(
    coeffs: jnp.ndarray,
    blowup: int,
    mesh: Mesh,
    axis: str = "row",
    offset: int = f128.DOMAIN_OFFSET,
) -> jnp.ndarray:
    """Sharded coset LDE: (..., T, 8) coefficients -> (..., blowup*T, 8).

    Coset scaling + zero-pad run under GSPMD (elementwise / layout-only);
    the big transform itself is the explicit-collective four-step NTT.
    """
    t = coeffs.shape[-2]
    ladder = nj.power_ladder_device(offset, t)
    scaled = jf.fmul(coeffs, ladder)
    pad = [(0, 0)] * scaled.ndim
    pad[-2] = (0, (blowup - 1) * t)
    padded = jnp.pad(scaled, pad)
    return ntt_sharded(padded, mesh, axis)

"""Periodic columns (CYCLE_MASK + 8 ARK columns) evaluated over domains.

A periodic column with 16-step cycle has interpolant ``poly16(x^(T/16))``;
on the LDE coset ``s * <w_D>`` its values repeat with period ``16 * blowup``,
so we evaluate the tiny degree-<16 polynomial on a 16*blowup-point coset
host-side and tile it on device (air/src/lib.rs:201-225 semantics).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash.rescue import get_round_constants
from zkvm.ntt import golden as gntt
from .layout import CYCLE_MASK

CYCLE = 16


@functools.lru_cache(maxsize=None)
def _periodic_small(trace_len: int, blowup: int):
    """(9, 16*blowup) host values: CYCLE_MASK then 8 ARK columns on the coset."""
    offset = pow(f128.DOMAIN_OFFSET, trace_len // CYCLE, f128.P)
    cols = [CYCLE_MASK] + get_round_constants()
    out = []
    for cycle in cols:
        coeffs = gntt.intt(list(cycle))
        out.append(gntt.coset_lde(coeffs, blowup, offset))
    return np.asarray(jf.to_limbs(out))  # (9, 16*blowup, 8)


def periodic_lde(trace_len: int, blowup: int):
    """(mask, ark) device arrays over the LDE domain: (D, 8) and (8, D, 8)."""
    small = jnp.asarray(_periodic_small(trace_len, blowup))
    d = trace_len * blowup
    reps = d // (CYCLE * blowup)
    tiled = jnp.tile(small, (1, reps, 1))  # (9, D, 8)
    return tiled[0], tiled[1:]


def periodic_class_patterns(trace_len: int, blowup: int):
    """Per-residue-class 16-step patterns: mask (B,16,8), ark (B,8,16,8).

    LDE position i = r + blowup*k (class r, local index k).  The period-
    ``16*blowup`` coset values restricted to class r have literal period 16
    in k, so each class is one 16-value pattern; the full per-class column
    is ``jnp.tile(pattern, T//16)`` along k.  Only the patterns are
    materialized here — tiling happens INSIDE the per-class jit bodies, so
    the O(blowup * 9 * T) tensor (9.7 GB at T=2^20, which OOMed the v5e's
    HBM before round 4) never exists; XLA sees one (9, T)-ish transient per
    class at most.  Tiled-and-sliced equivalence with :func:`periodic_lde`
    at ``[r::blowup]`` is pinned by tests/test_air_jax.py.
    """
    small = jnp.asarray(_periodic_small(trace_len, blowup))  # (9, 16*blowup, 8)
    per_class = jnp.stack(
        [small[:, r::blowup, :] for r in range(blowup)], axis=0
    )  # (blowup, 9, 16, 8)
    return per_class[:, 0], per_class[:, 1:]


def periodic_at(trace_len: int, x: int):
    """Host eval of (mask, ark[8]) at an arbitrary point x (OOD checks)."""
    y = pow(x, trace_len // CYCLE, f128.P)
    cols = [CYCLE_MASK] + get_round_constants()
    vals = [gntt.eval_poly(gntt.intt(list(c)), y) for c in cols]
    return vals[0], vals[1:]

"""Multi-point polynomial evaluation on the MXU (systolic array).

rows[q][c] = sum_t coeffs[c][t] * pt_q^t is a (C, T) x (T, Q) contraction —
exactly what the MXU is for.  Field elements decompose into 32 four-bit
limbs (nibbles), so the whole contraction becomes ONE s8 x s8 -> s32
``dot_general``: S[c*32+i][q*32+j] = sum_t A_i[c,t] * B_j[q,t], with every
accumulator exact (15 * 15 * 2^20 < 2^28 < 2^31).  The f128 values are
reassembled EXACTLY on host from bucket sums over i+j (split into 16-bit
halves on device so the 32-term bucket additions cannot overflow int32),
where the final mod-p reduction is a handful of Python big-int ops per
opened value — which is where query rows and OOD frames were headed anyway.

Replaces ~Q full-width limb evaluations (seconds of VPU work per proof at
T=2^16) with ~60 G MACs on the MXU plus O(Q*C) host arithmetic.

The point power ladders build as an outer product of two O(sqrt T) ladders
(pt^t = pt^(t mod S) * (pt^S)^(t div S)), one broadcast fmul instead of
log2(T) doubling passes over the full array.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf


def _nibbles(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, T) u32 16-bit limbs -> (..., 32, T) int8 nibbles (LSB first:
    limb i supplies nibble slots 4i..4i+3, weight 2^(4*(4i+n)))."""
    parts = [
        ((x >> jnp.uint32(4 * n)) & jnp.uint32(0xF)).astype(jnp.int8)
        for n in range(4)
    ]
    s = jnp.stack(parts, axis=-2)  # (..., 8, 4, T): flat slot = 4i + n
    return s.reshape(x.shape[:-2] + (32, x.shape[-1]))


@jax.jit
def _contract(coeffs_t: jnp.ndarray, lads_t: jnp.ndarray):
    """(C, 8, T) x (Q, 8, T) -> bucket halves (63, 2, C, Q) int32.

    One MXU dot over the nibble decomposition, then exact anti-diagonal
    bucket sums with each s32 split into 16-bit halves before adding (<= 32
    terms of < 2^16 each — no overflow)."""
    c, _, t = coeffs_t.shape
    q = lads_t.shape[0]
    a = _nibbles(coeffs_t).reshape(c * 32, t)
    b = _nibbles(lads_t).reshape(q * 32, t)
    s = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).reshape(c, 32, q, 32)
    lo = s & jnp.int32(0xFFFF)
    hi = s >> jnp.int32(16)
    out = jnp.zeros((63, 2, c, q), jnp.int32)
    for k in range(63):
        terms_lo = []
        terms_hi = []
        for i in range(max(0, k - 31), min(32, k + 1)):
            terms_lo.append(lo[:, i, :, k - i])
            terms_hi.append(hi[:, i, :, k - i])
        out = out.at[k, 0].set(sum(terms_lo))
        out = out.at[k, 1].set(sum(terms_hi))
    return out


def _ladders(points: Sequence[int], t: int) -> jnp.ndarray:
    """(Q, 8, T) u32 power ladders (sqrt-split build inside ladders_t)."""
    from zkvm.ntt import ntt_t as nt

    return nt.ladders_t(jnp.asarray(jf.to_limbs(list(points))), t)



def multi_eval_rows(coeffs_t: jnp.ndarray, points: Sequence[int]) -> List[List[int]]:
    """Evaluate the C transposed column polynomials at each point; host ints.

    Exact: the MXU accumulators and bucket halves never overflow, and the
    base-2^4 recombination mod p happens in Python big ints.

    Exactness requires 15*15*T < 2^31, i.e. T <= 2^23 (at 2^24 the s32
    MXU accumulator could wrap); the largest supported domain is the
    2^23-point LDE of a 2^20-row trace, so this is a hard guard, not a
    practical limit.
    """
    t = coeffs_t.shape[-1]
    if t > (1 << 23):
        raise ValueError(
            f"multi_eval_rows: T={t} exceeds 2^23; the s8 MXU contraction "
            "would overflow its int32 accumulator (needs 225*T < 2^31)"
        )
    if t >= (1 << 18) and len(points) > 2:
        # batch points in pairs past T=2^18: the sqrt-split ladder build
        # materializes (Q, 8, T) through a broadcast limb fmul whose
        # carry/product temporaries are ~10x the output (40 GB at Q=32,
        # T=2^20 — measured HBM OOM at query assembly; Q=2 is the OOD
        # shape that fits).  Pure host-side batching; values unchanged.
        rows: List[List[int]] = []
        for i in range(0, len(points), 2):
            rows.extend(multi_eval_rows(coeffs_t, points[i : i + 2]))
        return rows
    lads = _ladders(points, t)
    buckets = np.asarray(_contract(coeffs_t, lads)).astype(np.int64)
    vals = buckets[:, 0] + (buckets[:, 1] << 16)  # (63, C, Q) exact
    c = coeffs_t.shape[0]
    rows: List[List[int]] = []
    for qi in range(len(points)):
        row = []
        for ci in range(c):
            acc = 0
            for k in range(63):
                acc += int(vals[k, ci, qi]) << (4 * k)
            row.append(acc % f128.P)
        rows.append(row)
    return rows

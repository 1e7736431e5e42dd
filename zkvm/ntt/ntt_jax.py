"""Batched radix-2 NTT / iNTT / coset LDE on TPU (limb arithmetic).

Transforms operate on arrays shaped ``(..., N, 8)`` — any leading batch axes
(trace columns), transform axis N, trailing f128 limb axis.  The algorithm
is the textbook iterative decimation-in-time NTT:

* one bit-reversal gather (host-precomputed int32 index vector);
* ``log2 N`` butterfly stages, each a reshape + one vectorized field
  multiply of the odd lanes by a strided slice of the twiddle table.

Twiddle tables (N/2 roots of unity, forward and inverse, plus coset power
ladders) are precomputed host-side per domain size and cached as device
arrays — a :class:`Domain` owns them.  Everything inside :func:`ntt` is pure
jittable JAX; butterflies vectorize over (batch x N/2) lanes on the VPU.

This is the TPU-native replacement for winterfell's LDE (SURVEY.md W2):
interpolate trace columns (iNTT over the size-T subgroup), evaluate on the
size-8T coset (offset = field generator 3, matching winterfell's
StarkDomain).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf


@functools.lru_cache(maxsize=None)
def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _twiddle_table(n: int, inverse: bool) -> np.ndarray:
    """uint32 limb array (n//2, 8): w^k for k < n/2 (w = 2^k-th root)."""
    w = f128.get_root_of_unity(n)
    if inverse:
        w = f128.finv(w)
    tw = [1] * (n // 2)
    for k in range(1, n // 2):
        tw[k] = f128.fmul(tw[k - 1], w)
    return jf.to_limbs(tw)


@functools.lru_cache(maxsize=None)
def _power_ladder(base: int, n: int) -> np.ndarray:
    """uint32 limb array (n, 8): base^i for i < n."""
    p = [1] * n
    for i in range(1, n):
        p[i] = f128.fmul(p[i - 1], base)
    return jf.to_limbs(p)


def power_ladder_device(base: int, n: int, scale: int = 1) -> jnp.ndarray:
    """Device array (n, 8): scale * base^i for i < n, built by log-doubling.

    O(n) device fmuls in log2(n) batched steps — avoids n sequential host
    multiplications for large domains.
    """
    assert n & (n - 1) == 0
    cur = jf.constant(scale, (1,))
    step = base % f128.P
    while cur.shape[0] < n:
        shifted = jf.fmul(cur, jf.constant(step))
        cur = jnp.concatenate([cur, shifted], axis=0)
        step = f128.fmul(step, step)
    return cur


def _ntt_core(x: jnp.ndarray, rev: jnp.ndarray, tw: jnp.ndarray) -> jnp.ndarray:
    """DIT NTT given bit-reversal indices and a twiddle table (n//2, 8)."""
    n = x.shape[-2]
    batch = x.shape[:-2]
    x = jnp.take(x, rev, axis=-2)
    h = 1
    while h < n:
        stride = n // (2 * h)
        w = tw[::stride][:h]  # (h, 8)
        x = x.reshape(batch + (n // (2 * h), 2, h, jf.NLIMBS))
        even = x[..., 0, :, :]
        odd = jf.fmul(x[..., 1, :, :], w)
        x = jnp.stack([jf.fadd(even, odd), jf.fsub(even, odd)], axis=-3)
        x = x.reshape(batch + (n, jf.NLIMBS))
        h *= 2
    return x


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT along axis -2: coefficients -> evaluations (natural order)."""
    n = x.shape[-2]
    if n == 1:
        return x
    return _ntt_core(
        x, jnp.asarray(_bit_reverse_indices(n)), jnp.asarray(_twiddle_table(n, False))
    )


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT along axis -2: evaluations -> coefficients."""
    n = x.shape[-2]
    if n == 1:
        return x
    out = _ntt_core(
        x, jnp.asarray(_bit_reverse_indices(n)), jnp.asarray(_twiddle_table(n, True))
    )
    n_inv = jf.constant(f128.finv(n))
    return jf.fmul(out, n_inv)


def coset_lde(coeffs: jnp.ndarray, blowup: int, offset: int = f128.DOMAIN_OFFSET) -> jnp.ndarray:
    """Evaluate degree-<T polys (axis -2) on the coset offset*<w_{bT}>.

    coeffs: (..., T, 8) -> evaluations (..., blowup*T, 8), natural order.
    """
    t = coeffs.shape[-2]
    ladder = jnp.asarray(_power_ladder(offset, t))
    scaled = jf.fmul(coeffs, ladder)
    pad = [(0, 0)] * scaled.ndim
    pad[-2] = (0, (blowup - 1) * t)
    padded = jnp.pad(scaled, pad)
    return ntt(padded)


def interpolate_columns(columns: jnp.ndarray) -> jnp.ndarray:
    """Trace columns (..., T, 8) over the plain subgroup -> coefficients."""
    return intt(columns)

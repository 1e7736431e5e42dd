"""f128 arithmetic in the transposed (limbs-first) layout: (..., 8, N).

TPU VPU registers and VMEM tiles are (8 sublanes x 128 lanes) over the last
two array dims.  The standard layout of :mod:`zkvm.field.jax_f128` puts the
8 limbs on the LAST axis, which maps limbs onto lanes and wastes 120 of the
128 lanes of every vector op.  This module implements the same arithmetic
with the limb axis at ``-2`` — limbs ride the 8 sublanes (a perfect uint32
tile) and the domain axis ``N`` fills the lanes.  This is the layout used
inside Pallas kernels and the transposed prover pipeline.

Same algorithms as jax_f128 (Kogge-Stone carries, eps-fold reduction for
p = 2^128 - 45*2^40 + 1; see SURVEY.md W1); golden-tested against
:mod:`zkvm.field.f128` and cross-tested against jax_f128.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import f128
from .jax_f128 import (
    LIMB_BITS,
    MASK,
    NLIMBS,
    _EPS,
    _P_LIMBS,
    _bucket_tables,
    to_limbs,
)


def tlimbs(vals) -> np.ndarray:
    """Python ints -> transposed limb array: batch shape + limbs -> (8, ...).

    For a list of n values returns (8, n); for a scalar returns (8,)... note
    a scalar still gets the limb axis first: shape (8,).
    """
    arr = to_limbs(vals)  # (..., 8)
    return np.moveaxis(arr, -1, 0) if arr.ndim > 1 else arr


def constant(value: int, n: int = 0) -> jnp.ndarray:
    """Broadcast a host int to (8, n) (or (8, 1) broadcastable if n == 0)."""
    limbs = jnp.asarray(to_limbs(value))[:, None]
    return jnp.broadcast_to(limbs, (NLIMBS, n)) if n else limbs


def zeros(shape) -> jnp.ndarray:
    return jnp.zeros(tuple(shape[:-1]) + (NLIMBS, shape[-1]), dtype=jnp.uint32) \
        if isinstance(shape, tuple) else jnp.zeros((NLIMBS, shape), dtype=jnp.uint32)


def ones(n: int) -> jnp.ndarray:
    return constant(1, n)


def from_t(arr) -> np.ndarray:
    """Transposed limb array (..., 8, N) -> object ndarray of ints (..., N)."""
    from .jax_f128 import from_limbs

    return from_limbs(np.moveaxis(np.asarray(arr), -2, -1))


# ---------------------------------------------------------------------------
# carry resolution (limb axis = -2)
# ---------------------------------------------------------------------------

def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs (axis -2) towards higher significance."""
    if k == 0:
        return x
    if k >= x.shape[-2]:
        return jnp.zeros_like(x)
    pad = [(0, 0)] * x.ndim
    pad[-2] = (k, 0)
    return jnp.pad(x[..., :-k, :], pad)


def _ks_add_carry(l2: jnp.ndarray, g: jnp.ndarray):
    """Kogge-Stone +1-carry resolution along axis -2.

    Returns (canonical limbs, carry_out of shape (..., N))."""
    n = l2.shape[-2]
    big_g = g
    big_p = (l2 == MASK).astype(jnp.uint32)
    d = 1
    while d < n:
        big_g = big_g | (big_p & _shift_up(big_g, d))
        big_p = big_p & _shift_up(big_p, d)
        d *= 2
    out = (l2 + _shift_up(big_g, 1)) & MASK
    return out, big_g[..., n - 1, :]


def _resolve(cols: jnp.ndarray):
    l = cols & MASK
    c = cols >> LIMB_BITS
    v = l + _shift_up(c, 1)
    out, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    return out, carry | (c[..., -1, :] != 0).astype(jnp.uint32)


def _eps_col():
    eps_pad = np.zeros(NLIMBS, dtype=np.uint32)
    eps_pad[:3] = _EPS
    return jnp.asarray(eps_pad)[:, None]


def _cond_sub_p(limbs8: jnp.ndarray, hi_bit: jnp.ndarray) -> jnp.ndarray:
    v = limbs8 + _eps_col()
    t, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    ge = (carry | hi_bit)[..., None, :].astype(bool)
    return jnp.where(ge, t, limbs8)


# ---------------------------------------------------------------------------
# add / sub
# ---------------------------------------------------------------------------

def fadd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    v = a + b
    out, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    return _cond_sub_p(out, carry)


def fsub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    one0 = jnp.zeros((NLIMBS, 1), dtype=jnp.uint32).at[0, 0].set(1)
    v = a + (jnp.uint32(MASK) - b) + one0
    d, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    vp = d + jnp.asarray(_P_LIMBS)[:, None]
    dp, _ = _ks_add_carry(vp & MASK, vp >> LIMB_BITS)
    return jnp.where((carry == 0)[..., None, :], dp, d)


def fneg(a: jnp.ndarray) -> jnp.ndarray:
    return fsub(jnp.zeros_like(a), a)


# ---------------------------------------------------------------------------
# multiply
# ---------------------------------------------------------------------------

_IDX16 = _bucket_tables(8, 8, 16)
_IDX_F1 = _bucket_tables(8, 3, 11)
_IDX_F2 = _bucket_tables(3, 3, 6)


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, tables) -> jnp.ndarray:
    """(..., ni, N) x (..., nj, N) -> bucket sums (..., n_buckets, N)."""
    idx_lo, idx_hi = tables
    prod = a[..., :, None, :] * b[..., None, :, :]  # (..., ni, nj, N)
    sh = prod.shape
    flat = prod.reshape(sh[:-3] + (sh[-3] * sh[-2], sh[-1]))
    z = jnp.zeros(flat.shape[:-2] + (1, flat.shape[-1]), dtype=jnp.uint32)
    lo = jnp.concatenate([flat & MASK, z], axis=-2)
    hi = jnp.concatenate([flat >> LIMB_BITS, z], axis=-2)
    return jnp.take(lo, jnp.asarray(idx_lo), axis=-2).sum(
        axis=-2, dtype=jnp.uint32
    ) + jnp.take(hi, jnp.asarray(idx_hi), axis=-2).sum(axis=-2, dtype=jnp.uint32)


def fmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 8x8 limb multiply + eps-fold reduction (limbs on axis -2)."""
    eps = jnp.asarray(_EPS)[:, None]
    eps_b = jnp.broadcast_to(eps, a.shape[:-2] + (3, a.shape[-1]))
    cols = _mul_cols(a, b, _IDX16)  # (..., 16, N)
    l16, _ = _resolve(cols)
    f1 = _mul_cols(l16[..., 8:16, :], eps_b, _IDX_F1)  # (..., 11, N)
    pad = [(0, 0)] * a.ndim
    pad[-2] = (0, 3)
    cols11 = jnp.pad(l16[..., :8, :], pad) + f1
    l11, _ = _resolve(cols11)
    f2 = _mul_cols(l11[..., 8:11, :], eps_b, _IDX_F2)  # (..., 6, N)
    pad[-2] = (0, 2)
    cols8 = l11[..., :8, :] + jnp.pad(f2, pad)
    l8, hi = _resolve(cols8)
    epsc = _eps_col()
    for _ in range(2):
        v = l8 + hi[..., None, :] * epsc
        l8, hi = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    return _cond_sub_p(l8, hi)


def fsquare(a: jnp.ndarray) -> jnp.ndarray:
    return fmul(a, a)


def fselect(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b with mask of shape (..., N) (no limb axis)."""
    return jnp.where(mask[..., None, :], a, b)


def fsum(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Modular sum reduction along a leading batch axis (tree of fadds).

    ``axis`` indexes the batch axes (everything before the (8, N) tail)."""
    if axis < 0:
        axis += a.ndim - 2
    n = a.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(a, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=axis)
        s = fadd(lo, hi)
        if n % 2:
            rem = jax.lax.slice_in_dim(a, 2 * half, n, axis=axis)
            s = jnp.concatenate([s, rem], axis=axis)
        a = s
        n = a.shape[axis]
    return jnp.squeeze(a, axis=axis)

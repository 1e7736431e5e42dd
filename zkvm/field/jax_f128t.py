"""f128 arithmetic in the transposed (limbs-first) layout: (..., 8, N).

TPU VPU registers and VMEM tiles are (8 sublanes x 128 lanes) over the last
two array dims.  The standard layout of :mod:`zkvm.field.jax_f128` puts the
8 limbs on the LAST axis, which maps limbs onto lanes; this module implements
the same arithmetic with the limb axis at ``-2`` — limbs ride the 8 sublanes
(a perfect uint32 tile) and the domain axis ``N`` fills the lanes.  This is
the layout used inside Pallas kernels.

Kernel-safety: Pallas forbids closure-captured tensor constants, so every
constant here is constructed from *scalar* literals (iota + where chains) and
the schoolbook multiply is fully unrolled over static limb indices instead of
using gather tables (the unrolled form also fuses better in plain XLA).

Same algorithms as jax_f128 (Kogge-Stone carries, eps-fold reduction for
p = 2^128 - 45*2^40 + 1; see SURVEY.md W1); golden-tested against
:mod:`zkvm.field.f128` and cross-tested against jax_f128.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import f128
from .jax_f128 import LIMB_BITS, MASK, NLIMBS, to_limbs


def tlimbs(vals) -> np.ndarray:
    """Python ints -> transposed limb array: (8,) scalar or (8, n...)."""
    arr = to_limbs(vals)  # (..., 8)
    return np.moveaxis(arr, -1, 0) if arr.ndim > 1 else arr


def from_t(arr) -> np.ndarray:
    """Transposed limb array (..., 8, N) -> object ndarray of ints (..., N)."""
    from .jax_f128 import from_limbs

    return from_limbs(np.moveaxis(np.asarray(arr), -2, -1))


# ---------------------------------------------------------------------------
# kernel-safe constants (built from scalar literals only)
# ---------------------------------------------------------------------------

def const_col(value: int) -> jnp.ndarray:
    """Host int -> (8, 1) limb column, built from scalars (pallas-safe)."""
    value = value % f128.P
    li = jax.lax.broadcasted_iota(jnp.uint32, (NLIMBS, 1), 0)
    out = jnp.zeros((NLIMBS, 1), dtype=jnp.uint32)
    for i in range(NLIMBS):
        limb = (value >> (16 * i)) & MASK
        if limb:
            out = jnp.where(li == i, jnp.uint32(limb), out)
    return out


def constant(value: int, n: int = 0) -> jnp.ndarray:
    """Broadcast a host int to (8, n) ((8, 1) broadcastable when n == 0)."""
    col = const_col(value)
    return jnp.broadcast_to(col, (NLIMBS, n)) if n else col


def zeros(n: int) -> jnp.ndarray:
    return jnp.zeros((NLIMBS, n), dtype=jnp.uint32)


def ones(n: int) -> jnp.ndarray:
    return constant(1, n)


_EPS_INT = 45 * 2**40 - 1  # 2^128 mod p; limbs [0xFFFF, 0xFFFF, 0x2CFF]


def _eps_col() -> jnp.ndarray:
    return const_col(_EPS_INT)


def _p_col() -> jnp.ndarray:
    li = jax.lax.broadcasted_iota(jnp.uint32, (NLIMBS, 1), 0)
    out = jnp.zeros((NLIMBS, 1), dtype=jnp.uint32)
    for i in range(NLIMBS):
        limb = (f128.P >> (16 * i)) & MASK
        if limb:
            out = jnp.where(li == i, jnp.uint32(limb), out)
    return out


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
    # NB: positive static index — a negative index (c[..., -1, :]) lowers to
    # dynamic_slice, which Mosaic cannot compile inside Pallas kernels.
    return out, carry | (c[..., c.shape[-2] - 1, :] != 0).astype(jnp.uint32)


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
    v = a + (jnp.uint32(MASK) - b) + const_col(1)
    d, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    vp = d + _p_col()
    dp, _ = _ks_add_carry(vp & MASK, vp >> LIMB_BITS)
    return jnp.where((carry == 0)[..., None, :], dp, d)


def fneg(a: jnp.ndarray) -> jnp.ndarray:
    return fsub(jnp.zeros_like(a), a)


# ---------------------------------------------------------------------------
# multiply (unrolled schoolbook + eps-fold; no gathers)
# ---------------------------------------------------------------------------

def _mul_cols_unrolled(a: jnp.ndarray, b: jnp.ndarray, ni: int, nj: int):
    """Anti-diagonal bucket sums via static limb indexing.

    a: (..., ni, N), b: (..., nj, N) -> (..., ni+nj, N) column sums, each
    < min(ni,nj) * 2^17 (lo+hi parts of 16x16-bit products) — far below
    uint32 overflow for ni,nj <= 8.
    """
    nb = ni + nj
    lo = [None] * nb
    hi = [None] * nb
    for i in range(ni):
        ai = a[..., i, :]
        for j in range(nj):
            p = ai * b[..., j, :]
            k = i + j
            pl = p & MASK
            ph = p >> LIMB_BITS
            lo[k] = pl if lo[k] is None else lo[k] + pl
            hi[k + 1] = ph if hi[k + 1] is None else hi[k + 1] + ph
    cols = []
    for k in range(nb):
        c = lo[k]
        if hi[k] is not None:
            c = hi[k] if c is None else c + hi[k]
        cols.append(c)
    return jnp.stack(cols, axis=-2)


def fmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 8x8 limb multiply + eps-fold reduction (limbs on axis -2).

    Bounds walk mirrors jax_f128.fmul: 256-bit product (16 limbs) -> fold
    high 8 limbs via eps (< 2^175, 11 limbs) -> fold high 3 limbs (< 2^129)
    -> two masked eps-adds -> conditional subtract of p.
    """
    eps = jnp.broadcast_to(
        const_col(_EPS_INT)[:3], a.shape[:-2] + (3, a.shape[-1])
    )
    cols = _mul_cols_unrolled(a, b, 8, 8)  # (..., 16, N)
    l16, _ = _resolve(cols)
    f1 = _mul_cols_unrolled(l16[..., 8:16, :], eps, 8, 3)  # (..., 11, N)
    pad = [(0, 0)] * a.ndim
    pad[-2] = (0, 3)
    cols11 = jnp.pad(l16[..., :8, :], pad) + f1
    l11, _ = _resolve(cols11)
    f2 = _mul_cols_unrolled(l11[..., 8:11, :], eps, 3, 3)  # (..., 6, N)
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

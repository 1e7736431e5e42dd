"""Batched f128 arithmetic for TPU as JAX ops over 16-bit limbs.

TPU has no native 64/128-bit integer datapath, so a field element is stored as
8 little-endian 16-bit limbs in a trailing axis of a ``uint32`` array:

    x = sum(limbs[..., i] << (16 * i)),   limbs[..., i] < 2**16

Products of two 16-bit limbs fit in uint32 with headroom for column
accumulation, which keeps every operation on the TPU's int32/uint32 VPU lanes.
Reduction exploits the prime's shape: with eps = 2^128 mod p = 45*2^40 - 1
(only three 16-bit limbs), ``H*2^128 + L  ==  L + H*eps  (mod p)``, so a
256-bit product folds to < 2^128 in four cheap fold steps plus one
conditional subtract.

Everything here is shape-polymorphic over leading batch axes and jittable;
element-wise ops vectorize over the whole trace / LDE domain.  Golden tests
compare against :mod:`zkvm.field.f128` (Python ints).

Reference parity: this replaces winterfell's ``f128::BaseElement`` scalar ops
(see SURVEY.md W1) with data-parallel equivalents.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import f128

NLIMBS = 8
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1

# eps = 2^128 mod p = 45*2^40 - 1 : three 16-bit limbs.
_EPS = [0xFFFF, 0xFFFF, 0x2CFF]

_P_LIMBS = [(f128.P >> (16 * i)) & MASK for i in range(NLIMBS)]


# ---------------------------------------------------------------------------
# host <-> limb conversion
# ---------------------------------------------------------------------------

def to_limbs(vals) -> np.ndarray:
    """Python int / nested list of ints -> uint32 limb array (..., 8)."""
    arr = np.asarray(vals, dtype=object)
    out = np.empty(arr.shape + (NLIMBS,), dtype=np.uint32)
    flat = arr.reshape(-1)
    oflat = out.reshape(-1, NLIMBS)
    for n, v in enumerate(flat):
        v = int(v) % f128.P
        for i in range(NLIMBS):
            oflat[n, i] = (v >> (16 * i)) & MASK
    return out


def from_limbs(arr) -> np.ndarray:
    """uint32 limb array (..., 8) -> object ndarray of Python ints."""
    arr = np.asarray(arr)
    out = np.empty(arr.shape[:-1], dtype=object)
    flat = arr.reshape(-1, NLIMBS)
    oflat = out.reshape(-1) if out.shape else None
    vals = [int(sum(int(row[i]) << (16 * i) for i in range(NLIMBS))) for row in flat]
    if oflat is None:
        return np.asarray(vals[0], dtype=object)[()]
    oflat[:] = vals
    return out


def constant(value: int, shape=()) -> jnp.ndarray:
    """Broadcast a host int to a limb array of the given batch shape."""
    limbs = to_limbs(value)
    return jnp.broadcast_to(jnp.asarray(limbs), tuple(shape) + (NLIMBS,))


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (NLIMBS,), dtype=jnp.uint32)


def ones(shape=()) -> jnp.ndarray:
    return constant(1, shape)


# ---------------------------------------------------------------------------
# carry / borrow chains (static loops over <= 17 limbs)
# ---------------------------------------------------------------------------

def _carry_prop(cols, out_len):
    """Propagate carries across column accumulators (each < 2^32 - 2^21).

    cols: list of (...,) uint32 arrays.  Returns list of out_len limb arrays.
    Any mathematically-guaranteed-zero high limbs beyond out_len are dropped;
    callers are responsible for bounds reasoning (documented at call sites).
    """
    out = []
    carry = jnp.zeros_like(cols[0])
    for k in range(out_len):
        c = cols[k] if k < len(cols) else jnp.zeros_like(cols[0])
        t = c + carry
        out.append(t & MASK)
        carry = t >> LIMB_BITS
    return out


def _sub_with_borrow(a_limbs, b_limbs):
    """a - b over n limbs; returns (diff limbs, borrow_out (0/1))."""
    n = len(a_limbs)
    out = []
    borrow = jnp.zeros_like(a_limbs[0])
    for k in range(n):
        b_k = b_limbs[k] if k < len(b_limbs) else jnp.zeros_like(a_limbs[0])
        t = a_limbs[k] + jnp.uint32(1 << LIMB_BITS) - b_k - borrow
        out.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return out, borrow


def _add_limbs(a_limbs, b_limbs, out_len):
    out = []
    carry = jnp.zeros_like(a_limbs[0])
    for k in range(out_len):
        a_k = a_limbs[k] if k < len(a_limbs) else jnp.zeros_like(a_limbs[0])
        b_k = b_limbs[k] if k < len(b_limbs) else jnp.zeros_like(a_limbs[0])
        t = a_k + b_k + carry
        out.append(t & MASK)
        carry = t >> LIMB_BITS
    return out, carry


def _stack(limbs) -> jnp.ndarray:
    return jnp.stack(limbs, axis=-1)


def _unstack(x) -> list:
    return [x[..., i] for i in range(x.shape[-1])]


# ---------------------------------------------------------------------------
# modular reduction
# ---------------------------------------------------------------------------

def _fold_eps(limbs, out_len):
    """Given value = L + H*2^128 (limbs beyond 8 are H), return columns of
    L + H*eps carried into out_len limbs."""
    L = limbs[:NLIMBS]
    H = limbs[NLIMBS:]
    cols = list(L) + [jnp.zeros_like(limbs[0])] * max(0, out_len - NLIMBS)
    for i, h in enumerate(H):
        for j, e in enumerate(_EPS):
            prod = h * jnp.uint32(e)
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            cols[i + j] = cols[i + j] + lo
            if i + j + 1 < len(cols):
                cols[i + j + 1] = cols[i + j + 1] + hi
    return _carry_prop(cols, out_len)


def _cond_sub_p(limbs8, hi_bit=None):
    """Reduce a value < 2^129 (8 limbs + optional overflow bit) to canonical."""
    if hi_bit is None:
        hi_bit = jnp.zeros_like(limbs8[0])
    a9 = list(limbs8) + [hi_bit]
    d, borrow = _sub_with_borrow(a9, [jnp.uint32(v) for v in _P_LIMBS] + [jnp.uint32(0)])
    ge = borrow == 0  # a >= p
    return [jnp.where(ge, d[k], limbs8[k]) for k in range(NLIMBS)]


def _reduce_wide16(limbs16):
    """Reduce a 16-limb (256-bit) value to canonical 8 limbs.

    Bounds walk: 2^256 -> fold -> <2^175 (11 limbs) -> fold -> <2^129
    (9 limbs) -> fold -> <2^128+2^62 (9 limbs) -> fold -> <2^128 (8 limbs)
    -> one conditional subtract of p (p > 2^127).
    """
    s = _fold_eps(limbs16, 11)
    s = _fold_eps(s, 9)
    s = _fold_eps(s, 9)
    s = _fold_eps(s, 8)
    return _cond_sub_p(s)


# ---------------------------------------------------------------------------
# field ops
# ---------------------------------------------------------------------------

def fadd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    al, bl = _unstack(a), _unstack(b)
    s, carry = _add_limbs(al, bl, NLIMBS)
    return _stack(_cond_sub_p(s, carry))


def fsub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    al, bl = _unstack(a), _unstack(b)
    d, borrow = _sub_with_borrow(al, bl)
    # if borrowed, add p back
    p_limbs = [jnp.uint32(v) for v in _P_LIMBS]
    dp, _ = _add_limbs(d, p_limbs, NLIMBS)
    under = borrow == 1
    return _stack([jnp.where(under, dp[k], d[k]) for k in range(NLIMBS)])


def fneg(a: jnp.ndarray) -> jnp.ndarray:
    return fsub(jnp.zeros_like(a), a)


def fmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 8x8 limb multiply + eps-fold reduction (all uint32 VPU ops)."""
    prod = a[..., :, None] * b[..., None, :]  # (..., 8, 8) uint32, exact
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    z = jnp.zeros(prod.shape[:-2], dtype=jnp.uint32)
    cols = [z] * 17
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            cols[i + j] = cols[i + j] + lo[..., i, j]
            cols[i + j + 1] = cols[i + j + 1] + hi[..., i, j]
    limbs16 = _carry_prop(cols, 16)
    return _stack(_reduce_wide16(limbs16))


def fsquare(a: jnp.ndarray) -> jnp.ndarray:
    return fmul(a, a)


def fselect(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask of batch shape (no limb axis)."""
    return jnp.where(mask[..., None], a, b)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def feq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def fpow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-side constant exponent.

    Small exponents unroll (fully fusable); large ones run a lax.scan over the
    exponent bits so the compiled graph holds just one square + one multiply
    (compile time matters: an unrolled 128-bit exponentiation is a ~75k-op
    HLO graph).
    """
    if e == 0:
        return ones(a.shape[:-1])
    if e.bit_length() <= 8:
        result = None
        for bit in bin(e)[2:]:
            result = fsquare(result) if result is not None else None
            if bit == "1":
                result = a if result is None else fmul(result, a)
        return result

    bits = jnp.asarray(
        [(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.uint32
    )

    def step(carry, bit):
        result, base = carry
        result = fselect(
            jnp.broadcast_to(bit == 1, result.shape[:-1]), fmul(result, base), result
        )
        base = fsquare(base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(step, (ones(a.shape[:-1]), a), bits)
    return result


def finv(a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^(p-2); maps 0 -> 0."""
    return fpow_const(a, f128.P - 2)


def batch_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over the leading axis via log-depth scans.

    Far cheaper than per-element Fermat exponentiation: two associative
    scans of field muls + a single Fermat inversion of the total product.
    Zeros map to zeros (the reference winterfell code never inverts zero on
    the honest path).
    """
    orig_shape = a.shape
    flat = a.reshape(-1, NLIMBS)
    zero_mask = is_zero(flat)
    x = fselect(zero_mask, ones((flat.shape[0],)), flat)

    prefix = jax.lax.associative_scan(fmul, x, axis=0)           # p[i] = x0..xi
    suffix = jax.lax.associative_scan(fmul, x, axis=0, reverse=True)
    total = prefix[-1]
    inv_total = fpow_const(total, f128.P - 2)

    n = flat.shape[0]
    left = jnp.concatenate([ones((1,)), prefix[: n - 1]], axis=0)     # prod before i
    right = jnp.concatenate([suffix[1:], ones((1,))], axis=0)         # prod after i
    inv = fmul(fmul(left, right), inv_total[None, :])
    inv = fselect(zero_mask, zeros((n,)), inv)
    return inv.reshape(orig_shape)


def fsum(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Modular sum reduction along a batch axis (tree of fadds)."""
    if axis < 0:
        axis += a.ndim - 1  # batch axes only
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

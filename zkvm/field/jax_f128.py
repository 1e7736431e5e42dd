"""Batched f128 arithmetic for TPU as JAX ops over 16-bit limbs.

TPU has no native 64/128-bit integer datapath, so a field element is stored as
8 little-endian 16-bit limbs in a trailing axis of a ``uint32`` array:

    x = sum(limbs[..., i] << (16 * i)),   limbs[..., i] < 2**16

Products of two 16-bit limbs fit in uint32 with headroom for column
accumulation, which keeps every operation on the TPU's int32/uint32 VPU lanes.
Reduction exploits the prime's shape: with eps = 2^128 mod p = 45*2^40 - 1
(only three 16-bit limbs), ``H*2^128 + L  ==  L + H*eps  (mod p)``, so a
256-bit product folds to < 2^128 in two gather-sum folds plus two masked
eps-adds and one conditional subtract.

Carry/borrow propagation uses Kogge-Stone carry-lookahead (log2(n) vector
steps on generate/propagate bits) instead of an n-step ripple — both faster
on the VPU and ~5x fewer HLO ops, which directly bounds XLA compile time
(every prover stage inlines hundreds of these primitives).

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
_EPS = np.asarray([0xFFFF, 0xFFFF, 0x2CFF], dtype=np.uint32)

_P_LIMBS = np.asarray(
    [(f128.P >> (16 * i)) & MASK for i in range(NLIMBS)], dtype=np.uint32
)


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
# Kogge-Stone carry resolution
# ---------------------------------------------------------------------------

def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs towards higher significance (multiply by 2^(16k))."""
    if k == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x[..., :-k], pad) if k < x.shape[-1] else jnp.zeros_like(x)


def _ks_add_carry(l2: jnp.ndarray, g: jnp.ndarray):
    """Resolve +1-carries: l2 (..., n) <= 0xFFFF, g in {0,1} carry-generates.

    Returns (canonical limbs, carry_out_bit).  Kogge-Stone on
    (generate, propagate) with propagate = (limb == 0xFFFF).
    """
    n = l2.shape[-1]
    big_g = g
    big_p = (l2 == MASK).astype(jnp.uint32)
    d = 1
    while d < n:
        big_g = big_g | (big_p & _shift_up(big_g, d))
        big_p = big_p & _shift_up(big_p, d)
        d *= 2
    carry_in = _shift_up(big_g, 1)
    out = (l2 + carry_in) & MASK
    return out, big_g[..., n - 1]


def _resolve(cols: jnp.ndarray):
    """Columns (..., n) < 2^32 -> (canonical limbs (..., n), carry_out bit).

    First pass folds each column's high part one limb up (columns must be
    < 2^31 so l + shifted-high < 2^32); the leftover carries are in {0,1}
    and resolve with one Kogge-Stone pass.  Callers guarantee the true value
    fits in n limbs OR consume carry_out.
    """
    l = cols & MASK
    c = cols >> LIMB_BITS
    v = l + _shift_up(c, 1)
    l2 = v & MASK
    g = v >> LIMB_BITS  # in {0,1}
    out, carry = _ks_add_carry(l2, g)
    # positive static index: negative indices lower to dynamic_slice (no
    # Mosaic lowering in Pallas kernels).
    return out, carry | (c[..., c.shape[-1] - 1] != 0).astype(jnp.uint32)


def _cond_sub_p(limbs8: jnp.ndarray, hi_bit: jnp.ndarray) -> jnp.ndarray:
    """Reduce value = limbs8 + hi_bit*2^128 < 2p to canonical form.

    a - p == a + eps - 2^128, so add eps and select on overflow."""
    eps_pad = jnp.zeros(NLIMBS, dtype=jnp.uint32).at[:3].set(jnp.asarray(_EPS))
    v = limbs8 + eps_pad
    l2 = v & MASK
    g = v >> LIMB_BITS
    t, carry = _ks_add_carry(l2, g)
    ge = (carry | hi_bit)[..., None].astype(bool)
    return jnp.where(ge, t, limbs8)


# ---------------------------------------------------------------------------
# add / sub
# ---------------------------------------------------------------------------

def fadd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    v = a + b
    out, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    return _cond_sub_p(out, carry)


def fsub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # a - b = a + (2^128 - b) - 2^128 via limbwise complement + 1
    one0 = jnp.zeros(NLIMBS, dtype=jnp.uint32).at[0].set(1)
    v = a + (jnp.uint32(MASK) - b) + one0
    d, carry = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    # carry == 1 iff a >= b; otherwise add p back
    vp = d + jnp.asarray(_P_LIMBS)
    dp, _ = _ks_add_carry(vp & MASK, vp >> LIMB_BITS)
    return jnp.where((carry == 0)[..., None], dp, d)


def fneg(a: jnp.ndarray) -> jnp.ndarray:
    return fsub(jnp.zeros_like(a), a)


# ---------------------------------------------------------------------------
# multiply
# ---------------------------------------------------------------------------

def _bucket_tables(ni: int, nj: int, n_buckets: int):
    """Gather tables for anti-diagonal sums of an (ni, nj) product matrix."""
    width = min(ni, nj)
    flat = ni * nj
    idx_lo = np.full((n_buckets, width), flat, dtype=np.int32)
    idx_hi = np.full((n_buckets, width), flat, dtype=np.int32)
    for k in range(n_buckets):
        slot = 0
        for i in range(ni):
            j = k - i
            if 0 <= j < nj:
                idx_lo[k, slot] = i * nj + j
                slot += 1
        slot = 0
        for i in range(ni):
            j = k - 1 - i
            if 0 <= j < nj:
                idx_hi[k, slot] = i * nj + j
                slot += 1
    return idx_lo, idx_hi


_IDX16 = _bucket_tables(8, 8, 16)
_IDX_F1 = _bucket_tables(8, 3, 11)
_IDX_F2 = _bucket_tables(3, 3, 6)


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, tables) -> jnp.ndarray:
    """(..., ni) x (..., nj) limb multiply -> bucket sums (..., n_buckets).

    Buckets sum at most min(ni,nj) lo parts (< 2^16 each) and as many hi
    parts — far below uint32 overflow."""
    idx_lo, idx_hi = tables
    prod = a[..., :, None] * b[..., None, :]
    batch = prod.shape[:-2]
    flat = prod.reshape(batch + (prod.shape[-2] * prod.shape[-1],))
    z = jnp.zeros(batch + (1,), dtype=jnp.uint32)
    lo = jnp.concatenate([flat & MASK, z], axis=-1)
    hi = jnp.concatenate([flat >> LIMB_BITS, z], axis=-1)
    return jnp.take(lo, jnp.asarray(idx_lo), axis=-1).sum(
        axis=-1, dtype=jnp.uint32
    ) + jnp.take(hi, jnp.asarray(idx_hi), axis=-1).sum(axis=-1, dtype=jnp.uint32)


def fmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 8x8 limb multiply + eps-fold reduction (all uint32 VPU ops).

    Bounds walk: 256-bit product (16 limbs) -> fold high 8 limbs via eps
    (< 2^175, 11 limbs) -> fold high 3 limbs (< 2^129, 8 limbs + 1 bit) ->
    two masked eps-adds -> conditional subtract of p.
    """
    eps = jnp.asarray(_EPS)
    cols = _mul_cols(a, b, _IDX16)  # (..., 16)
    l16, _ = _resolve(cols)
    # fold 1: high 8 limbs * eps into the low 8 (value < 2^175 -> 11 limbs)
    f1 = _mul_cols(l16[..., 8:16], eps, _IDX_F1)  # (..., 11)
    pad = [(0, 0)] * (l16.ndim - 1) + [(0, 3)]
    cols11 = jnp.pad(l16[..., :8], pad) + f1
    l11, _ = _resolve(cols11)
    # fold 2: high 3 limbs * eps (value < 2^129 -> 8 limbs + carry bit)
    f2 = _mul_cols(l11[..., 8:11], eps, _IDX_F2)  # (..., 6)
    pad = [(0, 0)] * (l11.ndim - 1) + [(0, 2)]
    cols8 = l11[..., :8] + jnp.pad(f2, pad)
    l8, hi = _resolve(cols8)
    # folds 3+4: masked eps adds for the remaining 0/1 high bit
    eps_pad = jnp.zeros(NLIMBS, dtype=jnp.uint32).at[:3].set(eps)
    for _ in range(2):
        v = l8 + hi[..., None] * eps_pad
        l8, hi = _ks_add_carry(v & MASK, v >> LIMB_BITS)
    return _cond_sub_p(l8, hi)


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
    exponent bits so the compiled graph holds just one square + one multiply.
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
    """Montgomery batch inversion over the leading axis.

    Blocked formulation: split the N elements into lanes of K-step
    ``lax.scan`` prefix products (graph size O(1), parallelism N/K), invert
    the per-block products with one Fermat exponentiation, then walk back.
    ~3 field muls per element with a tiny compiled graph.

    Zeros map to zeros (the reference winterfell code never inverts zero on
    the honest path).
    """
    orig_shape = a.shape
    flat = a.reshape(-1, NLIMBS)
    n = flat.shape[0]
    zero_mask = is_zero(flat)
    x = fselect(zero_mask, ones((n,)), flat)

    k = min(256, n)
    if n % k:
        pad = k - n % k
        x = jnp.concatenate([x, ones((pad,))], axis=0)
    b = x.shape[0] // k
    xb = jnp.moveaxis(x.reshape(b, k, NLIMBS), 1, 0)  # (K, B, 8)

    def fwd(carry, v):
        new = fmul(carry, v)
        return new, carry  # emit the product of elements BEFORE this one

    block_prod, before = jax.lax.scan(fwd, ones((b,)), xb)
    inv_block = fpow_const(block_prod, f128.P - 2)  # (B, 8)

    def bwd(carry, vb):
        v, bef = vb
        inv_v = fmul(carry, bef)
        new = fmul(carry, v)
        return new, inv_v

    _, inv_rev = jax.lax.scan(bwd, inv_block, (xb, before), reverse=True)
    inv = jnp.moveaxis(inv_rev, 0, 1).reshape(-1, NLIMBS)[:n]
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

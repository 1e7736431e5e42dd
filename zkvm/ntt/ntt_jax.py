"""Batched radix-2 NTT / iNTT / coset LDE on TPU (limb arithmetic).

Transforms operate on arrays shaped ``(..., N, 8)`` — leading batch axes
(trace columns), transform axis N, trailing f128 limb axis.

The transform is a *constant-geometry* (Pease) network so the whole NTT
compiles as ONE ``lax.scan`` whose body is a single butterfly graph
(gather twiddles -> fmul -> fadd/fsub -> fixed de-interleave shuffle),
instead of log2(N) unrolled stages — compile time is O(1) in N, runtime
identical FLOPs.  Derivation (validated against the recursive golden NTT):

* load input at position p from ``bitrev(rotl(p, 1))``;
* stage s pairs positions (p, p + N/2); the element at position p carries
  standard index ``i = rotl(p, s+1)`` and twiddle ``w^((i mod 2^s) * N/2^(s+1))``;
* outputs (a + w b, a - w b) concatenate then de-interleave (even/odd split,
  the same permutation every stage);
* after the final shuffle the layout is rotr(i, 1) — one fixup gather.

Twiddle indices are computed inside the scan body from the stage counter
(a few integer ops on an iota), so no O(N log N) twiddle tensor is stored;
only the N/2-entry root table lives in memory.

This replaces winterfell's LDE machinery (SURVEY.md W2): interpolate trace
columns (iNTT over the size-T subgroup), evaluate on the size-8T coset
(offset = field generator 3, matching winterfell's StarkDomain).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf


def _rotl(x, r, ln):
    r = r % ln
    mask = (1 << ln) - 1
    return ((x << r) | (x >> (ln - r))) & mask


@functools.lru_cache(maxsize=None)
def _layout_indices(n: int):
    """(initial, final) int32 gather indices for the constant-geometry net."""
    ln = n.bit_length() - 1
    rev = np.zeros(n, dtype=np.int64)
    idx = np.arange(n)
    for b in range(ln):
        rev |= ((idx >> b) & 1) << (ln - 1 - b)
    initial = rev[_rotl(idx, 1, ln)]
    final = _rotl(idx, ln - 1, ln)  # out[i] = x[rotr(i, 1)]
    return initial.astype(np.int32), final.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _twiddle_table(n: int, inverse: bool) -> np.ndarray:
    """uint32 limb array (n//2, 8): w^k for k < n/2."""
    w = f128.get_root_of_unity(n)
    if inverse:
        w = f128.finv(w)
    tw = [1] * (n // 2)
    for k in range(1, n // 2):
        tw[k] = f128.fmul(tw[k - 1], w)
    return jf.to_limbs(tw)


def power_ladder_device(base: int, n: int, scale: int = 1) -> jnp.ndarray:
    """Device array (n, 8): scale * base^i for i < n, built by log-doubling.

    Host-constant base/scale; intended for use INSIDE a jitted function
    (eager use compiles one executable per doubling step — use
    :func:`ladder` instead on the eager path).
    """
    assert n & (n - 1) == 0
    cur = jf.constant(scale, (1,))
    step = base % f128.P
    while cur.shape[0] < n:
        shifted = jf.fmul(cur, jf.constant(step))
        cur = jnp.concatenate([cur, shifted], axis=0)
        step = f128.fmul(step, step)
    return cur


@functools.partial(jax.jit, static_argnames=("n",))
def ladder(base: jnp.ndarray, scale: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, 8) array: scale * base^i for traced base/scale — ONE compile per n.

    Used on the eager prover path (per-proof points like z, beta/offset):
    the whole log-doubling builds a single cached executable.
    """
    assert n & (n - 1) == 0
    cur = scale[None, :]
    step = base
    while cur.shape[0] < n:
        cur = jnp.concatenate([cur, jf.fmul(cur, step[None, :])], axis=0)
        step = jf.fsquare(step)
    return cur


def ladder_host(base: int, n: int, scale: int = 1) -> jnp.ndarray:
    """Eager-safe ladder for host-int base/scale (delegates to :func:`ladder`)."""
    return ladder(
        jnp.asarray(jf.to_limbs(base % f128.P)),
        jnp.asarray(jf.to_limbs(scale % f128.P)),
        n,
    )


@functools.lru_cache(maxsize=None)
def _bitrev_indices(n: int) -> np.ndarray:
    ln = n.bit_length() - 1
    rev = np.zeros(n, dtype=np.int64)
    idx = np.arange(n)
    for b in range(ln):
        rev |= ((idx >> b) & 1) << (ln - 1 - b)
    return rev.astype(np.int32)


def _get_table(n: int, inverse: bool) -> jnp.ndarray:
    """Root table — ambient (stage argument) when provided, else the
    legacy eager build (a baked literal under jit).  See
    :mod:`zkvm.ntt.ambient`."""
    from . import ambient

    return ambient.fetch(
        f"nj.tw:{n}:{int(inverse)}",
        lambda: jnp.asarray(_twiddle_table(n, inverse)),
    )


def _get_idx(kind: str, n: int, builder) -> jnp.ndarray:
    from . import ambient

    return ambient.fetch(
        f"nj.{kind}:{n}", lambda: jnp.asarray(builder(n))
    )


def table_consts(n: int, inverse: bool) -> dict:
    """{key: device array} of every O(n) constant a size-n standard-layout
    transform consumes (root table + permutation indices for both butterfly
    networks).  Pass into a stage jit; trace under ambient.provide()."""
    return {
        f"nj.tw:{n}:{int(inverse)}": jnp.asarray(_twiddle_table(n, inverse)),
        f"nj.init:{n}": jnp.asarray(_layout_indices(n)[0]),
        f"nj.final:{n}": jnp.asarray(_layout_indices(n)[1]),
        f"nj.bitrev:{n}": jnp.asarray(_bitrev_indices(n)),
    }


def _ntt_unrolled(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Iterative radix-2 DIT with contiguous data movement (TPU fast path).

    One bit-reversal gather at the input; every stage after that is pure
    reshape / slice / concat (block-contiguous, no gathers) plus one fmul
    by a strided slice of the root table.  ~80x faster than the
    constant-geometry scan on the real TPU (gathers on the transform axis
    do not vectorize there); the scan variant is kept for CPU-mesh tests
    where compile time dominates.
    """
    n = x.shape[-2]
    ln = n.bit_length() - 1
    batch = x.shape[:-2]
    table = _get_table(n, inverse)  # (n/2, 8)

    x = jnp.take(x, _get_idx("bitrev", n, _bitrev_indices), axis=-2)
    for s in range(ln):
        m = 1 << s  # half block
        blocks = n >> (s + 1)
        tw = table[:: n >> (s + 1)][:m]  # (m, 8) strided slice, no gather
        y = x.reshape(batch + (blocks, 2, m, jf.NLIMBS))
        a = y[..., 0, :, :]
        b = jf.fmul(y[..., 1, :, :], tw)
        x = jnp.concatenate(
            [jf.fadd(a, b)[..., None, :, :], jf.fsub(a, b)[..., None, :, :]],
            axis=-3,
        ).reshape(batch + (n, jf.NLIMBS))
    return x


def _use_unrolled() -> bool:
    """Pick the butterfly network for the current backend.

    The unrolled DIT network (contiguous reshape/concat data movement) is
    the fast path on real TPUs, where axis=-2 gathers in the scan body
    serialize badly; the constant-geometry scan keeps CPU-mesh test compile
    times O(1) in N.  Override with ZKVM_NTT=unrolled|scan.
    """
    import os

    env = os.environ.get("ZKVM_NTT", "")
    if env in ("unrolled", "scan"):
        return env == "unrolled"
    return jax.default_backend() not in ("cpu",)


def _ntt_core(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    if _use_unrolled():
        return _ntt_unrolled(x, inverse)
    return _ntt_scan(x, inverse)


def _ntt_scan(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[-2]
    ln = n.bit_length() - 1
    h = n // 2
    table = _get_table(n, inverse)  # (h, 8)

    batch = x.shape[:-2]
    x = jnp.take(
        x, _get_idx("init", n, lambda m: _layout_indices(m)[0]), axis=-2
    )

    p = jnp.arange(h, dtype=jnp.uint32)
    u = jnp.uint32

    def stage(x, s):
        # twiddle exponent from the stage counter (all uint32 vector ops;
        # left shifts may wrap mod 2^32 — the & (n-1) keeps what we need)
        r = (s + u(1)) % u(ln)
        i = ((p << r) | (p >> (u(ln) - r))) & u(n - 1)
        e = (i & ((u(1) << s) - u(1))) * (u(n) >> (s + u(1)))
        tw = jnp.take(table, e, axis=0)  # (h, 8)
        a = x[..., :h, :]
        b = jf.fmul(x[..., h:, :], tw)
        y = jnp.concatenate([jf.fadd(a, b), jf.fsub(a, b)], axis=-2)
        # constant-geometry shuffle: de-interleave even/odd positions
        y = y.reshape(batch + (h, 2, jf.NLIMBS))
        y = jnp.concatenate([y[..., 0, :], y[..., 1, :]], axis=-2)
        return y, None

    x, _ = jax.lax.scan(stage, x, jnp.arange(ln, dtype=jnp.uint32))
    return jnp.take(
        x, _get_idx("final", n, lambda m: _layout_indices(m)[1]), axis=-2
    )


def _ntt_body(x: jnp.ndarray) -> jnp.ndarray:
    if x.shape[-2] == 1:
        return x
    return _ntt_core(x, False)


def _intt_body(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-2]
    if n == 1:
        return x
    out = _ntt_core(x, True)
    return jf.fmul(out, jf.constant(f128.finv(n)))


def _coset_lde_body(coeffs, blowup, offset):
    t = coeffs.shape[-2]
    ladder = power_ladder_device(offset, t)
    scaled = jf.fmul(coeffs, ladder)
    pad = [(0, 0)] * scaled.ndim
    pad[-2] = (0, (blowup - 1) * t)
    padded = jnp.pad(scaled, pad)
    return _ntt_body(padded)


_ntt_jit = jax.jit(_ntt_body)
_intt_jit = jax.jit(_intt_body)
_coset_lde_jit = jax.jit(
    _coset_lde_body, static_argnames=("blowup", "offset")
)


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT along axis -2: coefficients -> evaluations (natural order).

    Inlines into an enclosing trace (no nested jit): a nested jit would
    cache a jaxpr capturing the caller's ambient-const tracers and leak
    them into later traces (zkvm/ntt/ambient.py)."""
    if isinstance(x, jax.core.Tracer):
        return _ntt_body(x)
    return _ntt_jit(x)


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT along axis -2: evaluations -> coefficients."""
    if isinstance(x, jax.core.Tracer):
        return _intt_body(x)
    return _intt_jit(x)


def coset_lde(coeffs: jnp.ndarray, blowup: int, offset: int = f128.DOMAIN_OFFSET) -> jnp.ndarray:
    """Evaluate degree-<T polys (axis -2) on the coset offset*<w_{bT}>.

    coeffs: (..., T, 8) -> evaluations (..., blowup*T, 8), natural order.
    """
    if isinstance(coeffs, jax.core.Tracer):
        return _coset_lde_body(coeffs, blowup, offset)
    return _coset_lde_jit(coeffs, blowup=blowup, offset=offset)


def interpolate_columns(columns: jnp.ndarray) -> jnp.ndarray:
    """Trace columns (..., T, 8) over the plain subgroup -> coefficients."""
    return intt(columns)

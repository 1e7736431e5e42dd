"""Transposed-layout four-step NTT: full-lane utilization on TPU.

The standard NTT (:mod:`zkvm.ntt.ntt_jax`) works on ``(..., N, 8)`` arrays —
the 8 f128 limbs ride the TPU's 128 vector lanes, wasting 94% of the VPU,
and XLA materializes most limb-graph intermediates in HBM.  This module
implements the same transforms in the *transposed* layout of
:mod:`zkvm.field.jax_f128t` — ``(..., 8, N)`` with limbs on the 8 sublanes
and the domain axis on the lanes — with the butterfly stages executed by a
Pallas kernel that keeps the whole transform of a block in VMEM (measured
~20x over the XLA graph on v5e, cf. air/constraints_pallas.py).

Structure: the classic **four-step (Bailey) NTT**.  With N = N1*N2,
n = n1 + N1*n2 and k = k2 + N2*k1,

    X[k2 + N2*k1] = NTT_N1 over n1 [ w_N^(n1*k2) * NTT_N2 over n2 [ x ] ]

Both inner transforms run along a *non-minor* axis (working shape
``(..., M, 8, L)``: transform axis M at -3, limbs at -2, lanes at -1), so
every butterfly is whole-tile data movement plus fully-lane-parallel limb
arithmetic.  Inner transforms use the constant-geometry (Pease) network —
one identical shuffle per stage, per-stage twiddle vectors precomputed on
host — which is what the Pallas kernel runs entirely in VMEM.  When N2
exceeds the axis limit the first pass recurses through the flat interface
(N up to 2^40 = the field's two-adicity).  The n1*k2 mid-twiddle tensor is
built on device by a cumulative-product scan and cached per (N, inverse).

Replaces winterfell's LDE machinery (SURVEY.md W2) on the TPU fast path;
golden-tested against :mod:`zkvm.ntt.ntt_jax` / :mod:`zkvm.ntt.golden`.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128t as jt
from .ntt_jax import _layout_indices, _twiddle_table

# Largest transform run as one in-VMEM kernel pass (block (M, 8, L)).
# M=1024 exceeds the 128 MB VMEM budget on v5e even with the loop-form
# stage network (Mosaic holds ~state x stages scoped copies); larger
# domains recurse through the flat four-step instead.
MAX_AXIS = 512


def _split(n: int):
    """N = N2 * N1; N1 (the pass-2 axis) capped at MAX_AXIS."""
    ln = n.bit_length() - 1
    n1 = 1 << ((ln + 1) // 2)
    n1 = min(n1, MAX_AXIS)
    return n // n1, n1  # (N2, N1)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(m: int, inverse: bool) -> np.ndarray:
    """(S, M/2, 8) per-stage twiddle vectors of the constant-geometry net.

    Stage s multiplies lane p of the second half by table[e_s(p)] where
    e_s(p) follows the index math of ntt_jax._ntt_scan (validated there)."""
    ln = m.bit_length() - 1
    h = m // 2
    table = _twiddle_table(m, inverse)  # (h, 8) std limbs
    p = np.arange(h, dtype=np.int64)
    out = np.empty((ln, h, 8), dtype=np.uint32)
    mask = m - 1
    for s in range(ln):
        r = (s + 1) % ln
        i = ((p << r) | (p >> (ln - r))) & mask
        e = (i & ((1 << s) - 1)) * (m >> (s + 1))
        out[s] = table[e]
    return out


def _mid_key(n: int, inverse: bool, scaled: bool) -> str:
    return f"nt.mid:{n}:{int(inverse)}:{int(scaled)}"


def _get_mid(n: int, inverse: bool, scaled: bool) -> jnp.ndarray:
    """Mid-twiddle tensor — ambient (stage argument) when provided, else
    the legacy eager build (baked as a literal under jit; fine for small
    sizes and eager callers).  See :mod:`zkvm.ntt.ambient`."""
    from . import ambient

    return ambient.fetch(
        _mid_key(n, inverse, scaled),
        lambda: _mid_twiddles(n, inverse, scaled),
    )


def mid_consts(n: int, inverse: bool) -> dict:
    """All mid-twiddle tables a TOP-level size-n transform consumes
    (walking the four-step recursion), as {key: device array}.  Pass the
    dict into the stage jit and trace the body under ambient.provide()."""
    out: dict = {}

    def walk(m: int, top: bool):
        if m == 1:
            return
        n2, _n1 = _split(m)
        if n2 > MAX_AXIS:
            walk(n2, False)
        scaled = inverse and top
        out[_mid_key(m, inverse, scaled)] = _mid_twiddles(m, inverse, scaled)

    walk(n, True)
    return out


def _mid_twiddles(n: int, inverse: bool, scaled: bool) -> jnp.ndarray:
    """Device tensor (N1, 8, N2): w^(+-n1*k2), built by a product scan.

    Rows are PRE-PERMUTED by pass 2's initial layout indices so the tensor
    can be fused into the pass-2 stage kernel as a premultiplier.  With
    ``scaled`` the whole tensor carries the iNTT's 1/n factor (fused only at
    the top recursion level — every output element passes through exactly
    one top-level mid twiddle)."""
    # cache key must include the split (MAX_AXIS is test-mutable)
    return _mid_twiddles_cached(n, _split(n)[1], inverse, scaled)


@functools.lru_cache(maxsize=None)
def _mid_twiddles_cached(n: int, _n1: int, inverse: bool, scaled: bool):
    n2, n1 = n // _n1, _n1
    w = f128.get_root_of_unity(n)
    if inverse:
        w = f128.finv(w)
    scale = f128.finv(n) if scaled else 1
    # must stay concrete even when first requested during a jit trace (the
    # result is cached and reused across traces)
    with jax.ensure_compile_time_eval():
        lad = ladder_t_host(w, n2)  # (8, N2): w^k2

        def step(row, _):
            return jt.fmul(row, lad), row

        _, rows = jax.lax.scan(
            step, ladder_t_host(1, n2, scale), None, length=n1
        )  # (N1, 8, N2): rows[n1] = scale * w^(n1*k2)
        if n1 > 1:
            initial, _ = _layout_indices(n1)
            rows = jnp.take(rows, jnp.asarray(initial), axis=0)
        return jax.device_put(rows)


def ladder_t_host(base: int, n: int, scale: int = 1) -> jnp.ndarray:
    """(8, n) transposed limb array: scale * base^i for i < n (host ints)."""
    return ladder_t(
        jnp.asarray(jt.tlimbs(base % f128.P)),
        jnp.asarray(jt.tlimbs(scale % f128.P)),
        n,
    )


def _ladder_impl(base: jnp.ndarray, scale: jnp.ndarray, n: int) -> jnp.ndarray:
    """(8, n) = scale * base^i.  Doubling up to 256 lanes, then the sqrt
    split base^i = base^(i mod S) * (base^S)^(i div S) as one outer-product
    multiply — O(sqrt n) sequential steps instead of log2(n) passes over
    the full array."""
    if n <= 256:
        cur = scale[:, None]
        step = base[:, None]
        while cur.shape[1] < n:
            cur = jnp.concatenate([cur, jt.fmul(cur, step)], axis=1)
            step = jt.fsquare(step)
        return cur
    s = 1 << ((n.bit_length() - 1 + 1) // 2)
    l1 = _ladder_impl(base, scale, s)  # (8, S), carries the scale
    base_s = base
    for _ in range(s.bit_length() - 1):
        base_s = jt.fsquare(base_s[:, None])[:, 0]
    one = jnp.asarray(jt.tlimbs(1))
    l2 = _ladder_impl(base_s, one, n // s)  # (8, N2)
    prod = jt.fmul(
        jnp.swapaxes(l2, 0, 1)[:, :, None], l1[None]
    )  # (N2, 8, S)
    return jnp.swapaxes(prod, 0, 1).reshape(8, n)


@functools.partial(jax.jit, static_argnames=("n",))
def ladder_t(base: jnp.ndarray, scale: jnp.ndarray, n: int) -> jnp.ndarray:
    """(8, n): scale * base^i for traced (8,) base/scale."""
    assert n & (n - 1) == 0
    return _ladder_impl(base, scale, n)


def _ladders_impl(bases: jnp.ndarray, n: int) -> jnp.ndarray:
    q = bases.shape[0]
    if n <= 256:
        cur = jnp.broadcast_to(
            jnp.asarray(jt.tlimbs(1))[None, :, None], (q, 8, 1)
        ).astype(jnp.uint32)
        step = bases[:, :, None]
        while cur.shape[-1] < n:
            cur = jnp.concatenate([cur, jt.fmul(cur, step)], axis=-1)
            step = jt.fsquare(step)
        return cur
    s = 1 << ((n.bit_length() - 1 + 1) // 2)
    l1 = _ladders_impl(bases, s)  # (Q, 8, S)
    base_s = bases
    for _ in range(s.bit_length() - 1):
        base_s = jt.fsquare(base_s[:, :, None])[:, :, 0]
    l2 = _ladders_impl(base_s, n // s)  # (Q, 8, N2)
    prod = jt.fmul(
        jnp.swapaxes(l2, -1, -2)[:, :, :, None], l1[:, None]
    )  # (Q, N2, 8, S)
    return jnp.swapaxes(prod, -3, -2).reshape(q, 8, n)


@functools.partial(jax.jit, static_argnames=("n",))
def ladders_t(bases: jnp.ndarray, n: int) -> jnp.ndarray:
    """(Q, 8, n): bases[q]^i for i < n — batched sqrt-split build."""
    assert n & (n - 1) == 0
    return _ladders_impl(bases, n)


# ---------------------------------------------------------------------------
# axis transform: constant-geometry stages along axis -3 of (..., M, 8, L)
# ---------------------------------------------------------------------------

def _pease_stages(y: jnp.ndarray, tw: jnp.ndarray) -> jnp.ndarray:
    """All butterfly stages; y: (M, 8, L) pre-permuted, tw: (S, M/2, 8).

    Pure jnp — runs as the Pallas kernel body on TPU and as a plain XLA
    graph on the CPU test mesh."""
    m = y.shape[0]
    h = m // 2
    s_count = tw.shape[0]
    for s in range(s_count):
        a = y[:h]
        b = jt.fmul(y[h:], tw[s][:, :, None])
        y = jnp.concatenate([jt.fadd(a, b), jt.fsub(a, b)], axis=0)
        z = y.reshape(h, 2, 8, y.shape[-1])
        y = jnp.concatenate([z[:, 0], z[:, 1]], axis=0)
    return y


def _stages_in_kernel(y, tw_ref, cnt_ref):
    """All butterfly stages as a fori_loop with a TRACED bound.

    One stage's buffers live in VMEM at a time.  A static bound unrolls
    (O(stages) block copies on the Mosaic scoped stack — 190 MB at M=1024)
    and lax.scan does not lower in Mosaic at all, so the stage count comes
    in through SMEM, forcing a real loop.  The constant-geometry network
    uses the identical shuffle every stage, so the body is stage-
    independent apart from the twiddle row."""
    from jax.experimental import pallas as pl

    m = y.shape[0]
    h = m // 2
    lanes = y.shape[-1]

    def body(s, y):
        tw = tw_ref[pl.ds(s, 1)][0]  # (M/2, 8)
        a = y[:h]
        b = jt.fmul(y[h:], tw[:, :, None])
        y2 = jnp.concatenate([jt.fadd(a, b), jt.fsub(a, b)], axis=0)
        z = y2.reshape(h, 2, 8, lanes)
        return jnp.concatenate([z[:, 0], z[:, 1]], axis=0)

    return jax.lax.fori_loop(0, cnt_ref[0], body, y)


def _stages_kernel(cnt_ref, y_ref, tw_ref, out_ref):
    out_ref[:] = _stages_in_kernel(y_ref[0], tw_ref, cnt_ref)[None]


def _stages_kernel_full(cnt_ref, y_ref, tw_ref, pre_ref, out_ref):
    """Premultiply by a full (M, 8, L) tensor (pass-2 mid twiddles)."""
    y = jt.fmul(y_ref[0], pre_ref[:])
    out_ref[:] = _stages_in_kernel(y, tw_ref, cnt_ref)[None]


def _stages_kernel_r1(cnt_ref, y_ref, tw_ref, rs_ref, ls_ref, out_ref):
    """Premultiply by the rank-1 tensor rs[:, p] * ls[:, l] (coset-LDE
    ladder scale: rs = row ladder over the M axis, ls = lane ladder)."""
    rs = jnp.swapaxes(rs_ref[:], 0, 1)[:, :, None]  # (M, 8, 1)
    y = jt.fmul(jt.fmul(y_ref[0], rs), ls_ref[:][None])
    out_ref[:] = _stages_in_kernel(y, tw_ref, cnt_ref)[None]


def _use_pallas() -> bool:
    env = os.environ.get("ZKVM_NTT_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() not in ("cpu",)


_PALLAS_BAD = {"disabled": False}
_PROBED_SHAPES: set = set()
_BAD_SHAPES: set = set()

# Mosaic's default scoped-VMEM limit is 16 MB; the stage network keeps
# ~6 block temporaries per stage live (even in loop form), so raise the
# cap close to the 128 MB physical VMEM and size lane blocks to fit.
_VMEM_LIMIT = 112 * 1024 * 1024


def _lane_block(m: int, nl: int) -> int:
    """Lane-block width for an M-row stage kernel (0 = kernel infeasible).

    Mosaic's scoped stack holds ~6 block-sized temporaries PER STAGE even
    in loop form (measured: M=512/lb=128 -> 103 MB, M=1024/lb=128 ->
    194 MB), so the block must shrink as M (and the stage count) grows.
    M<=256 at 2 MB blocks measured safely inside the budget."""
    if m > 512:
        return 0  # 6 copies x stages x >=2MB blocks exceeds VMEM
    budget = 2 * 1024 * 1024
    l = budget // (m * 8 * 4)
    if l < 128:
        return 0  # Pallas requires lane blocks divisible by 128
    l = 1 << (l.bit_length() - 1)
    return min(l, nl)


def _pallas_stages(yb, tw, lb, pre=None, r1=None):
    """yb: (B, M, 8, NL); pre: (M, 8, NL) full premultiplier; r1: ((8, M),
    (8, NL)) rank-1 premultiplier; at most one of pre/r1.

    The stage count rides in as a prefetched scalar so the in-kernel
    fori_loop has a traced bound (static bounds unroll; see
    :func:`_stages_in_kernel`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m = yb.shape[0], yb.shape[1]
    nl = yb.shape[-1]
    in_specs = [
        pl.BlockSpec((1, m, 8, lb), lambda i, j, *_: (i, 0, 0, j)),
        pl.BlockSpec(tw.shape, lambda i, j, *_: (0, 0, 0)),
    ]
    args = [yb, tw]
    kernel = _stages_kernel
    if pre is not None:
        kernel = _stages_kernel_full
        in_specs.append(pl.BlockSpec((m, 8, lb), lambda i, j, *_: (0, 0, j)))
        args.append(pre)
    elif r1 is not None:
        kernel = _stages_kernel_r1
        in_specs.append(pl.BlockSpec((8, m), lambda i, j, *_: (0, 0)))
        in_specs.append(pl.BlockSpec((8, lb), lambda i, j, *_: (0, j)))
        args.extend(r1)
    cnt = jnp.asarray([tw.shape[0]], dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nl // lb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m, 8, lb), lambda i, j, *_: (i, 0, 0, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(yb.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(cnt, *args)


@jax.jit
def _probe_oracle(y, tw, pre, r1):
    """Jitted XLA oracle for :func:`_probe` — one compiled (and
    persistently cached) module instead of hundreds of eager per-op
    dispatches through the tunnel."""
    return _pease_stages_batched(_apply_pre(y, pre, r1), tw)


def _probe(m: int, lb: int, variant: str) -> bool:
    """Compile + run the kernel once for this (M, lane-block, variant),
    EAGERLY, and check its output against the XLA fallback body on random
    inputs.

    The tunneled TPU platform compiles asynchronously — a Mosaic failure
    would otherwise surface long after the pallas_call returned, bypassing
    any try/except.  Forcing a tiny dependent fetch here makes the failure
    catchable, once per shape per process.  The random-input equality check
    means a Mosaic *miscompile* (wrong BlockSpec indexing, bad lowering)
    also latches the fallback instead of surfacing as an invalid proof
    after a long run.  Must not run under a jit trace (callers use
    :func:`ensure_probed` from eager wrappers)."""
    key = (m, lb, variant)
    if key in _PROBED_SHAPES:
        return True
    if _PALLAS_BAD["disabled"] or key in _BAD_SHAPES:
        return False
    from zkvm.utils import probe_ledger

    if probe_ledger.check("ntt_stage", str(key)):
        _PROBED_SHAPES.add(key)
        return True
    try:
        rng = np.random.default_rng(0xA5EED ^ (m << 8) ^ lb)
        rand = lambda shape: jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
        )
        y = rand((1, m, 8, lb))
        tw = jnp.asarray(_stage_twiddles(m, False))
        pre = rand((m, 8, lb)) if variant == "full" else None
        r1 = (rand((8, m)), rand((8, lb))) if variant == "r1" else None
        out = np.asarray(_pallas_stages(y, tw, lb, pre=pre, r1=r1))
        want = np.asarray(_probe_oracle(y, tw, pre, r1))
        if not np.array_equal(out, want):
            raise RuntimeError("kernel output differs from the XLA oracle")
        _PROBED_SHAPES.add(key)
        probe_ledger.record("ntt_stage", str(key))
        return True
    except Exception as exc:  # Mosaic compile failure / miscompile: THIS shape
        import warnings

        _BAD_SHAPES.add(key)
        warnings.warn(
            f"Pallas NTT stage kernel {key} failed "
            f"({type(exc).__name__}: {exc}); XLA fallback for this shape."
        )
        return False


def _axis_sizes(n: int, scale: bool):
    """(m, lane_count, variant) of every axis pass a flat transform of size
    n performs, following the recursion of :func:`_ntt_t_core`."""
    if n == 1:
        return []
    n2, n1 = _split(n)
    out = []
    if n2 <= MAX_AXIS:
        if n2 > 1:
            out.append((n2, n1, "r1" if scale else "plain"))
    else:
        out.extend(_axis_sizes(n2, False))
    out.append((n1, n2, "full"))
    return out


def ensure_probed(n: int, scale: bool = False) -> bool:
    """Eagerly compile-check every Pallas stage kernel a size-n transform
    needs (``scale`` for the coset-LDE entry).  Call OUTSIDE jit before
    tracing code that uses ntt_t/intt_t/class_ntt_t on traced values (the
    jitted cores only use kernels probed here)."""
    if not _use_pallas() or _PALLAS_BAD["disabled"]:
        return False
    ok = True
    for m, nl, variant in _axis_sizes(n, scale):
        lb = _lane_block(m, nl)
        if nl >= 128 and lb:
            ok = _probe(m, lb, variant) and ok
    return ok


def _axis_stages(y, tw_host, pre=None, r1=None):
    """Dispatch the stage network over (..., M, 8, L) (pre-permuted).

    ``pre``/``r1`` premultipliers refer to the PERMUTED domain (rows already
    reordered by the initial layout indices)."""
    m = y.shape[-3]
    batch = y.shape[:-3]
    nl = y.shape[-1]
    tw = jnp.asarray(tw_host)
    variant = "full" if pre is not None else ("r1" if r1 is not None else "plain")
    lb = _lane_block(m, nl)
    if _use_pallas() and not _PALLAS_BAD["disabled"] and nl >= 128 and lb:
        probed = (m, lb, variant) in _PROBED_SHAPES
        if not probed and not isinstance(y, jax.core.Tracer):
            probed = _probe(m, lb, variant)
        if probed:
            yb = y.reshape((-1,) + y.shape[-3:])  # (B, M, 8, NL)
            out = _pallas_stages(yb, tw, lb, pre=pre, r1=r1)
            return out.reshape(batch + y.shape[-3:])
    y = _apply_pre(y, pre, r1)
    return _pease_stages_batched(y, tw)


def _apply_pre(y, pre, r1):
    if pre is not None:
        y = jt.fmul(y, pre)
    elif r1 is not None:
        rs, ls = r1
        y = jt.fmul(jt.fmul(y, jnp.swapaxes(rs, 0, 1)[:, :, None]), ls[None])
    return y


def _pease_stages_batched(y: jnp.ndarray, tw: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback: same network with leading batch axes."""
    m = y.shape[-3]
    h = m // 2
    for s in range(tw.shape[0]):
        a = y[..., :h, :, :]
        b = jt.fmul(y[..., h:, :, :], tw[s][:, :, None])
        y = jnp.concatenate([jt.fadd(a, b), jt.fsub(a, b)], axis=-3)
        z = y.reshape(y.shape[:-3] + (h, 2, 8, y.shape[-1]))
        y = jnp.concatenate([z[..., 0, :, :], z[..., 1, :, :]], axis=-3)
    return y


def _axis_ntt(y, m, inverse, pre=None, r1=None):
    """NTT along axis -3 of (..., M, 8, L); natural order in/out.

    ``pre``/``r1`` premultiply the INPUT (given in permuted row order)."""
    if m == 1:
        return _apply_pre(y, pre, r1)
    initial, final = _layout_indices(m)
    y = jnp.take(y, jnp.asarray(initial), axis=-3)
    y = _axis_stages(y, _stage_twiddles(m, inverse), pre=pre, r1=r1)
    return jnp.take(y, jnp.asarray(final), axis=-3)


# ---------------------------------------------------------------------------
# flat four-step transform
# ---------------------------------------------------------------------------

def _ntt_t_core(x, inverse, top=True, scale_r1=None):
    """Four-step transform of (..., 8, N) -> (..., 8, N), natural order.

    ``scale_r1`` = (row ladder (8, N2), lane ladder (8, N1)): premultiplies
    the input by base^n (rank-1 over the (n2, n1) index split), fused into
    the pass-1 kernel.  The iNTT's 1/N is fused into the top-level
    mid-twiddle tensor."""
    n = x.shape[-1]
    n2, n1 = _split(n)
    batch = x.shape[:-2]
    # (..., 8, N) -> (..., 8, N2, N1) [n1 minor] -> (..., N2, 8, N1)
    y = jnp.swapaxes(x.reshape(batch + (8, n2, n1)), -3, -2)
    if n2 <= MAX_AXIS:
        r1 = None
        if scale_r1 is not None:
            lad_m, lad_lane = scale_r1
            if n2 > 1:
                initial, _ = _layout_indices(n2)
                lad_m = lad_m[:, jnp.asarray(initial)]
            r1 = (lad_m, lad_lane)
        # pass 1 over n2 along axis -3 (root w^N1 = w_{N2}), lanes n1
        y = _axis_ntt(y, n2, inverse, r1=r1)  # index [k2][limb][n1]
        y = jnp.swapaxes(y, -3, -1)  # (..., N1, 8, N2): [n1][limb][k2]
    else:
        # recurse: arrange n2 on the lane axis and transform flat
        assert scale_r1 is None
        y = jnp.swapaxes(y, -3, -1)  # (..., N1, 8, N2)
        y = _ntt_t_core(y, inverse, top=False)  # [n1][limb][k2]
    # pass 2 over n1 along axis -3, mid twiddles fused as premultiplier
    y = _axis_ntt(
        y, n1, inverse, pre=_get_mid(n, inverse, inverse and top)
    )  # [k1][limb][k2]
    # flat k = k2 + N2*k1: k1 major -> move limbs out and flatten
    return jnp.swapaxes(y, -3, -2).reshape(batch + (8, n))


@jax.jit
def _ntt_t_jit(x: jnp.ndarray) -> jnp.ndarray:
    return _ntt_t_core(x, False)


@jax.jit
def _intt_t_jit(x: jnp.ndarray) -> jnp.ndarray:
    return _ntt_t_core(x, True)


def ntt_t(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT along the lane axis of (..., 8, N); natural order."""
    if x.shape[-1] == 1:
        return x
    if isinstance(x, jax.core.Tracer):
        # inline into the enclosing trace: a nested jit would cache a
        # jaxpr capturing the caller's ambient-const tracers and leak
        # them into later traces (zkvm/ntt/ambient.py)
        return _ntt_t_core(x, False)
    ensure_probed(x.shape[-1])
    return _ntt_t_jit(x)


def intt_t(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT along the lane axis of (..., 8, N)."""
    if x.shape[-1] == 1:
        return x
    if isinstance(x, jax.core.Tracer):
        return _ntt_t_core(x, True)  # inline; see ntt_t
    ensure_probed(x.shape[-1])
    return _intt_t_jit(x)


@functools.partial(jax.jit, static_argnames=("n",))
def scale_by_ladder_t(x: jnp.ndarray, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """x[..., 8, n] * base^i along the lane axis, WITHOUT materializing the
    full (8, n) ladder: base^n = base^(n1) * (base^N1)^(n2) on the index
    split n = n1 + N1*n2 — two broadcast multiplies, O(sqrt N) ladder memory.
    """
    n2, n1 = _split(n)
    batch = x.shape[:-2]
    one = jt.ones(1)[:, 0]
    lad1 = ladder_t(base, one, n1)  # (8, N1)
    base_n1 = base
    for _ in range(n1.bit_length() - 1):
        base_n1 = jt.fsquare(base_n1[:, None])[:, 0]
    lad2 = ladder_t(base_n1, one, n2)  # (8, N2)
    y = x.reshape(batch + (8, n2, n1))
    y = jt.fmul(jnp.swapaxes(y, -3, -2), lad1)  # (..., N2, 8, N1)
    y = jt.fmul(y, jnp.swapaxes(lad2, 0, 1)[:, :, None])  # (N2, 8, 1)
    return jnp.swapaxes(y, -3, -2).reshape(batch + (8, n))


def _class_ntt_body(coeffs_t: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    t = coeffs_t.shape[-1]
    n2, n1 = _split(t)
    if n2 > MAX_AXIS:  # recursion path: apply the scale unfused
        return _ntt_t_core(scale_by_ladder_t(coeffs_t, base, t), False)
    one = jt.ones(1)[:, 0]
    lad_lane = ladder_t(base, one, n1)  # (8, N1): base^n1
    base_n1 = base
    for _ in range(n1.bit_length() - 1):
        base_n1 = jt.fsquare(base_n1[:, None])[:, 0]
    lad_m = ladder_t(base_n1, one, n2)  # (8, N2): (base^N1)^n2
    return _ntt_t_core(coeffs_t, False, scale_r1=(lad_m, lad_lane))


_class_ntt_jit = jax.jit(_class_ntt_body)


def class_ntt_t(coeffs_t: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Evaluate degree-<T polys on the coset base*<w_T>: fused scale + NTT.

    coeffs_t: (..., 8, T) transposed coefficients; base: (8,) transposed
    limbs (traced).  Equivalent to nj.ntt(fmul(coeffs, ladder(base))) in the
    standard layout — the per-blowup-class LDE of the decomposed prover.
    The base^n ladder scale is fused into the pass-1 kernel as a rank-1
    premultiplier.
    """
    if coeffs_t.shape[-1] == 1:
        return coeffs_t
    if isinstance(coeffs_t, jax.core.Tracer):
        return _class_ntt_body(coeffs_t, base)  # inline; see ntt_t
    ensure_probed(coeffs_t.shape[-1], scale=True)
    return _class_ntt_jit(coeffs_t, base)


def to_t(x: jnp.ndarray) -> jnp.ndarray:
    """Standard layout (..., N, 8) -> transposed (..., 8, N)."""
    return jnp.swapaxes(x, -1, -2)


def from_t(x: jnp.ndarray) -> jnp.ndarray:
    """Transposed (..., 8, N) -> standard (..., N, 8)."""
    return jnp.swapaxes(x, -1, -2)

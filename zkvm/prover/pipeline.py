"""The STARK prover pipeline (device-resident heavy path).

Stages (SURVEY.md section 3.1 hot loops #2-#4, rebuilt TPU-first):

1. interpolate the 28 trace columns (batched iNTT) and extend onto the
   8x blowup coset (batched NTT); commit via batched BLAKE3 row hashes +
   Merkle;
2. evaluate all transition constraints over the LDE domain in one fused
   pass, add boundary quotients, divide by zerofiers pointwise;
3. split the composition polynomial into 8 degree-<T columns
   (C(x) = sum_k x^k h_k(x^8)), LDE + commit;
4. DEEP: draw z, open the OOD frame, combine trace/composition quotients
   into Y(x) over the domain;
5. FRI-fold Y with per-layer commitments; draw query positions; assemble
   openings.

Each numbered stage is one jitted function (cached per trace shape), so a
steady-state prove is a handful of fused XLA executions; the Fiat-Shamir
coin and Merkle path assembly run on host (microseconds).  Only ~num_queries
rows are ever gathered back to host.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

import os

from zkvm.air.constraints_jax import merged_transition
from zkvm.air.constraints_pallas import (
    merged_transition_pallas_pair,
    merged_transition_via_pallas,
)
from zkvm.air.layout import (
    NUM_ASSERTIONS,
    NUM_EXEMPTIONS,
    NUM_TRANSITION_CONSTRAINTS,
    TRACE_WIDTH,
    PublicInputs,
    get_assertions,
)
from zkvm.air.periodic import periodic_class_patterns, periodic_lde
from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash import blake3_jax as b3j
from zkvm.hash.merkle import DeviceMerkleTree
from zkvm.ntt import ambient as ntt_ambient
from zkvm.ntt import ntt_jax as nj
from zkvm.utils.profiler import profiler
from .fri import FOLD, fri_prove, gather_groups as fri_gather_groups
from .options import ProofOptions
from .proof import FriLayerOpening, Proof, QueryOpening
from .transcript import RandomCoin
from . import wire

NUM_COMP_COLUMNS = 8  # ce blowup for max constraint degree 7


def _use_pallas() -> bool:
    """Mosaic constraint kernel on real TPU; XLA fusion elsewhere.

    Override with ZKVM_PALLAS=1/0.  The Pallas path needs the TPU Mosaic
    compiler — on the CPU test mesh it would run interpreted (slow), so
    auto-select keys off the default backend platform.  If the kernel ever
    fails to compile, :func:`prove` falls back to the XLA path and latches
    the choice here (a bench must never die on an optional fast path).
    """
    if _PALLAS_STATE["disabled"]:
        return False
    env = os.environ.get("ZKVM_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    import jax

    return jax.default_backend() not in ("cpu",)


_PALLAS_STATE = {"disabled": False}


def _disable_pallas(exc: Exception) -> None:
    import warnings

    _PALLAS_STATE["disabled"] = True
    warnings.warn(
        f"Pallas constraint kernel failed ({type(exc).__name__}: {exc}); "
        "falling back to the XLA constraint path for this process."
    )


@functools.lru_cache(maxsize=None)
def _domain_constants(t_len: int, blowup: int):
    """Host-computed per-domain constants, moved to device once."""
    d = t_len * blowup
    offset = f128.DOMAIN_OFFSET
    g_trace = f128.get_root_of_unity(t_len)
    w_d = f128.get_root_of_unity(d)
    x_ladder = nj.ladder_host(w_d, d, offset)
    s_t = pow(offset, t_len, f128.P)
    w_b = f128.get_root_of_unity(blowup)
    inv_xt = [
        f128.finv(f128.fsub(f128.fmul(s_t, pow(w_b, i, f128.P)), 1))
        for i in range(blowup)
    ]
    inv_xt_tiled = jnp.tile(jnp.asarray(jf.to_limbs(inv_xt)), (t_len, 1))
    inv_off_ladder = nj.ladder_host(f128.finv(offset), d)
    e1 = pow(g_trace, t_len - 1, f128.P)
    e2 = pow(g_trace, t_len - 2, f128.P)
    x_last = pow(g_trace, t_len - NUM_EXEMPTIONS, f128.P)
    mask, ark = periodic_lde(t_len, blowup)
    return dict(
        d=d,
        g_trace=g_trace,
        x_ladder=x_ladder,
        inv_xt_tiled=inv_xt_tiled,
        inv_off_ladder=inv_off_ladder,
        e1=e1,
        e2=e2,
        x_last=x_last,
        mask=mask,
        ark=ark,
        # O(N) twiddle/permutation tables as stage ARGUMENTS, not baked
        # literals (zkvm/ntt/ambient.py): iNTT at T, coset-LDE NTTs at D
        ntt_consts={
            **nj.table_consts(t_len, True),
            **nj.table_consts(d, False),
            **nj.table_consts(d, True),
        },
    )


def _use_classes() -> bool:
    """Blowup-class-decomposed prover for the single-device path.

    The LDE domain splits into ``blowup`` residue classes (position
    i = r + blowup*k); each class is an independent T-point coset NTT of the
    trace coefficients, the AIR's next-row offset (+blowup) is +1 *within a
    class*, and periodic columns have literal period 16 in k.  A
    ``lax.scan`` over classes therefore computes commitment digests /
    constraint quotients / DEEP values with an O(T) working set instead of
    O(8T) — the full (28, D, 8) LDE matrix is never materialized, which is
    what fits the 2^23-point domain of a 2^20-row trace in a single chip's
    HBM.  All values are bit-identical to the monolithic path (exact field
    arithmetic; same polynomials).  Override with ZKVM_CLASS=0/1.
    """
    env = os.environ.get("ZKVM_CLASS", "")
    if env in ("0", "1"):
        return env == "1"
    return True


@functools.lru_cache(maxsize=None)
def _class_constants(t_len: int, blowup: int):
    """Host-computed per-class constants for the decomposed prover."""
    d = t_len * blowup
    offset = f128.DOMAIN_OFFSET
    g_trace = f128.get_root_of_unity(t_len)
    w_d = f128.get_root_of_unity(d)
    bases = [f128.fmul(offset, pow(w_d, r, f128.P)) for r in range(blowup)]
    s_t = pow(offset, t_len, f128.P)
    w_b = f128.get_root_of_unity(blowup)
    inv_xt = [
        f128.finv(f128.fsub(f128.fmul(s_t, pow(w_b, r, f128.P)), 1))
        for r in range(blowup)
    ]
    mask_cls, ark_cls = periodic_class_patterns(t_len, blowup)
    return dict(
        d=d,
        g_trace=g_trace,
        w_d=w_d,
        inv_off_ladder=nj.ladder_host(f128.finv(offset), d),
        e1=pow(g_trace, t_len - 1, f128.P),
        e2=pow(g_trace, t_len - 2, f128.P),
        x_last=pow(g_trace, t_len - NUM_EXEMPTIONS, f128.P),
        class_bases=jnp.asarray(jf.to_limbs(bases)),
        inv_xt_cls=jnp.asarray(jf.to_limbs(inv_xt)),
        mask_cls=mask_cls,
        ark_cls=ark_cls,
        # per-class T-point NTTs (fwd + inverse) and the size-D comp iNTT
        ntt_consts={
            **nj.table_consts(t_len, False),
            **nj.table_consts(t_len, True),
            **nj.table_consts(d, True),
        },
    )


def _use_tmode() -> bool:
    """Transposed-layout class prover (limbs on sublanes, Pallas kernels).

    The fast path on real TPUs: every heavy stage (four-step NTT, SoA
    BLAKE3, fused composition, multi-point evaluation) runs as Pallas
    kernels over the transposed layout, with domain-constant factors
    (zerofier/boundary denominators) precomputed per class.  Proof bytes
    are identical to the standard class path (exact field arithmetic; see
    test_tmode_byte_equality).  Off on the CPU mesh by default — the
    kernels would fall back to XLA graphs with no win.  Override with
    ZKVM_TMODE=0/1.
    """
    env = os.environ.get("ZKVM_TMODE", "")
    if env in ("0", "1"):
        return env == "1"
    import jax

    return jax.default_backend() not in ("cpu",)


@functools.lru_cache(maxsize=None)
def _class_constants_t(t_len: int, blowup: int):
    """Device tensors for the transposed class prover (one-time per shape).

    Includes everything proof-independent the composition kernel needs:
    per-class periodic columns, ``ee = (x-e1)(x-e2)/(x^T-1)`` and the
    boundary denominator inverses ``1/(x-1)``, ``1/(x-x_last)`` — so the
    hot path performs no field inversions at all.
    """
    from zkvm.field import jax_f128t as jt
    from zkvm.ntt import ntt_t as nt

    d = t_len * blowup
    offset = f128.DOMAIN_OFFSET
    g_trace = f128.get_root_of_unity(t_len)
    w_d = f128.get_root_of_unity(d)
    bases = [f128.fmul(offset, pow(w_d, r, f128.P)) for r in range(blowup)]
    s_t = pow(offset, t_len, f128.P)
    w_b = f128.get_root_of_unity(blowup)
    inv_xt = [
        f128.finv(f128.fsub(f128.fmul(s_t, pow(w_b, r, f128.P)), 1))
        for r in range(blowup)
    ]
    e1 = pow(g_trace, t_len - 1, f128.P)
    e2 = pow(g_trace, t_len - 2, f128.P)
    x_last = pow(g_trace, t_len - NUM_EXEMPTIONS, f128.P)

    mask_cls, ark_cls = periodic_class_patterns(t_len, blowup)
    mask_t = jnp.swapaxes(mask_cls, -1, -2)  # (B, 8, 16) pattern
    ark_t = jnp.swapaxes(ark_cls, -1, -2)  # (B, 8, 8, 16) pattern

    w_t_l = jnp.asarray(jt.tlimbs(g_trace))
    e1_c = jt.const_col(e1)
    e2_c = jt.const_col(e2)
    one_c = jt.const_col(1)
    xlast_c = jt.const_col(x_last)
    ee, den0, den1 = [], [], []
    for r in range(blowup):
        x_r = nt.ladder_t(w_t_l, jnp.asarray(jt.tlimbs(bases[r])), t_len)
        ex = jt.fmul(jt.fsub(x_r, e1_c), jt.fsub(x_r, e2_c))
        ee.append(jt.fmul(ex, jt.const_col(inv_xt[r])))
        den0.append(jt.fsub(x_r, one_c))
        den1.append(jt.fsub(x_r, xlast_c))
    ee_t = jnp.stack(ee)  # (B, 8, T)
    dens = jnp.stack(den0 + den1)  # (2B, 8, T)
    inv = jf.batch_inverse(jnp.swapaxes(dens, -1, -2))  # std layout
    inv = jnp.swapaxes(inv, -1, -2)
    i0_t, i1_t = inv[:blowup], inv[blowup:]

    return dict(
        d=d,
        g_trace=g_trace,
        w_d=w_d,
        e1=e1,
        e2=e2,
        x_last=x_last,
        class_bases_t=jnp.asarray(jf.to_limbs(bases)),  # (B, 8)
        mask_cls_t=mask_t,
        ark_cls_t=ark_t,
        ee_cls_t=ee_t,
        i0_cls_t=i0_t,
        i1_cls_t=i1_t,
        inv_off_t=nt.ladder_t_host(f128.finv(offset), d),  # (8, D)
        # mid-twiddle tensors as stage ARGUMENTS (zkvm/ntt/ambient.py) —
        # the size-D inverse tensor alone is 32*D bytes (256 MB at
        # T=2^20), far past any sane jitted-module literal budget
        ntt_consts_t={
            **nt.mid_consts(t_len, False),
            **nt.mid_consts(t_len, True),
            **nt.mid_consts(d, True),
        },
    )


@jax.jit
def _stage_trace_commit_t(cols_t, class_bases_t, ntt_consts):
    """(28, 8, T) transposed trace -> (coeffs_t, merkle heap).

    Past T=2^18 the batched 28-column transforms run as a lax.map over 4
    column blocks: a full-width four-step NTT keeps ~6 working copies of
    the 28*8*T tensor live (measured 2^20-row OOM against the ~14 GiB
    usable HBM of the v5e), while the map bounds transients to one block
    plus the stacked output.  Values are identical (columns transform
    independently); bench-size graphs (T<=2^17) are untouched."""
    from zkvm.hash import blake3_t as b3t
    from zkvm.ntt import ntt_t as nt

    with ntt_ambient.provide(ntt_consts):
        t = cols_t.shape[-1]
        n_cols = cols_t.shape[0]
        chunked = t >= (1 << 18) and n_cols % 4 == 0
        if chunked:
            blocks = cols_t.reshape(4, n_cols // 4, 8, t)
            coeffs_t = jax.lax.map(nt.intt_t, blocks).reshape(cols_t.shape)
        else:
            coeffs_t = nt.intt_t(cols_t)

        def cfn(carry, base_r):
            if chunked:
                cblocks = coeffs_t.reshape(4, n_cols // 4, 8, t)
                vals = jax.lax.map(
                    lambda c: nt.class_ntt_t(c, base_r), cblocks
                ).reshape(cols_t.shape)
            else:
                vals = nt.class_ntt_t(coeffs_t, base_r)
            return carry, b3t.hash_rows_t(vals)  # (8, T) digest words

        _, digs = jax.lax.scan(cfn, 0, class_bases_t)  # (B, 8, T)
        leaves = jnp.transpose(digs, (2, 0, 1)).reshape(-1, 8)  # i = r + B*k
        return coeffs_t, b3j.merkle_flat(leaves)


@functools.partial(jax.jit, static_argnames=("delta", "bcols0", "bcols1"))
def _stage_composition_t(
    coeffs_t, mask_cls_t, ark_cls_t, ee_cls_t, i0_cls_t, i1_cls_t,
    alphas, class_bases_t, bv0, bb0, bv1, bb1, ntt_consts,
    delta, bcols0, bcols1,
):
    """Constraint quotient per class, fully fused; returns (8, D)."""
    from zkvm.air import constraints_pallas as cp
    from zkvm.ntt import ntt_t as nt

    t = coeffs_t.shape[-1]
    n_cols = coeffs_t.shape[0]
    # column-blocked class LDE past T=2^18 (HBM peak; see
    # _stage_trace_commit_t)
    chunked = t >= (1 << 18) and n_cols % 4 == 0

    def cfn(carry, xs):
        base_r, mask_r, ark_r, ee_r, i0_r, i1_r = xs
        if chunked:
            cblocks = coeffs_t.reshape(4, n_cols // 4, 8, t)
            lde = jax.lax.map(
                lambda c: nt.class_ntt_t(c, base_r), cblocks
            ).reshape(coeffs_t.shape)
        else:
            lde = nt.class_ntt_t(coeffs_t, base_r)
        # expand the 16-step periodic patterns to the class length here —
        # one class at a time — instead of shipping (B, 9, T, 8) constants
        # (9.7 GB of repeated values at T=2^20; HBM OOM pre-round-4)
        q = cp.composition_t(
            lde, jnp.tile(mask_r, (1, t // 16)), jnp.tile(ark_r, (1, 1, t // 16)),
            ee_r, i0_r, i1_r, alphas,
            bv0, bb0, bv1, bb1, delta, bcols0, bcols1,
        )
        return carry, q  # (8, T)

    with ntt_ambient.provide(ntt_consts):
        _, q_cls = jax.lax.scan(
            cfn, 0,
            (class_bases_t, mask_cls_t, ark_cls_t, ee_cls_t, i0_cls_t,
             i1_cls_t),
        )  # (B, 8, T)
    return jnp.transpose(q_cls, (1, 2, 0)).reshape(8, -1)  # (8, D)


@jax.jit
def _stage_comp_commit_t(comp_t, inv_off_t, class_bases_t, ntt_consts):
    """(8, D) composition evals -> (h_coeffs_t (8, 8, T), merkle heap)."""
    from zkvm.hash import blake3_t as b3t
    from zkvm.ntt import ntt_t as nt
    from zkvm.field import jax_f128t as jt

    with ntt_ambient.provide(ntt_consts):
        d = comp_t.shape[-1]
        t = d // NUM_COMP_COLUMNS
        coeffs = jt.fmul(nt.intt_t(comp_t), inv_off_t)  # (8, D)
        h_t = jnp.moveaxis(coeffs.reshape(8, t, NUM_COMP_COLUMNS), -1, 0)

        def cfn(carry, base_r):
            vals = nt.class_ntt_t(h_t, base_r)
            return carry, b3t.hash_rows_t(vals)

        _, digs = jax.lax.scan(cfn, 0, class_bases_t)
        leaves = jnp.transpose(digs, (2, 0, 1)).reshape(-1, 8)
        return h_t, b3j.merkle_flat(leaves)


def _deep_quotient_t(a_t, zlad, zinvlad):
    """Coefficients of (A(x) - A(z)) / (x - z) from A's coefficients.

    c_i = z^-(i+1) * sum_{j>i} a_j z^j — the inner suffix sum is an
    associative scan (exact modular adds, any order), so no inversions and
    no sequential recurrence.  zlad[i] = z^i, zinvlad[i] = z^-(i+1).
    """
    from zkvm.field import jax_f128t as jt

    u = jt.fmul(a_t, zlad)
    # inclusive suffix sums by Hillis-Steele doubling: after log2(T) steps
    # s_i = sum_{j >= i} u_j (zero-padded shifts; 0 is the additive
    # identity in canonical limb form)
    n = u.shape[-1]
    s = u
    dstep = 1
    pad = [(0, 0)] * u.ndim
    while dstep < n:
        pad[-1] = (0, dstep)
        s = jt.fadd(s, jnp.pad(s[..., dstep:], pad))
        dstep *= 2
    s_excl = jt.fsub(s, u)
    return jt.fmul(s_excl, zinvlad)


@jax.jit
def _stage_deep_t(
    coeffs_t, h_t, gammas_t, deltas_t, epsilons_t,
    z_l, zg_l, zm_l, zi_l, zgi_l, zmi_l, class_bases_t, ntt_consts,
):
    """DEEP witness Y over the domain, via quotient polynomials.

    Y = sum of three synthetic-division quotients combined in COEFFICIENT
    space (degree < T-1), then one 1-column NTT per class — no per-class
    inversions, 28x less NTT work than combining evaluations.  Values are
    bit-identical to the pointwise form (exact field identity).
    z*_l: (8,) transposed limbs of z, z*g, z^m and their inverses.
    """
    from zkvm.field import jax_f128t as jt
    from zkvm.ntt import ntt_t as nt

    t = coeffs_t.shape[-1]
    if t >= (1 << 18):
        # column-scanned weighted sums: the one-shot fmul over the full
        # (28, 8, T) tensor holds ~10 operand-sized carry/product temps
        # (~9 GB at T=2^20 — measured HBM OOM); a scan accumulates with
        # one column's temps live.  Field addition is commutative and
        # exact, so the value is bit-identical.
        def _wsum(cols, w):
            def step(acc, xs):
                col, wc = xs
                return jt.fadd(acc, jt.fmul(col, wc[:, None])), None

            acc, _ = jax.lax.scan(
                step, jnp.zeros_like(cols[0]), (cols, w)
            )
            return acc

        a = _wsum(coeffs_t, gammas_t)  # (8, T)
        b = _wsum(coeffs_t, deltas_t)
        h = _wsum(h_t, epsilons_t)
    else:
        a = jt.fsum(jt.fmul(coeffs_t, gammas_t[:, :, None]), axis=0)
        b = jt.fsum(jt.fmul(coeffs_t, deltas_t[:, :, None]), axis=0)
        h = jt.fsum(jt.fmul(h_t, epsilons_t[:, :, None]), axis=0)

    one = jnp.asarray(nt.jt.tlimbs(1))
    y_coeffs = _deep_quotient_t(a, nt.ladder_t(z_l, one, t), nt.ladder_t(zi_l, zi_l, t))
    y_coeffs = jt.fadd(
        y_coeffs,
        _deep_quotient_t(b, nt.ladder_t(zg_l, one, t), nt.ladder_t(zgi_l, zgi_l, t)),
    )
    y_coeffs = jt.fadd(
        y_coeffs,
        _deep_quotient_t(h, nt.ladder_t(zm_l, one, t), nt.ladder_t(zmi_l, zmi_l, t)),
    )

    def cfn(carry, base_r):
        return carry, nt.class_ntt_t(y_coeffs, base_r)  # (8, T)

    with ntt_ambient.provide(ntt_consts):
        _, y_cls = jax.lax.scan(cfn, 0, class_bases_t)  # (B, 8, T)
    return jnp.transpose(y_cls, (1, 2, 0)).reshape(8, -1)  # (8, D)


def _ensure_t_kernels(t_len: int, d: int, delta: int, bcols0, bcols1, nq: int):
    """Eagerly compile-probe every Pallas kernel the T-mode prove uses (the
    tunneled platform compiles asynchronously; failures latch XLA
    fallbacks per kernel — see the ensure_probed docstrings)."""
    from zkvm.air import constraints_pallas as cp
    from zkvm.hash import blake3_t as b3t
    from zkvm.ntt import ntt_t as nt

    nt.ensure_probed(t_len)
    nt.ensure_probed(t_len, scale=True)
    nt.ensure_probed(d)
    # FRI fold layers: 8-point axis transforms over shrinking lane counts
    if nt._use_pallas() and not nt._PALLAS_BAD["disabled"]:
        size = d
        while size >= FOLD * 128:
            nt._probe(FOLD, nt._lane_block(FOLD, size // FOLD), "plain")
            size //= FOLD
    b3t.ensure_probed(TRACE_WIDTH)
    b3t.ensure_probed(NUM_COMP_COLUMNS)
    cp.ensure_composition_probed(delta, bcols0, bcols1, len(bcols0), len(bcols1))


def _one_limb() -> jnp.ndarray:
    return jnp.asarray(jf.to_limbs(1))


@jax.jit
def _stage_trace_commit_cls(cols, class_bases, ntt_consts=None):
    """(28, T, 8) trace columns -> (coeffs, merkle heap) without a full LDE.

    Per class r: scale coefficients by base_r^j, one T-point NTT, BLAKE3
    row hashes -> (T, 8) digests.  Classes interleave to natural row order
    (i = r + blowup*k) for the Merkle build.
    """
    with ntt_ambient.provide(ntt_consts):
        t = cols.shape[1]
        coeffs = nj.intt(cols)
        one = _one_limb()

        def cfn(carry, base_r):
            vals = nj.ntt(jf.fmul(coeffs, nj.ladder(base_r, one, t)))
            return carry, b3j.hash_rows(jnp.moveaxis(vals, 0, 1))

        _, digests = jax.lax.scan(cfn, 0, class_bases)  # (blowup, T, 8)
        leaves = jnp.moveaxis(digests, 0, 1).reshape(-1, 8)
        return coeffs, b3j.merkle_flat(leaves)


@functools.partial(
    jax.jit,
    static_argnames=("blowup", "delta", "e1", "e2", "x_last", "use_pallas"),
)
def _stage_composition_cls(
    coeffs, mask_cls, ark_cls, alphas, class_bases, inv_xt_cls,
    bvals0, bbetas0, bcols0, bvals1, bbetas1, bcols1, ntt_consts,
    blowup, delta, e1, e2, x_last, use_pallas=False,
):
    """Constraint quotient over the domain, one blowup class at a time."""
    t = coeffs.shape[1]
    one = _one_limb()
    w_t = jnp.asarray(jf.to_limbs(f128.get_root_of_unity(t)))
    one_t = jf.ones((t,))
    e1_t = jf.constant(e1, (t,))
    e2_t = jf.constant(e2, (t,))
    xlast_t = jf.constant(x_last, (t,))

    def cfn(carry, xs):
        base_r, mask_pat_r, ark_pat_r, inv_xt_r = xs
        # expand the 16-step periodic patterns to the class length (see
        # periodic_class_patterns): (16,8)->(T,8), (8,16,8)->(8,T,8)
        mask_r = jnp.tile(mask_pat_r, (t // 16, 1))
        ark_r = jnp.tile(ark_pat_r, (1, t // 16, 1))
        lde_r = nj.ntt(jf.fmul(coeffs, nj.ladder(base_r, one, t)))
        nxt = jnp.roll(lde_r, -1, axis=1)
        if use_pallas:
            q = merged_transition_pallas_pair(
                lde_r, nxt, mask_r, ark_r, delta, alphas
            )
        else:
            q = merged_transition(
                lde_r, blowup, mask_r, ark_r, delta, alphas, nxt=nxt
            )
        x_lad = nj.ladder(w_t, base_r, t)  # x values of class r
        exempt = jf.fmul(jf.fsub(x_lad, e1_t), jf.fsub(x_lad, e2_t))
        q = jf.fmul(q, jf.fmul(exempt, inv_xt_r[None, :]))

        den0 = jf.fsub(x_lad, one_t)
        den1 = jf.fsub(x_lad, xlast_t)
        inv_prod = jf.batch_inverse(jf.fmul(den0, den1))
        inv0 = jf.fmul(inv_prod, den1)
        inv1 = jf.fmul(inv_prod, den0)
        g0 = jf.fsum(
            jf.fmul(
                jf.fsub(lde_r[bcols0, :, :], bvals0[:, None, :]),
                bbetas0[:, None, :],
            ),
            axis=0,
        )
        g1 = jf.fsum(
            jf.fmul(
                jf.fsub(lde_r[bcols1, :, :], bvals1[:, None, :]),
                bbetas1[:, None, :],
            ),
            axis=0,
        )
        q = jf.fadd(q, jf.fmul(g0, inv0))
        q = jf.fadd(q, jf.fmul(g1, inv1))
        return carry, q

    with ntt_ambient.provide(ntt_consts):
        _, q_cls = jax.lax.scan(
            cfn, 0, (class_bases, mask_cls, ark_cls, inv_xt_cls)
        )  # (blowup, T, 8)
    d = t * blowup
    return jnp.moveaxis(q_cls, 0, 1).reshape(d, jf.NLIMBS)


@jax.jit
def _stage_comp_commit_cls(comp_evals, inv_off_ladder, class_bases,
                           ntt_consts=None):
    """Composition column commitment via per-class NTTs (no full comp LDE)."""
    with ntt_ambient.provide(ntt_consts):
        d = comp_evals.shape[0]
        coeffs = jf.fmul(nj.intt(comp_evals), inv_off_ladder)
        t = d // NUM_COMP_COLUMNS
        h_coeffs = jnp.moveaxis(
            coeffs.reshape(t, NUM_COMP_COLUMNS, jf.NLIMBS), 1, 0
        )  # (8, T, 8)
        one = _one_limb()

        def cfn(carry, base_r):
            vals = nj.ntt(jf.fmul(h_coeffs, nj.ladder(base_r, one, t)))
            return carry, b3j.hash_rows(jnp.moveaxis(vals, 0, 1))

        _, digests = jax.lax.scan(cfn, 0, class_bases)
        leaves = jnp.moveaxis(digests, 0, 1).reshape(-1, 8)
        return h_coeffs, b3j.merkle_flat(leaves)


@jax.jit
def _stage_deep_cls(coeffs, h_coeffs, gammas, deltas, epsilons,
                    a_z, b_zg, h_zm, z_c, zg_c, zm_c, class_bases,
                    ntt_consts=None):
    """DEEP witness Y over the domain from coefficient-space combinations.

    A(x) = sum_c gamma_c T_c(x) has coefficients sum_c gamma_c * coeffs_c,
    so combine once in coefficient space (28 -> 1 column) and evaluate with
    one T-point NTT per class — identical values to combining LDE columns
    pointwise, with 28x less NTT work and no LDE resident.
    """
    t = coeffs.shape[1]
    one = _one_limb()
    w_t = jnp.asarray(jf.to_limbs(f128.get_root_of_unity(t)))
    a_coeffs = jf.fsum(jf.fmul(coeffs, gammas[:, None, :]), axis=0)
    b_coeffs = jf.fsum(jf.fmul(coeffs, deltas[:, None, :]), axis=0)
    h_comb = jf.fsum(jf.fmul(h_coeffs, epsilons[:, None, :]), axis=0)
    abc = jnp.stack([a_coeffs, b_coeffs, h_comb], axis=0)  # (3, T, 8)
    ood = jnp.stack([a_z, b_zg, h_zm], axis=0)  # (3, 8)
    pts = jnp.stack([z_c, zg_c, zm_c], axis=0)  # (3, 8)

    def cfn(carry, base_r):
        vals = nj.ntt(jf.fmul(abc, nj.ladder(base_r, one, t)))  # (3, T, 8)
        x_lad = nj.ladder(w_t, base_r, t)
        den = jf.fsub(x_lad[None], pts[:, None, :])  # (3, T, 8)
        inv = jf.batch_inverse(den)
        terms = jf.fmul(jf.fsub(vals, ood[:, None, :]), inv)
        return carry, jf.fsum(terms, axis=0)  # (T, 8)

    with ntt_ambient.provide(ntt_consts):
        _, y_cls = jax.lax.scan(cfn, 0, class_bases)
    d = t * class_bases.shape[0]
    return jnp.moveaxis(y_cls, 0, 1).reshape(d, jf.NLIMBS)


@jax.jit
def _stage_query_rows(coeffs, points):
    """Evaluate committed polynomials at query points: (C, T, 8) x (Q, 8)
    -> (Q, C, 8).  Exact modular arithmetic makes this bit-identical to
    gathering the corresponding LDE rows."""
    t = coeffs.shape[1]
    one = _one_limb()

    def qfn(carry, pt):
        lad = nj.ladder(pt, one, t)
        # axis=-1 is the transform axis under fsum's batch-axis convention
        # (the trailing limb axis does not count), cf. _stage_eval_at
        return carry, jf.fsum(jf.fmul(coeffs, lad), axis=-1)

    _, rows = jax.lax.scan(qfn, 0, points)
    return rows


# ---------------------------------------------------------------------------
# jitted stages (cached by input shapes; mesh=None -> single device,
# mesh -> row-sharded SPMD with explicit collectives where it matters)
# ---------------------------------------------------------------------------

def _intt(x, mesh):
    if mesh is None:
        return nj.intt(x)
    from zkvm.dist.ntt_dist import intt_sharded

    return intt_sharded(x, mesh)


def _clde(x, blowup, mesh):
    if mesh is None:
        return nj.coset_lde(x, blowup)
    from zkvm.dist.ntt_dist import coset_lde_sharded

    return coset_lde_sharded(x, blowup, mesh)


def _merkle(leaves, mesh):
    if mesh is None:
        return b3j.merkle_flat(leaves)
    return b3j.merkle_forest_flat(leaves, mesh)


def _binv(x, mesh):
    """Montgomery batch inverse; per-device-local under a mesh (the inverse
    of each element is independent of the batching, so this is bit-exact)."""
    if mesh is None:
        return jf.batch_inverse(x)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    nb = x.ndim - 2
    spec = P(*([None] * nb), "row", None)
    return shard_map(
        jf.batch_inverse, mesh=mesh, in_specs=spec, out_specs=spec,
        check_vma=False,
    )(x)


def _wrap_tree(nodes, mesh):
    if mesh is None:
        return DeviceMerkleTree(nodes)
    from zkvm.hash.merkle import ShardedMerkleTree

    return ShardedMerkleTree(nodes, mesh.shape["row"])


@functools.partial(jax.jit, static_argnames=("blowup", "mesh"))
def _stage_trace_lde(cols, ntt_consts=None, blowup=8, mesh=None):
    with ntt_ambient.provide(ntt_consts):
        coeffs = _intt(cols, mesh)
        lde = _clde(coeffs, blowup, mesh)
        nodes = _merkle(b3j.hash_rows(jnp.moveaxis(lde, 0, 1)), mesh)
        return coeffs, lde, nodes


@functools.partial(
    jax.jit,
    static_argnames=("blowup", "delta", "e1", "e2", "x_last", "use_pallas", "mesh"),
)
def _stage_composition(
    lde, mask, ark, alphas, x_ladder, inv_xt_tiled,
    bvals0, bbetas0, bcols0, bvals1, bbetas1, bcols1,
    blowup, delta, e1, e2, x_last, use_pallas=False, mesh=None,
):
    d = lde.shape[1]
    if mesh is not None:
        from zkvm.air.constraints_dist import merged_transition_sharded

        q = merged_transition_sharded(lde, blowup, mask, ark, delta, alphas, mesh)
    elif use_pallas:
        q = merged_transition_via_pallas(lde, blowup, mask, ark, delta, alphas)
    else:
        q = merged_transition(lde, blowup, mask, ark, delta, alphas)
    exempt = jf.fmul(
        jf.fsub(x_ladder, jf.constant(e1, (d,))),
        jf.fsub(x_ladder, jf.constant(e2, (d,))),
    )
    q = jf.fmul(q, jf.fmul(exempt, inv_xt_tiled))

    # boundary groups at steps 0 and last_step; one batched inversion
    den0 = jf.fsub(x_ladder, jf.constant(1, (d,)))
    den1 = jf.fsub(x_ladder, jf.constant(x_last, (d,)))
    inv_prod = _binv(jf.fmul(den0, den1), mesh)
    inv0 = jf.fmul(inv_prod, den1)
    inv1 = jf.fmul(inv_prod, den0)

    g0 = jf.fsum(jf.fmul(jf.fsub(lde[bcols0, :, :], bvals0[:, None, :]), bbetas0[:, None, :]), axis=0)
    g1 = jf.fsum(jf.fmul(jf.fsub(lde[bcols1, :, :], bvals1[:, None, :]), bbetas1[:, None, :]), axis=0)
    q = jf.fadd(q, jf.fmul(g0, inv0))
    q = jf.fadd(q, jf.fmul(g1, inv1))
    return q


@functools.partial(jax.jit, static_argnames=("blowup", "mesh"))
def _stage_comp_commit(comp_evals, inv_off_ladder, ntt_consts=None,
                       blowup=8, mesh=None):
    with ntt_ambient.provide(ntt_consts):
        coeffs = jf.fmul(_intt(comp_evals, mesh), inv_off_ladder)
        # h_k = coeffs[k::8]: reshape + transpose (local per shard when the
        # row-shard size divides 8*T/P) instead of 8 strided gathers
        t = coeffs.shape[0] // NUM_COMP_COLUMNS
        h_coeffs = jnp.moveaxis(
            coeffs.reshape(t, NUM_COMP_COLUMNS, jf.NLIMBS), 1, 0
        )
        comp_lde = _clde(h_coeffs, blowup, mesh)
        nodes = _merkle(b3j.hash_rows(jnp.moveaxis(comp_lde, 0, 1)), mesh)
        return h_coeffs, comp_lde, nodes


@jax.jit
def _stage_eval_at(coeffs, ladder):
    """Evaluate polys (C, T, 8) at the ladder's point -> (C, 8)."""
    return jf.fsum(jf.fmul(coeffs, ladder), axis=-1)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _stage_deep(lde, comp_lde, x_ladder, gammas, deltas, epsilons,
                a_z, b_zg, h_zm, z_c, zg_c, zm_c, mesh=None):
    a = jf.fsum(jf.fmul(lde, gammas[:, None, :]), axis=0)
    b = jf.fsum(jf.fmul(lde, deltas[:, None, :]), axis=0)
    h = jf.fsum(jf.fmul(comp_lde, epsilons[:, None, :]), axis=0)
    den = jnp.stack(
        [jf.fsub(x_ladder, z_c), jf.fsub(x_ladder, zg_c), jf.fsub(x_ladder, zm_c)],
        axis=0,
    )
    inv = _binv(den, mesh)
    y = jf.fmul(jf.fsub(a, a_z), inv[0])
    y = jf.fadd(y, jf.fmul(jf.fsub(b, b_zg), inv[1]))
    y = jf.fadd(y, jf.fmul(jf.fsub(h, h_zm), inv[2]))
    return y


@jax.jit
def _gather_rows(arr, positions):
    """arr (C, D, 8), positions (Q,) -> (Q, C, 8)."""
    return jnp.moveaxis(arr[:, positions, :], 0, 1)


def _host_rows(arr, positions) -> List[List[int]]:
    got = jf.from_limbs(np.asarray(_gather_rows(arr, jnp.asarray(positions))))
    return [[int(v) for v in row] for row in got]


def _weighted_host(weights: List[int], values: List[int]) -> int:
    acc = 0
    for w, v in zip(weights, values):
        acc = f128.fadd(acc, f128.fmul(w, v))
    return acc


def prove(
    trace,
    pub_inputs: PublicInputs,
    options: ProofOptions = ProofOptions(),
    mesh=None,
) -> Proof:
    """Prove a trace; with ``mesh`` the O(D) stages run row-sharded SPMD.

    The proof bytes are identical for mesh=None and any mesh size (the
    sharded stages are exact restructurings; tested in test_dist.py).
    """
    t_len = trace.length
    blowup = options.blowup
    delta = pub_inputs.server_key.parameters.delta
    cls_mode = mesh is None and _use_classes()
    if cls_mode and _use_tmode():
        return _prove_t(trace, pub_inputs, options)
    dc = (
        _class_constants(t_len, blowup)
        if cls_mode
        else _domain_constants(t_len, blowup)
    )
    d = dc["d"]

    # ---- 1. trace LDE + commitment -----------------------------------
    cols = jnp.asarray(trace.as_limbs())  # (28, T, 8)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        row3 = NamedSharding(mesh, P(None, "row", None))
        row2 = NamedSharding(mesh, P("row", None))
        cols = jax.device_put(cols, row3)
        dc = dict(
            dc,
            x_ladder=jax.device_put(dc["x_ladder"], row2),
            inv_xt_tiled=jax.device_put(dc["inv_xt_tiled"], row2),
            mask=jax.device_put(dc["mask"], row2),
            ark=jax.device_put(dc["ark"], row3),
        )
    with profiler.phase("trace_lde_commit", rows=d) as _:
        if cls_mode:
            lde = None
            trace_coeffs, trace_nodes = _stage_trace_commit_cls(
                cols, dc["class_bases"], dc["ntt_consts"]
            )
        else:
            trace_coeffs, lde, trace_nodes = _stage_trace_lde(
                cols, dc["ntt_consts"], blowup=blowup, mesh=mesh
            )
        if profiler.enabled:
            profiler.sync(trace_nodes)
    trace_tree = _wrap_tree(trace_nodes, mesh)

    coin = RandomCoin(wire.coin_seed(t_len, TRACE_WIDTH, options, pub_inputs))
    coin.reseed(trace_tree.root)

    alphas = coin.draw_elements(NUM_TRANSITION_CONSTRAINTS)
    betas = coin.draw_elements(NUM_ASSERTIONS)

    # ---- 2. constraint composition -----------------------------------
    assertions = get_assertions(pub_inputs, t_len)
    group0 = [(c, v, b) for (c, s, v), b in zip(assertions, betas) if s == 0]
    group1 = [(c, v, b) for (c, s, v), b in zip(assertions, betas) if s != 0]
    with profiler.phase("constraint_eval", rows=d):
        if cls_mode:
            comp_evals = _constraint_eval_cls(
                trace_coeffs, dc, alphas, group0, group1, blowup, delta, t_len
            )
            if profiler.enabled:
                profiler.sync(comp_evals)
        else:
            comp_evals = _constraint_eval_mono(
                lde, dc, alphas, group0, group1, blowup, delta, mesh
            )
            if profiler.enabled:
                profiler.sync(comp_evals)

    # ---- 3. composition commitment -----------------------------------
    with profiler.phase("composition_commit", rows=d):
        if cls_mode:
            comp_lde = None
            h_coeffs, comp_nodes = _stage_comp_commit_cls(
                comp_evals, dc["inv_off_ladder"], dc["class_bases"],
                dc["ntt_consts"],
            )
        else:
            h_coeffs, comp_lde, comp_nodes = _stage_comp_commit(
                comp_evals, dc["inv_off_ladder"], dc["ntt_consts"],
                blowup=blowup, mesh=mesh,
            )
        if profiler.enabled:
            profiler.sync(comp_nodes)
    comp_tree = _wrap_tree(comp_nodes, mesh)
    coin.reseed(comp_tree.root)

    return _prove_tail(
        trace_coeffs, lde, h_coeffs, comp_lde, trace_tree, comp_tree,
        coin, dc, pub_inputs, options, t_len, d, mesh, cls_mode,
    )


def _boundary_args(group0, group1):
    return (
        jnp.asarray(jf.to_limbs([v for _, v, _ in group0])),
        jnp.asarray(jf.to_limbs([b for _, _, b in group0])),
        jnp.asarray([c for c, _, _ in group0], dtype=jnp.int32),
        jnp.asarray(jf.to_limbs([v for _, v, _ in group1])),
        jnp.asarray(jf.to_limbs([b for _, _, b in group1])),
        jnp.asarray([c for c, _, _ in group1], dtype=jnp.int32),
    )


def _constraint_eval_mono(lde, dc, alphas, group0, group1, blowup, delta, mesh):
    stage_args = (
        lde,
        dc["mask"],
        dc["ark"],
        jnp.asarray(jf.to_limbs(alphas)),
        dc["x_ladder"],
        dc["inv_xt_tiled"],
    ) + _boundary_args(group0, group1)
    stage_kwargs = dict(
        blowup=blowup,
        delta=delta,
        e1=dc["e1"],
        e2=dc["e2"],
        x_last=dc["x_last"],
        mesh=mesh,
    )
    if mesh is None and _use_pallas():
        try:
            return _stage_composition(*stage_args, use_pallas=True, **stage_kwargs)
        except Exception as exc:  # Mosaic/VMEM compile failures
            _disable_pallas(exc)
    return _stage_composition(*stage_args, use_pallas=False, **stage_kwargs)


def _constraint_eval_cls(
    trace_coeffs, dc, alphas, group0, group1, blowup, delta, t_len
):
    stage_args = (
        trace_coeffs,
        dc["mask_cls"],
        dc["ark_cls"],
        jnp.asarray(jf.to_limbs(alphas)),
        dc["class_bases"],
        dc["inv_xt_cls"],
    ) + _boundary_args(group0, group1) + (dc["ntt_consts"],)
    stage_kwargs = dict(
        blowup=blowup,
        delta=delta,
        e1=dc["e1"],
        e2=dc["e2"],
        x_last=dc["x_last"],
    )
    # the Pallas kernel wants >= 512 lanes per class block
    if _use_pallas() and t_len >= 512:
        try:
            return _stage_composition_cls(
                *stage_args, use_pallas=True, **stage_kwargs
            )
        except Exception as exc:  # Mosaic/VMEM compile failures
            _disable_pallas(exc)
    return _stage_composition_cls(*stage_args, use_pallas=False, **stage_kwargs)


def _prove_tail(
    trace_coeffs, lde, h_coeffs, comp_lde, trace_tree, comp_tree,
    coin, dc, pub_inputs, options, t_len, d, mesh, cls_mode,
):
    blowup = options.blowup
    # ---- 4. DEEP ------------------------------------------------------
    z = coin.draw()
    zg = f128.fmul(z, dc["g_trace"])
    z_m = pow(z, NUM_COMP_COLUMNS, f128.P)

    ood_cur = [
        int(v)
        for v in jf.from_limbs(
            np.asarray(_stage_eval_at(trace_coeffs, nj.ladder_host(z, t_len)))
        )
    ]
    ood_nxt = [
        int(v)
        for v in jf.from_limbs(
            np.asarray(_stage_eval_at(trace_coeffs, nj.ladder_host(zg, t_len)))
        )
    ]
    coin.reseed_with_elements(ood_cur + ood_nxt)
    ood_comp = [
        int(v)
        for v in jf.from_limbs(
            np.asarray(_stage_eval_at(h_coeffs, nj.ladder_host(z_m, t_len)))
        )
    ]
    coin.reseed_with_elements(ood_comp)

    # winterfell 0.9 DEEP coefficients: ONE coefficient per trace column
    # (used for both the z and z*g quotient terms) and one per composition
    # column — degree-adjustment pairs were removed in winterfell 0.9
    # (winter-air CHANGELOG 0.9.0; DeepCompositionCoefficients has single
    # `trace`/`constraints` vectors).
    gammas = coin.draw_elements(TRACE_WIDTH)
    deltas = gammas
    epsilons = coin.draw_elements(NUM_COMP_COLUMNS)

    with profiler.phase("deep_composition", rows=d):
        if cls_mode:
            y = _stage_deep_cls(
                trace_coeffs,
                h_coeffs,
                jnp.asarray(jf.to_limbs(gammas)),
                jnp.asarray(jf.to_limbs(deltas)),
                jnp.asarray(jf.to_limbs(epsilons)),
                jnp.asarray(jf.to_limbs(_weighted_host(gammas, ood_cur))),
                jnp.asarray(jf.to_limbs(_weighted_host(deltas, ood_nxt))),
                jnp.asarray(jf.to_limbs(_weighted_host(epsilons, ood_comp))),
                jnp.asarray(jf.to_limbs(z)),
                jnp.asarray(jf.to_limbs(zg)),
                jnp.asarray(jf.to_limbs(z_m)),
                dc["class_bases"],
                dc["ntt_consts"],
            )
        else:
            y = _stage_deep(
                lde,
                comp_lde,
                dc["x_ladder"],
                jnp.asarray(jf.to_limbs(gammas)),
                jnp.asarray(jf.to_limbs(deltas)),
                jnp.asarray(jf.to_limbs(epsilons)),
                jf.constant(_weighted_host(gammas, ood_cur), (d,)),
                jf.constant(_weighted_host(deltas, ood_nxt), (d,)),
                jf.constant(_weighted_host(epsilons, ood_comp), (d,)),
                jf.constant(z, (d,)),
                jf.constant(zg, (d,)),
                jf.constant(z_m, (d,)),
                mesh=mesh,
            )
        if profiler.enabled:
            profiler.sync(y)

    # ---- 5. FRI + queries ---------------------------------------------
    with profiler.phase("fri", rows=d):
        fri = fri_prove(coin, y, f128.DOMAIN_OFFSET, options)

    # proof-of-work grinding: find a nonce whose coin output has the
    # required leading zeros (reference preset uses factor 0 -> nonce 0)
    nonce = 0
    while coin.leading_zeros(nonce) < options.grinding_factor:
        nonce += 1
    # winterfell sorts and deduplicates the drawn positions
    # (winter-prover/src/lib.rs query_positions.sort_unstable()/dedup())
    positions = sorted(set(coin.draw_integers(options.num_queries, d, nonce)))

    with profiler.phase("query_assembly"):
        if cls_mode:
            # no LDE resident: evaluate the committed polynomials at the
            # query points (bit-identical to the LDE rows, exact arithmetic)
            pts = jnp.asarray(
                jf.to_limbs(
                    [
                        f128.fmul(
                            f128.DOMAIN_OFFSET, pow(dc["w_d"], p, f128.P)
                        )
                        for p in positions
                    ]
                )
            )
            trace_rows = [
                [int(v) for v in row]
                for row in jf.from_limbs(
                    np.asarray(_stage_query_rows(trace_coeffs, pts))
                )
            ]
            comp_rows = [
                [int(v) for v in row]
                for row in jf.from_limbs(
                    np.asarray(_stage_query_rows(h_coeffs, pts))
                )
            ]
        else:
            trace_rows = _host_rows(lde, positions)
            comp_rows = _host_rows(comp_lde, positions)
        trace_paths = trace_tree.open_many(positions)
        comp_paths = comp_tree.open_many(positions)

    return _assemble_proof(
        t_len, options, trace_tree, comp_tree, ood_cur, ood_nxt, ood_comp,
        fri, nonce, positions, trace_rows, trace_paths, comp_rows,
        comp_paths, d,
    )


def _assemble_proof(
    t_len, options, trace_tree, comp_tree, ood_cur, ood_nxt, ood_comp,
    fri, nonce, positions, trace_rows, trace_paths, comp_rows, comp_paths, d,
):
    proof = Proof(
        trace_length=t_len,
        trace_width=TRACE_WIDTH,
        num_queries=options.num_queries,
        blowup=options.blowup,
        grinding_factor=options.grinding_factor,
        fri_folding_factor=options.fri_folding_factor,
        fri_remainder_max_degree=options.fri_remainder_max_degree,
        trace_root=trace_tree.root,
        comp_root=comp_tree.root,
        ood_trace_cur=ood_cur,
        ood_trace_nxt=ood_nxt,
        ood_comp=ood_comp,
        fri_roots=[t.root for t in fri.trees],
        fri_remainder=fri.remainder,
        pow_nonce=nonce,
    )
    for p, trow, tpath, crow, cpath in zip(
        positions, trace_rows, trace_paths, comp_rows, comp_paths
    ):
        proof.queries.append(
            QueryOpening(
                position=p,
                trace_row=trow,
                trace_path=tpath,
                comp_row=crow,
                comp_path=cpath,
            )
        )
    # FRI openings per layer
    size = d
    layer_positions = list(positions)
    for layer_idx, tree in enumerate(fri.trees):
        group_idx = sorted(set(p % (size // FOLD) for p in layer_positions))
        gathered = jf.from_limbs(
            fri_gather_groups(fri, layer_idx, group_idx)
        )
        groups_host = {
            j: [int(v) for v in g] for j, g in zip(group_idx, gathered)
        }
        paths_host = dict(zip(group_idx, tree.open_many(group_idx)))
        layer = []
        folded = []
        for p in layer_positions:
            j = p % (size // FOLD)
            layer.append(
                FriLayerOpening(group=groups_host[j], path=paths_host[j])
            )
            folded.append(j)
        proof.fri_openings.append(layer)
        layer_positions = folded
        size //= FOLD

    return proof


def _prove_t(trace, pub_inputs: PublicInputs, options: ProofOptions) -> Proof:
    """Transposed-layout class prover (see :func:`_use_tmode`).

    Identical transcript and proof bytes to the standard class path; every
    heavy stage runs in the limbs-on-sublanes layout with Pallas kernels.
    """
    from zkvm.field import jax_f128t as jt
    from zkvm.ntt import ntt_t as nt
    from . import eval_mxu as em

    t_len = trace.length
    blowup = options.blowup
    delta = pub_inputs.server_key.parameters.delta
    dct = _class_constants_t(t_len, blowup)
    d = dct["d"]

    assertions = get_assertions(pub_inputs, t_len)
    bcols0 = tuple(c for (c, s, _) in assertions if s == 0)
    bcols1 = tuple(c for (c, s, _) in assertions if s != 0)
    _ensure_t_kernels(t_len, d, delta, bcols0, bcols1, options.num_queries)

    # ---- 1. trace LDE + commitment -----------------------------------
    cols_t = jnp.asarray(np.swapaxes(np.asarray(trace.as_limbs()), 1, 2))
    with profiler.phase("trace_lde_commit", rows=d):
        coeffs_t, trace_nodes = _stage_trace_commit_t(
            cols_t, dct["class_bases_t"], dct["ntt_consts_t"]
        )
        if profiler.enabled:
            profiler.sync(trace_nodes)
    trace_tree = DeviceMerkleTree(trace_nodes)
    del cols_t  # 28*8*T u32 (896 MB at T=2^20) dead once interpolated

    coin = RandomCoin(wire.coin_seed(t_len, TRACE_WIDTH, options, pub_inputs))
    coin.reseed(trace_tree.root)

    alphas = coin.draw_elements(NUM_TRANSITION_CONSTRAINTS)
    betas = coin.draw_elements(NUM_ASSERTIONS)

    # ---- 2. constraint composition -----------------------------------
    vals0 = [v for (c, s, v) in assertions if s == 0]
    vals1 = [v for (c, s, v) in assertions if s != 0]
    b0 = [b for (c, s, v), b in zip(assertions, betas) if s == 0]
    b1 = [b for (c, s, v), b in zip(assertions, betas) if s != 0]
    with profiler.phase("constraint_eval", rows=d):
        comp_t = _stage_composition_t(
            coeffs_t, dct["mask_cls_t"], dct["ark_cls_t"], dct["ee_cls_t"],
            dct["i0_cls_t"], dct["i1_cls_t"],
            jnp.asarray(jf.to_limbs(alphas)), dct["class_bases_t"],
            jnp.asarray(jf.to_limbs(vals0)), jnp.asarray(jf.to_limbs(b0)),
            jnp.asarray(jf.to_limbs(vals1)), jnp.asarray(jf.to_limbs(b1)),
            dct["ntt_consts_t"], delta, bcols0, bcols1,
        )
        if profiler.enabled:
            profiler.sync(comp_t)

    # ---- 3. composition commitment -----------------------------------
    with profiler.phase("composition_commit", rows=d):
        h_t, comp_nodes = _stage_comp_commit_t(
            comp_t, dct["inv_off_t"], dct["class_bases_t"],
            dct["ntt_consts_t"],
        )
        if profiler.enabled:
            profiler.sync(comp_nodes)
    comp_tree = DeviceMerkleTree(comp_nodes)
    del comp_t  # (8, D) evals (256 MB at T=2^20) dead once split/committed
    coin.reseed(comp_tree.root)

    # ---- 4. DEEP ------------------------------------------------------
    z = coin.draw()
    zg = f128.fmul(z, dct["g_trace"])
    z_m = pow(z, NUM_COMP_COLUMNS, f128.P)

    tl = lambda v: jnp.asarray(jt.tlimbs(v))
    with profiler.phase("ood_eval"):
        ood_cur, ood_nxt = em.multi_eval_rows(coeffs_t, [z, zg])
        coin.reseed_with_elements(ood_cur + ood_nxt)
        ood_comp = em.multi_eval_rows(h_t, [z_m])[0]
        coin.reseed_with_elements(ood_comp)

    # winterfell 0.9 DEEP coefficients: ONE coefficient per trace column
    # (used for both the z and z*g quotient terms) and one per composition
    # column — degree-adjustment pairs were removed in winterfell 0.9
    # (winter-air CHANGELOG 0.9.0; DeepCompositionCoefficients has single
    # `trace`/`constraints` vectors).
    gammas = coin.draw_elements(TRACE_WIDTH)
    deltas = gammas
    epsilons = coin.draw_elements(NUM_COMP_COLUMNS)

    with profiler.phase("deep_composition", rows=d):
        y_t = _stage_deep_t(
            coeffs_t, h_t,
            jnp.asarray(jf.to_limbs(gammas)),
            jnp.asarray(jf.to_limbs(deltas)),
            jnp.asarray(jf.to_limbs(epsilons)),
            tl(z), tl(zg), tl(z_m),
            tl(f128.finv(z)), tl(f128.finv(zg)), tl(f128.finv(z_m)),
            dct["class_bases_t"], dct["ntt_consts_t"],
        )
        if profiler.enabled:
            profiler.sync(y_t)

    # ---- 5. FRI + queries ---------------------------------------------
    from .fri import fri_prove_t

    with profiler.phase("fri", rows=d):
        fri = fri_prove_t(coin, y_t, f128.DOMAIN_OFFSET, options)

    nonce = 0
    while coin.leading_zeros(nonce) < options.grinding_factor:
        nonce += 1
    # winterfell sorts and deduplicates the drawn positions
    # (winter-prover/src/lib.rs query_positions.sort_unstable()/dedup())
    positions = sorted(set(coin.draw_integers(options.num_queries, d, nonce)))

    with profiler.phase("query_assembly"):
        x_pts = [
            f128.fmul(f128.DOMAIN_OFFSET, pow(dct["w_d"], p, f128.P))
            for p in positions
        ]
        trace_rows = em.multi_eval_rows(coeffs_t, x_pts)
        comp_rows = em.multi_eval_rows(h_t, x_pts)
        trace_paths = trace_tree.open_many(positions)
        comp_paths = comp_tree.open_many(positions)

    return _assemble_proof(
        t_len, options, trace_tree, comp_tree, ood_cur, ood_nxt, ood_comp,
        fri, nonce, positions, trace_rows, trace_paths, comp_rows,
        comp_paths, d,
    )

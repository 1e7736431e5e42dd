"""Fused transition-constraint Pallas kernel (TPU VMEM-resident).

The flagship prover kernel (SURVEY.md W4): for every LDE row, evaluate all
20 transition constraints and merge them with the composition coefficients —
one VMEM round trip per row block instead of XLA materializing intermediate
(D, 8) arrays in HBM between fusions.

Layout: the kernel works in the *transposed* limb layout of
:mod:`zkvm.field.jax_f128t` — arrays ``(..., 8, N)`` with the 8 f128 limbs on
the 8 VPU sublanes and the domain axis on the 128 lanes, giving full lane
utilization for every uint32 op (the standard ``(..., N, 8)`` layout uses 8
of 128 lanes).  Block shape per grid step: ``(28, 8, BLOCK)`` current +
next rows, ``(8, BLOCK)`` cycle mask, ``(8, 8, BLOCK)`` periodic ARK.

Same algebra as :func:`zkvm.air.constraints_jax.merged_transition`
(air/src/constrains.rs:95-216 in the reference); golden-tested against it.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from zkvm.field import jax_f128t as jt
from zkvm.hash import rescue_jax as rj
from .layout import Columns
from .constraints_golden import LWE_SIZE
from .constraints_jax import _SEL_ORDER, _SEL_PATTERNS

DEFAULT_BLOCK = 1024


def _stacked_selectors_t(bits: jnp.ndarray) -> jnp.ndarray:
    """bits (5, 8, N) [b0..b4, b0 = MSB] -> selector values (9, 8, N)."""
    one = jt.ones(bits.shape[-1])
    nb = jt.fsub(jnp.broadcast_to(one, bits.shape), bits)
    pat = jnp.asarray(_SEL_PATTERNS)[:, :, None, None]  # (9, 5, 1, 1)
    ops = jnp.where(pat, bits[None], nb[None])  # (9, 5, 8, N)
    t01 = jt.fmul(ops[:, 0], ops[:, 1])
    t23 = jt.fmul(ops[:, 2], ops[:, 3])
    return jt.fmul(jt.fmul(t01, t23), ops[:, 4])


def merged_transition_t(
    cur: jnp.ndarray,
    nxt: jnp.ndarray,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
    alphas: jnp.ndarray,
) -> jnp.ndarray:
    """Transposed-layout merged constraint evaluation.

    cur/nxt: (28, 8, N); mask: (8, N); ark: (8, 8, N); alphas: (20, 8).
    Returns sum_k alpha_k * gate_k * C_k as (8, N).
    """
    n = cur.shape[-1]
    one = jt.ones(n)

    s = lambda i: cur[Columns.STACK + i]
    sn = lambda i: nxt[Columns.STACK + i]
    bits = jnp.stack([cur[5], cur[4], cur[3], cur[2], cur[1]], axis=0)
    sel = _stacked_selectors_t(bits)
    f = {name: sel[i] for i, name in enumerate(_SEL_ORDER)}
    shr, shl = bits[0], bits[1]

    exprs = [None] * 20
    gates = [None] * 20

    # 0: clk' - (clk + 1)
    exprs[0] = jt.fsub(nxt[Columns.CLK], jt.fadd(cur[Columns.CLK], one))
    gates[0] = one
    # 1: depth bookkeeping
    c4 = jt.fmul(
        jnp.stack([f["read2"], f["add2"]], axis=0), jt.constant(4)[None]
    )
    depth = jt.fsub(nxt[Columns.DEPTH], cur[Columns.DEPTH])
    depth = jt.fadd(jt.fsub(depth, shr), shl)
    exprs[1] = jt.fadd(jt.fsub(depth, c4[0]), c4[1])
    gates[1] = one
    # 2: shr * shl
    exprs[2] = jt.fmul(shr, shl)
    gates[2] = one
    # 3: add
    exprs[3] = jt.fsub(sn(0), jt.fadd(s(0), s(1)))
    gates[3] = f["add"]
    # 4: sadd
    sn04 = jt.fsum(nxt[Columns.STACK : Columns.STACK + LWE_SIZE], axis=0)
    s15 = jt.fsum(cur[Columns.STACK + 1 : Columns.STACK + 1 + LWE_SIZE], axis=0)
    ds0 = jt.fmul(jt.constant(delta), s(0))
    exprs[4] = jt.fsub(jt.fsub(sn04, s15), ds0)
    gates[4] = f["sadd"]
    # 5: add2
    s04 = jt.fsum(cur[Columns.STACK : Columns.STACK + LWE_SIZE], axis=0)
    s59 = jt.fsum(
        cur[Columns.STACK + LWE_SIZE : Columns.STACK + 2 * LWE_SIZE], axis=0
    )
    exprs[5] = jt.fsub(jt.fsub(sn04, s04), s59)
    gates[5] = f["add2"]
    # 6: mul
    exprs[6] = jt.fsub(sn(0), jt.fmul(s(0), s(1)))
    gates[6] = f["mul"]
    # 7: smul
    exprs[7] = jt.fsub(sn04, jt.fmul(s(0), s15))
    gates[7] = f["smul"]
    # 8-11: push/read/read2/noop shift checks
    shifted = jt.fsub(
        jnp.stack([sn(1), sn(1), sn(LWE_SIZE), sn(0)], axis=0),
        jnp.broadcast_to(s(0), (4,) + s(0).shape),
    )
    for k, name in enumerate(["push", "read", "read2", "noop"]):
        exprs[8 + k] = shifted[k]
        gates[8 + k] = f[name]

    # 12-15: hash round (meet in the middle; air/src/constrains.rs:182-209)
    h0 = cur[Columns.HFLAG]
    state = jnp.stack([cur[c] for c in Columns.HASH], axis=0)  # (4, 8, N)
    step0 = _sbox_t(state)
    step0 = _mds_t(rj.mds_limbs(), step0)
    step0 = jt.fadd(step0, ark[0:4])
    opcode_w = jnp.asarray(jt.tlimbs([16, 8, 4, 2, 1]))  # (8, 5)
    opcode_terms = jt.fmul(bits, opcode_w.T[:, :, None])
    opcode = jt.fsum(opcode_terms, axis=0)
    inj0 = jt.fadd(step0[0], opcode)
    inj1 = jt.fadd(step0[1], jt.fmul(sn(0), f["push"]))
    step0 = jnp.concatenate([inj0[None], inj1[None], step0[2:]], axis=0)

    state_n = jnp.stack([nxt[c] for c in Columns.HASH], axis=0)
    step1 = jt.fsub(state_n, ark[4:8])
    step1 = _mds_t(rj.inv_mds_limbs(), step1)
    step1 = _sbox_t(step1)
    diff = jt.fsub(step1, step0)  # (4, 8, N)
    gate = jt.fmul(mask, h0)
    for i in range(4):
        exprs[12 + i] = diff[i]
        gates[12 + i] = gate

    # 16-19: hash copy / capacity reset
    ngate = jt.fmul(jt.fsub(one, mask), h0)
    copy01 = jt.fsub(
        jnp.stack([nxt[Columns.HASH[0]], nxt[Columns.HASH[1]]], axis=0),
        jnp.stack([cur[Columns.HASH[0]], cur[Columns.HASH[1]]], axis=0),
    )
    exprs[16], exprs[17] = copy01[0], copy01[1]
    exprs[18], exprs[19] = nxt[Columns.HASH[2]], nxt[Columns.HASH[3]]
    for i in range(4):
        gates[16 + i] = ngate

    e_stack = jnp.stack(exprs, axis=0)  # (20, 8, N)
    g_stack = jnp.stack(gates, axis=0)
    gated = jt.fmul(e_stack, g_stack)
    weighted = jt.fmul(gated, alphas[:, :, None])
    return jt.fsum(weighted, axis=0)


def _sbox_t(state: jnp.ndarray) -> jnp.ndarray:
    return jt.fmul(jt.fmul(state, state), state)


def _mds_t(mat: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, 8) constant matrix x (4, 8, N) state -> (4, 8, N)."""
    prod = jt.fmul(mat[..., None], state[None])  # (4, 4, 8, N)
    return jt.fsum(prod, axis=1)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

def _kernel(delta, cur_ref, nxt_ref, mask_ref, ark_ref, alphas_ref, out_ref):
    out_ref[:] = merged_transition_t(
        cur_ref[:], nxt_ref[:], mask_ref[:], ark_ref[:], delta, alphas_ref[:]
    )


@functools.partial(
    jax.jit, static_argnames=("delta", "block", "interpret")
)
def merged_transition_pallas(
    lde_t: jnp.ndarray,
    nxt_t: jnp.ndarray,
    mask_t: jnp.ndarray,
    ark_t: jnp.ndarray,
    alphas: jnp.ndarray,
    delta: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Merged transition evaluation as a row-block Pallas kernel.

    lde_t/nxt_t: (28, 8, D) transposed current/next LDE rows; mask_t: (8, D);
    ark_t: (8, 8, D); alphas: (20, 8).  Returns (8, D).  ``D`` must be a
    multiple of ``block`` (all domains are powers of two >= 128).
    """
    d = lde_t.shape[-1]
    block = min(block, d)
    grid = (d // block,)
    kernel = functools.partial(_kernel, delta)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((28, 8, block), lambda i: (0, 0, i)),
            pl.BlockSpec((28, 8, block), lambda i: (0, 0, i)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            pl.BlockSpec((8, 8, block), lambda i: (0, 0, i)),
            pl.BlockSpec((20, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, d), jnp.uint32),
        interpret=interpret,
    )(lde_t, nxt_t, mask_t, ark_t, alphas)


def merged_transition_via_pallas(
    lde: jnp.ndarray,
    blowup: int,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
    alphas: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`constraints_jax.merged_transition` (std layout).

    Transposes (28, D, 8) -> (28, 8, D) at the kernel boundary; the rest of
    the pipeline keeps the standard layout.
    """
    lde_t = jnp.moveaxis(lde, -1, -2)
    nxt_t = jnp.roll(lde_t, -blowup, axis=-1)
    mask_t = jnp.moveaxis(mask, -1, -2)
    ark_t = jnp.moveaxis(ark, -1, -2)
    q_t = merged_transition_pallas(
        lde_t, nxt_t, mask_t, ark_t, alphas, delta, block=block,
        interpret=interpret,
    )
    return jnp.moveaxis(q_t, -1, -2)

"""Batched transition-constraint evaluation over the LDE domain.

The flagship compute kernel of the prover (SURVEY.md W4): evaluates all 20
transition constraints at every LDE row in one fused vectorized pass and
merges them with the composition coefficients.  Input/output are f128 limb
arrays; everything is elementwise over the domain axis, so XLA maps it onto
the VPU with no data-dependent control flow.

Golden oracle: :mod:`zkvm.air.constraints_golden` (tested frame-by-frame).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from zkvm.field import jax_f128 as jf
from zkvm.hash import rescue_jax as rj
from .layout import Columns
from .constraints_golden import LWE_SIZE


def _selectors(bits):
    """bits: list of 5 (D, 8) arrays b0..b4 (AIR convention, b0 = MSB)."""
    b0, b1, b2, b3, b4 = bits
    one = jf.ones(b0.shape[:-1])
    n = lambda b: jf.fsub(one, b)

    def prod(*xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = jf.fmul(acc, x)
        return acc

    return {
        "shr": b0,
        "shl": b1,
        "add": prod(n(b0), b1, n(b2), n(b3), n(b4)),
        "sadd": prod(n(b0), b1, n(b2), b3, n(b4)),
        "add2": prod(n(b0), b1, n(b2), b3, b4),
        "mul": prod(n(b0), b1, n(b2), n(b3), b4),
        "smul": prod(n(b0), b1, b2, n(b3), n(b4)),
        "push": prod(b0, n(b1), n(b2), n(b3), n(b4)),
        "read": prod(b0, n(b1), n(b2), n(b3), b4),
        "read2": prod(b0, n(b1), n(b2), b3, n(b4)),
        "noop": prod(n(b0), n(b1), n(b2), n(b3), n(b4)),
    }


def evaluate_constraints(
    cur: jnp.ndarray,
    nxt: jnp.ndarray,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
) -> list:
    """All 20 constraint value arrays.

    cur/nxt: (28, D, 8) current and next-step rows of every column;
    mask: (D, 8) CYCLE_MASK values; ark: (8, D, 8) periodic round constants;
    delta: LWE delta (host int).  Returns a list of 20 (D, 8) arrays.
    """
    D = cur.shape[1]
    one = jf.ones((D,))

    s = lambda i: cur[Columns.STACK + i]
    sn = lambda i: nxt[Columns.STACK + i]
    # AIR bit order: b0 = column 5 (MSB) ... b4 = column 1
    bits = [cur[5], cur[4], cur[3], cur[2], cur[1]]
    f = _selectors(bits)
    delta_c = jf.constant(delta, (D,))
    four = jf.constant(4, (D,))

    res = []
    # 0: clk' - (clk + 1)
    res.append(jf.fsub(nxt[Columns.CLK], jf.fadd(cur[Columns.CLK], one)))
    # 1: d' - d - shr + shl - 4*read2 + 4*add2
    depth = jf.fsub(nxt[Columns.DEPTH], cur[Columns.DEPTH])
    depth = jf.fsub(depth, f["shr"])
    depth = jf.fadd(depth, f["shl"])
    depth = jf.fsub(depth, jf.fmul(f["read2"], four))
    depth = jf.fadd(depth, jf.fmul(f["add2"], four))
    res.append(depth)
    # 2: shr * shl
    res.append(jf.fmul(f["shr"], f["shl"]))
    # 3: add
    res.append(jf.fmul(f["add"], jf.fsub(sn(0), jf.fadd(s(0), s(1)))))
    # 4: sadd
    acc = jf.zeros((D,))
    for i in range(LWE_SIZE):
        out_i = s(1 + i)
        if i == LWE_SIZE - 1:
            out_i = jf.fadd(out_i, jf.fmul(delta_c, s(0)))
        acc = jf.fadd(acc, jf.fsub(sn(i), out_i))
    res.append(jf.fmul(f["sadd"], acc))
    # 5: add2
    acc = jf.zeros((D,))
    for i in range(LWE_SIZE):
        acc = jf.fadd(acc, jf.fsub(sn(i), jf.fadd(s(i), s(LWE_SIZE + i))))
    res.append(jf.fmul(f["add2"], acc))
    # 6: mul
    res.append(jf.fmul(f["mul"], jf.fsub(sn(0), jf.fmul(s(0), s(1)))))
    # 7: smul
    acc = jf.zeros((D,))
    for i in range(LWE_SIZE):
        acc = jf.fadd(acc, jf.fsub(sn(i), jf.fmul(s(0), s(1 + i))))
    res.append(jf.fmul(f["smul"], acc))
    # 8-10: push/read/read2
    res.append(jf.fmul(f["push"], jf.fsub(sn(1), s(0))))
    res.append(jf.fmul(f["read"], jf.fsub(sn(1), s(0))))
    res.append(jf.fmul(f["read2"], jf.fsub(sn(LWE_SIZE), s(0))))
    # 11: noop
    res.append(jf.fmul(f["noop"], jf.fsub(sn(0), s(0))))

    # 12-15: hash round, meet in the middle
    h0 = cur[Columns.HFLAG]
    state = jnp.stack([cur[c] for c in Columns.HASH], axis=-2)  # (D, 4, 8)
    step0 = rj.apply_sbox(state)
    step0 = rj.apply_mds(step0)
    step0 = jf.fadd(step0, jnp.moveaxis(ark[0:4], 0, -2))
    # opcode injection into lane 0; pushed value into lane 1
    opcode = jf.zeros((D,))
    for weight, b in zip([16, 8, 4, 2, 1], bits):
        opcode = jf.fadd(opcode, jf.fmul(jf.constant(weight, (D,)), b))
    inj0 = jf.fadd(step0[..., 0, :], opcode)
    inj1 = jf.fadd(step0[..., 1, :], jf.fmul(sn(0), f["push"]))
    step0 = jnp.concatenate(
        [inj0[..., None, :], inj1[..., None, :], step0[..., 2:, :]], axis=-2
    )

    state_n = jnp.stack([nxt[c] for c in Columns.HASH], axis=-2)
    step1 = jf.fsub(state_n, jnp.moveaxis(ark[4:8], 0, -2))
    step1 = rj.apply_inv_mds(step1)
    step1 = rj.apply_sbox(step1)

    gate = jf.fmul(mask, h0)
    diff = jf.fsub(step1, step0)  # (D, 4, 8)
    for i in range(4):
        res.append(jf.fmul(diff[..., i, :], gate))

    # 16-19: hash copy / capacity reset
    ngate = jf.fmul(jf.fsub(jf.ones((D,)), mask), h0)
    res.append(jf.fmul(jf.fsub(nxt[Columns.HASH[0]], cur[Columns.HASH[0]]), ngate))
    res.append(jf.fmul(jf.fsub(nxt[Columns.HASH[1]], cur[Columns.HASH[1]]), ngate))
    res.append(jf.fmul(nxt[Columns.HASH[2]], ngate))
    res.append(jf.fmul(nxt[Columns.HASH[3]], ngate))

    return res


# selector bit patterns (AIR bit order b0..b4, b0 = MSB): 1 -> bit, 0 -> 1-bit
_SEL_ORDER = ["add", "sadd", "add2", "mul", "smul", "push", "read", "read2", "noop"]
_SEL_PATTERNS = np.asarray(
    [
        [0, 1, 0, 0, 0],  # add   = 0b01000
        [0, 1, 0, 1, 0],  # sadd  = 0b01010
        [0, 1, 0, 1, 1],  # add2  = 0b01011
        [0, 1, 0, 0, 1],  # mul   = 0b01001
        [0, 1, 1, 0, 0],  # smul  = 0b01100
        [1, 0, 0, 0, 0],  # push  = 0b10000
        [1, 0, 0, 0, 1],  # read  = 0b10001
        [1, 0, 0, 1, 0],  # read2 = 0b10010
        [0, 0, 0, 0, 0],  # noop  = 0b00000
    ],
    dtype=bool,
)


def _stacked_selectors(bits: jnp.ndarray) -> jnp.ndarray:
    """bits (5, D, 8) [b0..b4] -> selector values (9, D, 8) in _SEL_ORDER.

    One jnp.where + a 4-node tree product instead of 36 fmul graph nodes.
    """
    nb = jf.fsub(jnp.broadcast_to(jf.ones(bits.shape[1:-1]), bits.shape), bits)
    pat = jnp.asarray(_SEL_PATTERNS)[:, :, None, None]
    ops = jnp.where(pat, bits[None, :, :, :], nb[None, :, :, :])  # (9, 5, D, 8)
    t01 = jf.fmul(ops[:, 0], ops[:, 1])
    t23 = jf.fmul(ops[:, 2], ops[:, 3])
    return jf.fmul(jf.fmul(t01, t23), ops[:, 4])


def merged_transition(
    lde: jnp.ndarray,
    blowup: int,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
    alphas: jnp.ndarray,
    nxt: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """sum_k alpha_k * C_k over the whole domain -> (D, 8).

    lde: (28, D, 8); next row at LDE index i is i + blowup (mod D);
    alphas: (20, 8) composition coefficients.  ``nxt`` overrides the
    internally rolled next-row view (the sharded prover passes a
    halo-exchanged local block so no device materializes a global roll).

    Stacked formulation: expressions for all 20 constraints are built with
    a minimal number of *graph nodes* (tree products for selectors, fsum
    over stacked slices, one gated product, one coefficient merge) — the
    same math as :func:`evaluate_constraints` with ~4x fewer fmul nodes,
    which directly bounds XLA compile time.
    """
    cur = lde
    if nxt is None:
        nxt = jnp.roll(lde, -blowup, axis=1)
    d = cur.shape[1]
    one = jf.ones((d,))

    s = lambda i: cur[Columns.STACK + i]
    sn = lambda i: nxt[Columns.STACK + i]
    bits = jnp.stack([cur[5], cur[4], cur[3], cur[2], cur[1]], axis=0)
    sel = _stacked_selectors(bits)
    f = {name: sel[i] for i, name in enumerate(_SEL_ORDER)}
    shr, shl = bits[0], bits[1]

    exprs = [None] * 20
    gates = [None] * 20

    # 0: clk' - (clk + 1)                       (ungated)
    exprs[0] = jf.fsub(nxt[Columns.CLK], jf.fadd(cur[Columns.CLK], one))
    gates[0] = one
    # 1: depth bookkeeping                      (ungated; consts via 1 fmul)
    c4 = jf.fmul(
        jnp.stack([f["read2"], f["add2"]], axis=0), jf.constant(4, (2, 1))
    )
    depth = jf.fsub(nxt[Columns.DEPTH], cur[Columns.DEPTH])
    depth = jf.fadd(jf.fsub(depth, shr), shl)
    exprs[1] = jf.fadd(jf.fsub(depth, c4[0]), c4[1])
    gates[1] = one
    # 2: shr * shl
    exprs[2] = jf.fmul(shr, shl)
    gates[2] = one
    # 3: add
    exprs[3] = jf.fsub(sn(0), jf.fadd(s(0), s(1)))
    gates[3] = f["add"]
    # 4: sadd — sum_i sn_i - sum_i ct_i - delta*s0   (ct = s1..s5)
    sn04 = jf.fsum(nxt[Columns.STACK : Columns.STACK + LWE_SIZE], axis=0)
    s15 = jf.fsum(cur[Columns.STACK + 1 : Columns.STACK + 1 + LWE_SIZE], axis=0)
    ds0 = jf.fmul(jf.constant(delta, (d,)), s(0))
    exprs[4] = jf.fsub(jf.fsub(sn04, s15), ds0)
    gates[4] = f["sadd"]
    # 5: add2 — sum_i sn_i - sum_i s_i - sum_i s_{5+i}
    s04 = jf.fsum(cur[Columns.STACK : Columns.STACK + LWE_SIZE], axis=0)
    s59 = jf.fsum(
        cur[Columns.STACK + LWE_SIZE : Columns.STACK + 2 * LWE_SIZE], axis=0
    )
    exprs[5] = jf.fsub(jf.fsub(sn04, s04), s59)
    gates[5] = f["add2"]
    # 6: mul
    exprs[6] = jf.fsub(sn(0), jf.fmul(s(0), s(1)))
    gates[6] = f["mul"]
    # 7: smul — sum_i sn_i - s0 * sum_i ct_i
    exprs[7] = jf.fsub(sn04, jf.fmul(s(0), s15))
    gates[7] = f["smul"]
    # 8-11: push/read/read2/noop shift checks (one stacked fsub)
    shifted = jf.fsub(
        jnp.stack([sn(1), sn(1), sn(LWE_SIZE), sn(0)], axis=0),
        jnp.broadcast_to(s(0), (4, d, jf.NLIMBS)),
    )
    for k, name in enumerate(["push", "read", "read2", "noop"]):
        exprs[8 + k] = shifted[k]
        gates[8 + k] = f[name]

    # 12-15: hash round (meet in the middle)
    h0 = cur[Columns.HFLAG]
    state = jnp.stack([cur[c] for c in Columns.HASH], axis=-2)  # (D, 4, 8)
    step0 = rj.apply_sbox(state)
    step0 = rj.apply_mds(step0)
    step0 = jf.fadd(step0, jnp.moveaxis(ark[0:4], 0, -2))
    opcode_terms = jf.fmul(
        bits, jnp.asarray(jf.to_limbs([16, 8, 4, 2, 1]))[:, None, :]
    )
    opcode = jf.fsum(opcode_terms, axis=0)
    inj0 = jf.fadd(step0[..., 0, :], opcode)
    inj1 = jf.fadd(step0[..., 1, :], jf.fmul(sn(0), f["push"]))
    step0 = jnp.concatenate(
        [inj0[..., None, :], inj1[..., None, :], step0[..., 2:, :]], axis=-2
    )
    state_n = jnp.stack([nxt[c] for c in Columns.HASH], axis=-2)
    step1 = jf.fsub(state_n, jnp.moveaxis(ark[4:8], 0, -2))
    step1 = rj.apply_inv_mds(step1)
    step1 = rj.apply_sbox(step1)
    diff = jf.fsub(step1, step0)  # (D, 4, 8)
    gate = jf.fmul(mask, h0)
    for i in range(4):
        exprs[12 + i] = diff[..., i, :]
        gates[12 + i] = gate

    # 16-19: hash copy / capacity reset
    ngate = jf.fmul(jf.fsub(one, mask), h0)
    copy01 = jf.fsub(
        jnp.stack([nxt[Columns.HASH[0]], nxt[Columns.HASH[1]]], axis=0),
        jnp.stack([cur[Columns.HASH[0]], cur[Columns.HASH[1]]], axis=0),
    )
    exprs[16], exprs[17] = copy01[0], copy01[1]
    exprs[18], exprs[19] = nxt[Columns.HASH[2]], nxt[Columns.HASH[3]]
    for i in range(4):
        gates[16 + i] = ngate

    # gate + merge with composition coefficients: 2 fmul nodes + tree sum
    e_stack = jnp.stack(exprs, axis=0)  # (20, D, 8)
    g_stack = jnp.stack(gates, axis=0)
    gated = jf.fmul(e_stack, g_stack)
    weighted = jf.fmul(gated, alphas[:, None, :])
    return jf.fsum(weighted, axis=0)

"""Fused transition-constraint Pallas kernel (TPU VMEM-resident).

The flagship prover kernel (SURVEY.md W4): for every LDE row, evaluate all
20 transition constraints and merge them with the composition coefficients —
one VMEM round trip per row block instead of XLA materializing intermediate
(D, 8) arrays in HBM between fusions.

Layout: the kernel works in the *transposed* limb layout of
:mod:`zkvm.field.jax_f128t` — arrays ``(..., 8, N)`` with the 8 f128 limbs on
the 8 VPU sublanes and the domain axis on the 128 lanes, giving full lane
utilization for every uint32 op.  Block shape per grid step: ``(28, 8,
BLOCK)`` current + next rows, ``(8, BLOCK)`` cycle mask, ``(8, 8, BLOCK)``
periodic ARK.  Tensor constants (Rescue MDS matrices, composition
coefficients) enter as kernel inputs; scalar constants are built in-kernel
(pallas forbids captured tensor constants).

Same algebra as :func:`zkvm.air.constraints_jax.merged_transition`
(air/src/constrains.rs:95-216 in the reference); golden-tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from zkvm.field import jax_f128t as jt
from .layout import Columns
from .constraints_golden import LWE_SIZE

# 512 lanes/block fits the kernel's working set in the 16 MB VMEM scoped
# budget on v5e (block=1024 overflows: 22.2 MB scoped > 16 MB limit).
DEFAULT_BLOCK = 512

# selector bit patterns in AIR bit order b0..b4 (b0 = MSB); True -> bit,
# False -> (1 - bit).  Mirrors constraints_jax._SEL_PATTERNS.
_SEL = {
    "add": (0, 1, 0, 0, 0),
    "sadd": (0, 1, 0, 1, 0),
    "add2": (0, 1, 0, 1, 1),
    "mul": (0, 1, 0, 0, 1),
    "smul": (0, 1, 1, 0, 0),
    "push": (1, 0, 0, 0, 0),
    "read": (1, 0, 0, 0, 1),
    "read2": (1, 0, 0, 1, 0),
    "noop": (0, 0, 0, 0, 0),
}


def _selectors(bits, one):
    """bits: list of 5 (8, N) arrays b0..b4 -> dict of selector values."""
    nb = [jt.fsub(jnp.broadcast_to(one, b.shape), b) for b in bits]
    out = {}
    for name, pattern in _SEL.items():
        ops = [bits[i] if pattern[i] else nb[i] for i in range(5)]
        t01 = jt.fmul(ops[0], ops[1])
        t23 = jt.fmul(ops[2], ops[3])
        out[name] = jt.fmul(jt.fmul(t01, t23), ops[4])
    return out


def _sbox(state):
    return jt.fmul(jt.fmul(state, state), state)


def _mds(mat, state):
    """(4, 4, 8) constant matrix x (4, 8, N) state -> (4, 8, N)."""
    prod = jt.fmul(mat[..., None], state[None])  # (4, 4, 8, N)
    return jt.fsum(prod, axis=1)


def merged_transition_t(cur, nxt, mask, ark, mds, inv_mds, alphas, delta):
    """Transposed-layout merged constraint evaluation.

    cur/nxt: (28, 8, N); mask: (8, N); ark: (8, 8, N); mds/inv_mds:
    (4, 4, 8) limbs-last matrices; alphas: (20, 8); delta: host int.
    Returns sum_k alpha_k * gate_k * C_k as (8, N).
    """
    n = cur.shape[-1]
    one = jt.ones(n)

    s = lambda i: cur[Columns.STACK + i]
    sn = lambda i: nxt[Columns.STACK + i]
    bits = [cur[5], cur[4], cur[3], cur[2], cur[1]]  # b0 = MSB
    f = _selectors(bits, one)
    shr, shl = bits[0], bits[1]

    exprs = [None] * 20
    gates = [None] * 20

    # 0: clk' - (clk + 1)
    exprs[0] = jt.fsub(nxt[Columns.CLK], jt.fadd(cur[Columns.CLK], one))
    gates[0] = one
    # 1: depth bookkeeping: d' - d - shr + shl - 4*read2 + 4*add2
    four = jt.constant(4)
    depth = jt.fsub(nxt[Columns.DEPTH], cur[Columns.DEPTH])
    depth = jt.fadd(jt.fsub(depth, shr), shl)
    depth = jt.fsub(depth, jt.fmul(f["read2"], four))
    exprs[1] = jt.fadd(depth, jt.fmul(f["add2"], four))
    gates[1] = one
    # 2: shr * shl
    exprs[2] = jt.fmul(shr, shl)
    gates[2] = one
    # 3: add
    exprs[3] = jt.fsub(sn(0), jt.fadd(s(0), s(1)))
    gates[3] = f["add"]
    # 4: sadd — sum_i sn_i - sum_i ct_i - delta*s0
    sn04 = jt.fsum(nxt[Columns.STACK : Columns.STACK + LWE_SIZE], axis=0)
    s15 = jt.fsum(cur[Columns.STACK + 1 : Columns.STACK + 1 + LWE_SIZE], axis=0)
    exprs[4] = jt.fsub(jt.fsub(sn04, s15), jt.fmul(jt.constant(delta), s(0)))
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
    for k, (name, tgt) in enumerate(
        [("push", sn(1)), ("read", sn(1)), ("read2", sn(LWE_SIZE)), ("noop", sn(0))]
    ):
        exprs[8 + k] = jt.fsub(tgt, s(0))
        gates[8 + k] = f[name]

    # 12-15: hash round (meet in the middle; air/src/constrains.rs:182-209)
    h0 = cur[Columns.HFLAG]
    state = jnp.stack([cur[c] for c in Columns.HASH], axis=0)  # (4, 8, N)
    step0 = _sbox(state)
    step0 = _mds(mds, step0)
    step0 = jt.fadd(step0, ark[0:4])
    opcode = None
    for w, b in zip([16, 8, 4, 2, 1], bits):
        term = jt.fmul(jt.constant(w), b)
        opcode = term if opcode is None else jt.fadd(opcode, term)
    inj0 = jt.fadd(step0[0], opcode)
    inj1 = jt.fadd(step0[1], jt.fmul(sn(0), f["push"]))
    step0 = jnp.concatenate([inj0[None], inj1[None], step0[2:]], axis=0)

    state_n = jnp.stack([nxt[c] for c in Columns.HASH], axis=0)
    step1 = jt.fsub(state_n, ark[4:8])
    step1 = _mds(inv_mds, step1)
    step1 = _sbox(step1)
    diff = jt.fsub(step1, step0)  # (4, 8, N)
    gate = jt.fmul(mask, h0)
    for i in range(4):
        exprs[12 + i] = diff[i]
        gates[12 + i] = gate

    # 16-19: hash copy / capacity reset
    ngate = jt.fmul(jt.fsub(one, mask), h0)
    exprs[16] = jt.fsub(nxt[Columns.HASH[0]], cur[Columns.HASH[0]])
    exprs[17] = jt.fsub(nxt[Columns.HASH[1]], cur[Columns.HASH[1]])
    exprs[18] = nxt[Columns.HASH[2]]
    exprs[19] = nxt[Columns.HASH[3]]
    for i in range(4):
        gates[16 + i] = ngate

    acc = None
    for e, g, al in zip(exprs, gates, alphas):
        term = jt.fmul(jt.fmul(e, g), al[:, None])
        acc = term if acc is None else jt.fadd(acc, term)
    return acc


def composition_body_t(
    cur, nxt, mask, ark, ee, i0, i1, mds, inv_mds, alphas,
    bvals0, bbetas0, bvals1, bbetas1, delta, bcols0, bcols1,
):
    """Full per-class composition value in transposed layout (pure jnp).

    Runs as the Pallas kernel body on TPU and as the XLA fallback on the
    CPU mesh.  Everything the per-row composition needs happens here in one
    VMEM residency: the merged transition value, the domain-constant factor
    ``ee = (x-e1)(x-e2)/(x^T-1)`` (exemptions x zerofier inverse), and the
    two boundary-assertion groups with their *precomputed* denominator
    inverses ``i0 = 1/(x-1)``, ``i1 = 1/(x-x_last)`` — no inversions on the
    hot path (they are proof-independent domain constants).

    cur/nxt: (28, 8, N); mask: (8, N); ark: (8, 8, N); ee/i0/i1: (8, N);
    alphas: (20, 8); bvals*/bbetas*: (k, 8); bcols*: static column tuples.
    Returns (8, N).
    """
    q = merged_transition_t(cur, nxt, mask, ark, mds, inv_mds, alphas, delta)
    q = jt.fmul(q, ee)

    def group(cols, bvals, bbetas):
        acc = None
        for slot, c in enumerate(cols):
            term = jt.fmul(
                jt.fsub(cur[c], bvals[slot][:, None]), bbetas[slot][:, None]
            )
            acc = term if acc is None else jt.fadd(acc, term)
        return acc

    g0 = group(bcols0, bvals0, bbetas0)
    g1 = group(bcols1, bvals1, bbetas1)
    q = jt.fadd(q, jt.fmul(g0, i0))
    return jt.fadd(q, jt.fmul(g1, i1))


def _composition_kernel(delta, bcols0, bcols1, cur_ref, succ_ref, mask_ref,
                        ark_ref, ee_ref, i0_ref, i1_ref, mds_ref, imds_ref,
                        alphas_ref, bv0_ref, bb0_ref, bv1_ref, bb1_ref,
                        out_ref):
    # next-row view assembled in VMEM: this block shifted one lane left,
    # with the first lane of the (wrapping) successor block appended — no
    # full-array roll in HBM
    cur = cur_ref[:]
    nxt = jnp.concatenate([cur[..., 1:], succ_ref[:][..., :1]], axis=-1)
    out_ref[:] = composition_body_t(
        cur, nxt, mask_ref[:], ark_ref[:], ee_ref[:],
        i0_ref[:], i1_ref[:], mds_ref[:], imds_ref[:], alphas_ref[:],
        bv0_ref[:], bb0_ref[:], bv1_ref[:], bb1_ref[:], delta, bcols0, bcols1,
    )


_COMP_PROBED: set = set()
_COMP_BAD = {"disabled": False}


def _composition_pallas_call(cur_t, mask_t, ark_t, ee_t, i0_t, i1_t,
                             alphas, bv0, bb0, bv1, bb1, delta, bcols0,
                             bcols1, block):
    from jax.experimental.pallas import tpu as pltpu
    from zkvm.hash import rescue_jax as rj

    n = cur_t.shape[-1]
    block = min(block, n)
    nblocks = n // block
    kernel = functools.partial(_composition_kernel, delta, bcols0, bcols1)
    small = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((28, 8, block), lambda i: (0, 0, i)),
            pl.BlockSpec((28, 8, block), lambda i: (0, 0, (i + 1) % nblocks)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            pl.BlockSpec((8, 8, block), lambda i: (0, 0, i)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            pl.BlockSpec((8, block), lambda i: (0, i)),
            small((4, 4, 8)),
            small((4, 4, 8)),
            small(alphas.shape),
            small(bv0.shape),
            small(bb0.shape),
            small(bv1.shape),
            small(bb1.shape),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(cur_t, cur_t, mask_t, ark_t, ee_t, i0_t, i1_t, rj.mds_limbs(),
      rj.inv_mds_limbs(), alphas, bv0, bb0, bv1, bb1)


def ensure_composition_probed(delta, bcols0, bcols1, n0, n1, block=DEFAULT_BLOCK):
    """Eagerly compile-check the composition kernel AND compare its output
    to the XLA fallback body on random inputs (async-compile platform; cf.
    ntt_t._probe).  n0/n1 = boundary group sizes.  The probe runs TWO grid
    blocks so the kernel's (i+1)%nblocks successor-block next-row assembly
    is exercised against the fallback's jnp.roll."""
    import os

    env = os.environ.get("ZKVM_PALLAS", "")
    if env == "0" or _COMP_BAD["disabled"]:
        return False
    if env != "1" and jax.default_backend() in ("cpu",):
        return False
    key = (delta, bcols0, bcols1, block)
    if key in _COMP_PROBED:
        return True
    from zkvm.utils import probe_ledger

    if probe_ledger.check("composition_t", str(key)):
        _COMP_PROBED.add(key)
        return True
    try:
        import numpy as np
        from zkvm.hash import rescue_jax as rj

        rng = np.random.default_rng(0xC0DE ^ block)
        r = lambda shape: jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
        )
        n = 2 * block
        args = (
            r((28, 8, n)), r((8, n)), r((8, 8, n)), r((8, n)), r((8, n)),
            r((8, n)), r((20, 8)), r((len(bcols0), 8)), r((len(bcols0), 8)),
            r((len(bcols1), 8)), r((len(bcols1), 8)),
        )
        out = np.asarray(
            _composition_pallas_call(*args, delta, bcols0, bcols1, block)
        )
        oracle = jax.jit(
            lambda cur_t, mask_t, ark_t, ee_t, i0_t, i1_t, alphas,
            bv0, bb0, bv1, bb1: composition_body_t(
                cur_t, jnp.roll(cur_t, -1, axis=-1), mask_t, ark_t, ee_t,
                i0_t, i1_t, rj.mds_limbs(), rj.inv_mds_limbs(), alphas,
                bv0, bb0, bv1, bb1, delta, bcols0, bcols1,
            )
        )
        want = np.asarray(oracle(*args))
        if not np.array_equal(out, want):
            raise RuntimeError("kernel output differs from the XLA oracle")
        _COMP_PROBED.add(key)
        probe_ledger.record("composition_t", str(key))
        return True
    except Exception as exc:
        import warnings

        _COMP_BAD["disabled"] = True
        warnings.warn(
            f"Pallas composition kernel failed ({type(exc).__name__}: {exc});"
            " using the XLA path for this process."
        )
        return False


def composition_t(cur_t, mask_t, ark_t, ee_t, i0_t, i1_t, alphas,
                  bv0, bb0, bv1, bb1, delta, bcols0, bcols1,
                  block=DEFAULT_BLOCK):
    """Dispatch the per-class composition: Pallas kernel when probed OK,
    bit-identical XLA fallback otherwise.  All tensor args transposed;
    the AIR's next-row view (roll by one within the class) is assembled
    inside the kernel from the successor lane block — callers pass only
    the current rows."""
    n = cur_t.shape[-1]
    key = (delta, bcols0, bcols1, min(block, n))
    use = not _COMP_BAD["disabled"] and (
        key in _COMP_PROBED
        or (
            not isinstance(cur_t, jax.core.Tracer)
            and ensure_composition_probed(
                delta, bcols0, bcols1, len(bcols0), len(bcols1), min(block, n)
            )
        )
    )
    if use and n % min(block, n) == 0:
        return _composition_pallas_call(
            cur_t, mask_t, ark_t, ee_t, i0_t, i1_t, alphas,
            bv0, bb0, bv1, bb1, delta, bcols0, bcols1, block,
        )
    from zkvm.hash import rescue_jax as rj

    return composition_body_t(
        cur_t, jnp.roll(cur_t, -1, axis=-1), mask_t, ark_t, ee_t, i0_t,
        i1_t, rj.mds_limbs(), rj.inv_mds_limbs(), alphas,
        bv0, bb0, bv1, bb1, delta, bcols0, bcols1,
    )


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

def _kernel(delta, cur_ref, nxt_ref, mask_ref, ark_ref, mds_ref, imds_ref,
            alphas_ref, out_ref):
    out_ref[:] = merged_transition_t(
        cur_ref[:], nxt_ref[:], mask_ref[:], ark_ref[:],
        mds_ref[:], imds_ref[:], alphas_ref[:], delta,
    )


@functools.partial(jax.jit, static_argnames=("delta", "block", "interpret"))
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
    ark_t: (8, 8, D); alphas: (20, 8).  Returns (8, D).  ``D`` is a power of
    two >= 128, so ``min(block, D)`` always divides D.
    """
    from zkvm.hash import rescue_jax as rj

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
            pl.BlockSpec((4, 4, 8), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, 4, 8), lambda i: (0, 0, 0)),
            pl.BlockSpec((20, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, d), jnp.uint32),
        interpret=interpret,
    )(lde_t, nxt_t, mask_t, ark_t, rj.mds_limbs(), rj.inv_mds_limbs(), alphas)


def merged_transition_pallas_pair(
    cur: jnp.ndarray,
    nxt: jnp.ndarray,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
    alphas: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Kernel entry for explicit (cur, nxt) row views in standard layout.

    Used by the class-decomposed prover (pipeline.py): within a blowup
    residue class the next LDE row is simply the next local index, so the
    caller rolls by 1 and passes both views; this transposes to the kernel
    layout and evaluates.  cur/nxt: (28, N, 8); mask: (N, 8); ark:
    (8, N, 8); returns (N, 8).
    """
    q_t = merged_transition_pallas(
        jnp.moveaxis(cur, -1, -2),
        jnp.moveaxis(nxt, -1, -2),
        jnp.moveaxis(mask, -1, -2),
        jnp.moveaxis(ark, -1, -2),
        alphas,
        delta,
        block=block,
        interpret=interpret,
    )
    return jnp.moveaxis(q_t, -1, -2)


# Cap on the rows materialized in transposed layout at once: the (28, C, 8)
# cur/nxt chunk transposes cost ~4 * 28*C*32 bytes of transient HBM; 2^18
# rows keeps that under ~1 GB so the full (28, 2^23, 8) LDE of a 2^20-row
# trace plus transients stays inside a v5e's 16 GB.
CHUNK_ROWS = 2**18


def merged_transition_via_pallas(
    lde: jnp.ndarray,
    blowup: int,
    mask: jnp.ndarray,
    ark: jnp.ndarray,
    delta: int,
    alphas: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    chunk_rows: int = CHUNK_ROWS,
) -> jnp.ndarray:
    """Drop-in for :func:`constraints_jax.merged_transition` (std layout).

    Processes the domain in row chunks: each chunk is transposed to the
    kernel layout (28, 8, C) on the fly and its next-row view is assembled
    from the chunk tail + the following chunk's head (no global
    ``jnp.roll``, no full-domain transposed copy — the transposed
    working set is O(chunk), which is what makes 2^23-row domains fit).
    """
    d = lde.shape[1]
    chunk = min(chunk_rows, d)
    nchunks = d // chunk

    mask_t_full = jnp.moveaxis(mask, -1, -2)
    ark_t_full = jnp.moveaxis(ark, -1, -2)

    def one_chunk(start):
        cur = jax.lax.dynamic_slice(lde, (0, start, 0), (28, chunk, lde.shape[2]))
        head = jax.lax.dynamic_slice(
            lde, (0, (start + chunk) % d, 0), (28, blowup, lde.shape[2])
        )
        nxt = jnp.concatenate([cur[:, blowup:, :], head], axis=1)
        cur_t = jnp.moveaxis(cur, -1, -2)
        nxt_t = jnp.moveaxis(nxt, -1, -2)
        mask_t = jax.lax.dynamic_slice(
            mask_t_full, (0, start), (8, chunk)
        )
        ark_t = jax.lax.dynamic_slice(ark_t_full, (0, 0, start), (8, 8, chunk))
        q_t = merged_transition_pallas(
            cur_t, nxt_t, mask_t, ark_t, alphas, delta, block=block,
            interpret=interpret,
        )
        return jnp.moveaxis(q_t, -1, -2)

    if nchunks == 1:
        return one_chunk(0)
    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    qs = jax.lax.map(one_chunk, starts)  # (nchunks, chunk, 8)
    return qs.reshape(d, lde.shape[2])

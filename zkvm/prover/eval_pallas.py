"""Batched multi-point polynomial evaluation: (C, 8, T) coeffs x Q points.

Query assembly and OOD-frame openings evaluate every committed column at a
handful of points: rows[q, c] = sum_t coeffs[c, t] * pt_q^t.  In XLA this is
~60 ms per point at T=2^16 (the limb graph spills to HBM between ops); here
one Pallas kernel walks the lane blocks of the transposed coefficients with
a fori_loop over points, accumulating modular partial sums in the output
block — ~Q*C*T field muls at VMEM speed, one HBM pass over the coefficients.

TPU grid steps execute sequentially, so accumulating into the same output
block across grid steps is sound (init at step 0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from zkvm.field import jax_f128t as jt

LANE_BLOCK = 512


def _reduce_lanes(x):
    """Modular sum over the lane axis of (..., 8, L) -> (..., 8, 1)."""
    l = x.shape[-1]
    while l > 1:
        h = l // 2
        x = jt.fadd(x[..., :h], x[..., h:])
        l = h
    return x


def _eval_kernel(q_count, coeffs_ref, lads_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    coeffs = coeffs_ref[:]  # (C, 8, L)

    def body(q, carry):
        lad = lads_ref[pl.ds(q, 1)][0]  # (8, L)
        part = _reduce_lanes(jt.fmul(coeffs, lad[None]))  # (C, 8, 1)
        cur = out_ref[pl.ds(q, 1)][0][..., None]  # (C, 8, 1), limb at -2
        out_ref[pl.ds(q, 1)] = jt.fadd(cur, part)[..., 0][None]
        return carry

    jax.lax.fori_loop(0, q_count, body, 0)


_PROBED: set = set()
_BAD = {"disabled": False}


def _pallas_eval(coeffs_t, lads, lb):
    from jax.experimental.pallas import tpu as pltpu

    c, _, t = coeffs_t.shape
    q = lads.shape[0]
    kernel = functools.partial(_eval_kernel, q)
    return pl.pallas_call(
        kernel,
        grid=(t // lb,),
        in_specs=[
            pl.BlockSpec((c, 8, lb), lambda i: (0, 0, i)),
            pl.BlockSpec((q, 8, lb), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((q, c, 8), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, c, 8), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(coeffs_t, lads)


def _use_pallas() -> bool:
    import os

    env = os.environ.get("ZKVM_EVAL_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() not in ("cpu",)


def ensure_probed(c: int, q: int) -> bool:
    """Eager compile-check (async-compile platform; cf. ntt_t)."""
    if not _use_pallas() or _BAD["disabled"]:
        return False
    key = (c, q)
    if key in _PROBED:
        return True
    try:
        out = _pallas_eval(
            jnp.zeros((c, 8, LANE_BLOCK), jnp.uint32),
            jnp.zeros((q, 8, LANE_BLOCK), jnp.uint32),
            LANE_BLOCK,
        )
        np.asarray(out[0, 0, :1])
        _PROBED.add(key)
        return True
    except Exception as exc:
        import warnings

        _BAD["disabled"] = True
        warnings.warn(
            f"Pallas eval kernel failed ({type(exc).__name__}: {exc}); "
            "using the XLA evaluation for this process."
        )
        return False


def _xla_eval(coeffs_t, lads):
    """Fallback: scan over points (bit-identical tree-sum order)."""

    def qfn(carry, lad):
        return carry, _reduce_lanes(jt.fmul(coeffs_t, lad[None]))[..., 0]

    _, rows = jax.lax.scan(qfn, 0, lads)
    return rows  # (Q, C, 8)


def multi_eval_t(coeffs_t: jnp.ndarray, lads: jnp.ndarray) -> jnp.ndarray:
    """coeffs_t (C, 8, T), lads (Q, 8, T) power ladders -> rows (Q, C, 8).

    rows[q, c] = sum_t coeffs[c, t] * lads[q, t] — the evaluation of column
    polynomial c at point q (when lads[q] is the point's power ladder).
    Kernel and XLA fallback are bit-identical: modular arithmetic is exact,
    so the reduction order cannot change the value.
    """
    c, _, t = coeffs_t.shape
    q = lads.shape[0]
    use = (
        _use_pallas()
        and not _BAD["disabled"]
        and t % LANE_BLOCK == 0
        and ((c, q) in _PROBED
             or (not isinstance(coeffs_t, jax.core.Tracer) and ensure_probed(c, q)))
    )
    if use:
        return _pallas_eval(coeffs_t, lads, LANE_BLOCK)
    return _xla_eval(coeffs_t, lads)

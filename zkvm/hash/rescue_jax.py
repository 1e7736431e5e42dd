"""Batched Rescue-Prime round primitives on TPU (limb arithmetic).

Operates on states shaped ``(..., STATE_WIDTH, 8)`` — trailing axis is the
f128 limb axis of :mod:`zkvm.field.jax_f128`.  Everything is elementwise over
the leading batch axes, so a whole column of sponge states (or a whole LDE
row block in the AIR) is processed in one vectorized call.

Two consumers:

* trace generation (:mod:`zkvm.processor`): full rounds via ``apply_round``
  inside a ``lax.scan`` over program steps (reference semantics:
  crypto/src/rescue.rs:102-118);
* AIR constraint evaluation (:mod:`zkvm.air`): only the *forward* half-round
  pieces (``apply_sbox``/``apply_mds``) plus the *backward* half-round from
  the next row (``apply_inv_mds``/``apply_sbox``), which keeps the prover's
  constraint degree at 3 (air/src/constrains.rs:182-209 meet-in-the-middle).
"""

from __future__ import annotations

import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from . import rescue as golden

STATE_WIDTH = golden.STATE_WIDTH
NUM_ROUNDS = golden.NUM_ROUNDS
CYCLE_LENGTH = golden.CYCLE_LENGTH

# Device-resident constants: (4, 4, 8) MDS limb tensors, (16, 8, 8) ARK.
_MDS = jf.to_limbs([[golden.MDS[i * 4 + j] for j in range(4)] for i in range(4)])
_INV_MDS = jf.to_limbs(
    [[golden.INV_MDS[i * 4 + j] for j in range(4)] for i in range(4)]
)
_ARK = jf.to_limbs(golden.ARK)  # (16, 8, 8)


def mds_limbs() -> jnp.ndarray:
    return jnp.asarray(_MDS)


def inv_mds_limbs() -> jnp.ndarray:
    return jnp.asarray(_INV_MDS)


def ark_limbs() -> jnp.ndarray:
    return jnp.asarray(_ARK)


def apply_sbox(state: jnp.ndarray) -> jnp.ndarray:
    """x -> x^3 elementwise (two fmuls)."""
    return jf.fmul(jf.fmul(state, state), state)


def apply_inv_sbox(state: jnp.ndarray) -> jnp.ndarray:
    """x -> x^(1/3) via the 128-bit INV_ALPHA exponent (scan of square+mul)."""
    return jf.fpow_const(state, f128.INV_ALPHA)


def _apply_matrix(mat, state: jnp.ndarray) -> jnp.ndarray:
    """(4,4) field matrix times (..., 4) field vector, in limb form."""
    mat = jnp.asarray(mat)  # (4, 4, 8)
    prod = jf.fmul(mat, state[..., None, :, :])  # (..., 4, 4, 8)
    # fsum's axis indexes batch axes only (limb axis excluded): -1 = the j axis
    return jf.fsum(prod, axis=-1)


def apply_mds(state: jnp.ndarray) -> jnp.ndarray:
    return _apply_matrix(_MDS, state)


def apply_inv_mds(state: jnp.ndarray) -> jnp.ndarray:
    return _apply_matrix(_INV_MDS, state)


def apply_round(
    state: jnp.ndarray, op_code: jnp.ndarray, op_value: jnp.ndarray, ark: jnp.ndarray
) -> jnp.ndarray:
    """Full Rescue round with mid-round opcode/value injection.

    ``state``: (..., 4, 8); ``op_code``/``op_value``: (..., 8) field limbs;
    ``ark``: (..., 8, 8) round constants for this step (ARK[step % 16]).
    """
    s = apply_sbox(state)
    s = apply_mds(s)
    s = jf.fadd(s, ark[..., 0:4, :])
    s = s.at[..., 0, :].set(jf.fadd(s[..., 0, :], op_code))
    s = s.at[..., 1, :].set(jf.fadd(s[..., 1, :], op_value))
    s = apply_inv_sbox(s)
    s = apply_mds(s)
    s = jf.fadd(s, ark[..., 4:8, :])
    return s

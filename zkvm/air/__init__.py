"""AIR layer: the 20 transition + 22 boundary constraint system.

Mirrors the reference constraint algebra exactly
(air/src/lib.rs, air/src/constrains.rs, air/src/flags.rs — SURVEY.md
C10-C12) while evaluating it the TPU way: all 20 transition constraints for
every LDE row in one vectorized pass (:mod:`zkvm.air.constraints_jax`), with
a per-frame Python golden (:mod:`zkvm.air.constraints_golden`) used for
tests and out-of-domain evaluation.
"""

from .layout import (
    Columns,
    NUM_TRANSITION_CONSTRAINTS,
    NUM_ASSERTIONS,
    TRACE_WIDTH,
    CYCLE_MASK,
    get_assertions,
    PublicInputs,
)

__all__ = [
    "Columns",
    "NUM_TRANSITION_CONSTRAINTS",
    "NUM_ASSERTIONS",
    "TRACE_WIDTH",
    "CYCLE_MASK",
    "get_assertions",
    "PublicInputs",
]

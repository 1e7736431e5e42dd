"""Prover layer: the full STARK pipeline on TPU.

commit(trace) -> constraint composition -> DEEP -> FRI -> proof assembly,
with a host-side Fiat-Shamir transcript (tiny) driving the random
coefficients (SURVEY.md W2-W7).  The heavy arrays (trace LDE, composition,
DEEP polynomial, FRI layers) stay device-resident end to end.
"""

from .options import ProofOptions
from .proof import Proof
from .pipeline import prove

__all__ = ["ProofOptions", "Proof", "prove"]

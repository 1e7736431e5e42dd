"""Verifier layer: full cryptographic verification of zkvm STARK proofs."""

from .verifier import VerificationError, verify, verify_bytes

__all__ = ["VerificationError", "verify", "verify_bytes"]

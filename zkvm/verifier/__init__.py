"""Verifier layer: full cryptographic verification of zkvm STARK proofs."""

from .verifier import VerificationError, verify

__all__ = ["VerificationError", "verify"]

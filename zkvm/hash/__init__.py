"""Hash layer: Rescue-Prime sponge (program hash + chiplet), Blake3-256
(Merkle commitments + Fiat-Shamir transcript), Merkle tree builder."""

from . import rescue

__all__ = ["rescue"]

"""Fiat-Shamir public coin (DefaultRandomCoin<Blake3_256> semantics).

Matches the winterfell random-coin construction the reference relies on
(prover/src/lib.rs:45, SURVEY.md W7):

* seed = hash_elements(seed_elements); counter = 0
* reseed(digest): seed = merge(seed, digest); counter = 0
* next(): counter += 1; merge_with_int(seed, counter)
* draw(): rejection-sample a canonical f128 element from the low 16 bytes
* draw_integers(n, domain, nonce): reseed with hash(nonce_le_bytes), then
  mask the low 8 bytes down to the power-of-two domain; distinct values.
"""

from __future__ import annotations

import struct
from typing import List

from zkvm.field import f128
from zkvm.hash.blake3 import blake3, hash_elements, merge, merge_with_int


class TranscriptError(Exception):
    pass


class RandomCoin:
    def __init__(self, seed_elements: List[int]):
        self.seed = hash_elements(seed_elements)
        self.counter = 0

    def reseed(self, digest: bytes):
        assert len(digest) == 32
        self.seed = merge(self.seed, digest)
        self.counter = 0

    def reseed_with_elements(self, elements: List[int]):
        self.reseed(hash_elements(elements))

    def _next(self) -> bytes:
        self.counter += 1
        return merge_with_int(self.seed, self.counter)

    def draw(self) -> int:
        for _ in range(1000):
            value = int.from_bytes(self._next()[:16], "little")
            if value < f128.P:
                return value
        raise TranscriptError("failed to draw a field element in 1000 tries")

    def draw_elements(self, n: int) -> List[int]:
        return [self.draw() for _ in range(n)]

    def draw_integers(self, n: int, domain_size: int, nonce: int = 0) -> List[int]:
        assert domain_size & (domain_size - 1) == 0
        self.reseed(blake3(struct.pack("<Q", nonce)))
        mask = domain_size - 1
        values: List[int] = []
        seen = set()
        for _ in range(1000):
            v = int.from_bytes(self._next()[:8], "little") & mask
            if v not in seen:
                seen.add(v)
                values.append(v)
            if len(values) == n:
                return values
        raise TranscriptError("failed to draw enough distinct query positions")

    def leading_zeros(self, nonce: int) -> int:
        """Grinding check: leading zero bits of merge_with_int(seed, nonce)."""
        value = int.from_bytes(merge_with_int(self.seed, nonce)[:8], "little")
        return 64 - value.bit_length() if value else 64

"""Batched BLAKE3-256 on TPU: row hashing and Merkle node merging.

The commit phase hashes every row of the LDE matrix (up to 2^23 rows of 28
field elements) and then merges 2^23 -> 1 digests; both are embarrassingly
parallel over rows, so they run as vectorized uint32 VPU ops (SURVEY.md W3).

Representation: a digest is 8 little-endian uint32 words, shape ``(..., 8)``;
a field element contributes 4 words (limbs pairs packed low|high<<16).

Only the single-chunk BLAKE3 path is needed on device: a 28-element row is
448 bytes (7 blocks) and a Merkle merge is 64 bytes (1 block) — both far
below the 1024-byte chunk size.  Golden oracle: :mod:`zkvm.hash.blake3`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zkvm.field import jax_f128 as jf
from .blake3 import IV, MSG_PERMUTATION, CHUNK_START, CHUNK_END, ROOT

_IV = jnp.asarray(IV, dtype=jnp.uint32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _g(v, a, b, c, d, mx, my):
    v[a] = v[a] + v[b] + mx
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + my
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def compress(cv: jnp.ndarray, block: jnp.ndarray, counter: int, block_len: int, flags: int) -> jnp.ndarray:
    """Batched compression: cv (..., 8), block (..., 16) -> (..., 8) new cv.

    Counter/len/flags are static Python ints (all our uses have them fixed).
    """
    batch = cv.shape[:-1]
    consts = jnp.asarray(
        [counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF, block_len, flags],
        dtype=jnp.uint32,
    )
    v = [cv[..., i] for i in range(8)]
    v += [jnp.broadcast_to(_IV[i], batch) for i in range(4)]
    v += [jnp.broadcast_to(consts[i], batch) for i in range(4)]
    m = [block[..., i] for i in range(16)]
    for r in range(7):
        _g(v, 0, 4, 8, 12, m[0], m[1])
        _g(v, 1, 5, 9, 13, m[2], m[3])
        _g(v, 2, 6, 10, 14, m[4], m[5])
        _g(v, 3, 7, 11, 15, m[6], m[7])
        _g(v, 0, 5, 10, 15, m[8], m[9])
        _g(v, 1, 6, 11, 12, m[10], m[11])
        _g(v, 2, 7, 8, 13, m[12], m[13])
        _g(v, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[MSG_PERMUTATION[i]] for i in range(16)]
    return jnp.stack([v[i] ^ v[i + 8] for i in range(8)], axis=-1)


def limbs_to_words(x: jnp.ndarray) -> jnp.ndarray:
    """f128 limbs (..., W, 8) -> LE uint32 words (..., W*4)."""
    lo = x[..., 0::2]
    hi = x[..., 1::2]
    words = lo | (hi << jnp.uint32(16))  # (..., W, 4)
    return words.reshape(words.shape[:-2] + (words.shape[-2] * 4,))


def hash_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """Hash rows of field elements: (..., W, 8) limbs -> (..., 8) digests.

    Matches ``Blake3_256::hash_elements`` (16-byte LE encodings concatenated,
    single chunk).  W*16 bytes must be <= 1024 (W <= 64).
    """
    w = rows.shape[-2]
    nbytes = w * 16
    assert nbytes <= 1024, "single-chunk path only"
    words = limbs_to_words(rows)  # (..., 4W)
    total_words = words.shape[-1]
    n_blocks = max(1, (total_words + 15) // 16)
    pad = n_blocks * 16 - total_words
    if pad:
        words = jnp.pad(words, [(0, 0)] * (words.ndim - 1) + [(0, pad)])
    cv = jnp.broadcast_to(_IV, rows.shape[:-2] + (8,))
    for b in range(n_blocks):
        block = words[..., b * 16 : (b + 1) * 16]
        flags = (CHUNK_START if b == 0 else 0) | (
            (CHUNK_END | ROOT) if b == n_blocks - 1 else 0
        )
        block_len = 64 if b < n_blocks - 1 or nbytes % 64 == 0 else nbytes % 64
        cv = compress(cv, block, 0, block_len, flags)
    return cv


def merge(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Merkle node: hash of the 64-byte concatenation of two digests."""
    block = jnp.concatenate([left, right], axis=-1)
    cv = jnp.broadcast_to(_IV, left.shape)
    return compress(cv, block, 0, 64, CHUNK_START | CHUNK_END | ROOT)


def merkle_levels(leaves: jnp.ndarray) -> list:
    """Build all levels of a Merkle tree from (N, 8) leaf digests.

    Returns [leaves, level1, ..., root(1, 8)]; each level is a device array.
    N must be a power of two.
    """
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = merge(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


def digests_to_bytes(digests) -> list:
    """(N, 8) uint32 words -> list of 32-byte digests (host)."""
    import numpy as np

    arr = np.asarray(digests, dtype="<u4")
    return [arr[i].tobytes() for i in range(arr.shape[0])]

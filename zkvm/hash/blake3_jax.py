"""Batched BLAKE3-256 on TPU: row hashing and Merkle node merging.

The commit phase hashes every row of the LDE matrix (up to 2^23 rows of 28
field elements) and then merges 2^23 -> 1 digests; both are embarrassingly
parallel over rows, so they run as vectorized uint32 VPU ops (SURVEY.md W3).

The compression function uses the standard BLAKE3 SIMD formulation — the
16-word state as a (4, 4) grid, column/diagonal G steps as whole-row vector
ops with lane rolls — under a ``lax.scan`` over the 7 rounds (and an outer
scan over message blocks), so the whole kernel compiles as one small graph
regardless of row width.

Representation: a digest is 8 little-endian uint32 words, shape ``(..., 8)``;
a field element contributes 4 words (limb pairs packed low | high << 16).

Only the single-chunk BLAKE3 path is needed on device: a 28-element row is
448 bytes (7 blocks) and a Merkle merge is 64 bytes (1 block) — both far
below the 1024-byte chunk size.  Golden oracle: :mod:`zkvm.hash.blake3`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from zkvm.field import jax_f128 as jf
from .blake3 import IV, MSG_PERMUTATION, CHUNK_START, CHUNK_END, ROOT

_IV = np.asarray(IV, dtype=np.uint32)
_PERM = np.asarray(MSG_PERMUTATION, dtype=np.int32)

# message word indices feeding the column / diagonal G steps
_MX_COL = np.asarray([0, 2, 4, 6], dtype=np.int32)
_MY_COL = np.asarray([1, 3, 5, 7], dtype=np.int32)
_MX_DIAG = np.asarray([8, 10, 12, 14], dtype=np.int32)
_MY_DIAG = np.asarray([9, 11, 13, 15], dtype=np.int32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _g(a, b, c, d, mx, my):
    a = a + b + mx
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + my
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _compress(cv, block, counter_lo, counter_hi, block_len, flags):
    """Batched compression.

    cv: (..., 8); block: (..., 16); scalar params are uint32 arrays
    broadcastable to (...,).  Returns the full (..., 16) output state
    (digest = out[..., :8] ^ out[..., 8:] handled by callers).
    """
    batch = cv.shape[:-1]
    bc = lambda v: jnp.broadcast_to(v, batch)

    a = cv[..., 0:4]
    b = cv[..., 4:8]
    c = jnp.broadcast_to(jnp.asarray(_IV[0:4]), batch + (4,))
    d = jnp.stack(
        [bc(counter_lo), bc(counter_hi), bc(block_len), bc(flags)], axis=-1
    )

    def round_fn(carry, _):
        a, b, c, d, m = carry
        # column step
        a, b, c, d = _g(
            a, b, c, d, m[..., _MX_COL], m[..., _MY_COL]
        )
        # diagonalize: rotate lanes left by 1/2/3
        b1 = jnp.roll(b, -1, axis=-1)
        c1 = jnp.roll(c, -2, axis=-1)
        d1 = jnp.roll(d, -3, axis=-1)
        a, b1, c1, d1 = _g(
            a, b1, c1, d1, m[..., _MX_DIAG], m[..., _MY_DIAG]
        )
        b = jnp.roll(b1, 1, axis=-1)
        c = jnp.roll(c1, 2, axis=-1)
        d = jnp.roll(d1, 3, axis=-1)
        m = m[..., jnp.asarray(_PERM)]
        return (a, b, c, d, m), None

    (a, b, c, d, _), _ = jax.lax.scan(round_fn, (a, b, c, d, block), None, length=7)
    lo = jnp.concatenate([a, b], axis=-1)
    hi = jnp.concatenate([c, d], axis=-1)
    return jnp.concatenate([lo ^ hi, hi ^ cv], axis=-1)


def limbs_to_words(x: jnp.ndarray) -> jnp.ndarray:
    """f128 limbs (..., W, 8) -> LE uint32 words (..., W*4)."""
    lo = x[..., 0::2]
    hi = x[..., 1::2]
    words = lo | (hi << jnp.uint32(16))  # (..., W, 4)
    return words.reshape(words.shape[:-2] + (words.shape[-2] * 4,))


@jax.jit
def hash_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """Hash rows of field elements: (..., W, 8) limbs -> (..., 8) digests.

    Matches ``Blake3_256::hash_elements`` (16-byte LE encodings concatenated,
    single chunk).  W*16 bytes must be <= 1024 (W <= 64).
    """
    w = rows.shape[-2]
    nbytes = w * 16
    assert nbytes <= 1024, "single-chunk path only"
    words = limbs_to_words(rows)  # (..., 4W)
    batch = words.shape[:-1]
    total_words = words.shape[-1]
    n_blocks = max(1, (total_words + 15) // 16)
    pad = n_blocks * 16 - total_words
    if pad:
        words = jnp.pad(words, [(0, 0)] * (words.ndim - 1) + [(0, pad)])
    blocks = jnp.moveaxis(
        words.reshape(batch + (n_blocks, 16)), -2, 0
    )  # (n_blocks, ..., 16)

    flags = np.zeros(n_blocks, dtype=np.uint32)
    flags[0] |= CHUNK_START
    flags[-1] |= CHUNK_END | ROOT
    lens = np.full(n_blocks, 64, dtype=np.uint32)
    if nbytes % 64:
        lens[-1] = nbytes % 64

    cv0 = jnp.broadcast_to(jnp.asarray(_IV), batch + (8,))

    def block_fn(cv, xs):
        block, flag, blen = xs
        out = _compress(cv, block, jnp.uint32(0), jnp.uint32(0), blen, flag)
        return out[..., :8], None

    cv, _ = jax.lax.scan(
        block_fn, cv0, (blocks, jnp.asarray(flags), jnp.asarray(lens))
    )
    return cv


@jax.jit
def merge(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Merkle node: hash of the 64-byte concatenation of two digests."""
    block = jnp.concatenate([left, right], axis=-1)
    cv = jnp.broadcast_to(jnp.asarray(_IV), left.shape)
    out = _compress(
        cv,
        block,
        jnp.uint32(0),
        jnp.uint32(0),
        jnp.uint32(64),
        jnp.uint32(CHUNK_START | CHUNK_END | ROOT),
    )
    return out[..., :8]


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


@jax.jit
def merkle_flat(leaves: jnp.ndarray) -> jnp.ndarray:
    """Full Merkle tree as ONE dispatch: (N, 8) leaves -> (2N, 8) heap array.

    Heap layout (winter-crypto style): nodes[1] = root, children of i at
    2i/2i+1, leaves at nodes[N:2N]; nodes[0] unused.  Building all levels
    inside one jit keeps the commit phase at a single device round trip
    instead of log2(N) per-level transfers.
    """
    n = leaves.shape[0]
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = merge(cur[0::2], cur[1::2])
        levels.append(cur)
    # levels[-1] is the root (size 1); heap = [zero, root, ..., leaves]
    return jnp.concatenate([jnp.zeros((1, 8), jnp.uint32)] + levels[::-1], axis=0)


def merkle_forest_flat(leaves: jnp.ndarray, mesh, axis: str = "row") -> jnp.ndarray:
    """Sharded Merkle build: per-device subtree heaps, zero collectives.

    leaves: (N, 8) row-sharded.  Each device builds the full heap of its
    local subtree (the global tree's subtree rooted at depth log2(P), since
    shard boundaries align with subtrees).  Output is (2N, 8) in *forest
    layout*: rows [q*2L, (q+1)*2L) hold device q's local heap (local root at
    q*2L + 1, local leaves at [q*2L + L, (q+1)*2L)).  The log2(P) top levels
    are combined on host from the P local roots
    (:class:`zkvm.hash.merkle.ShardedMerkleTree`) — SURVEY.md section 2.3 P4.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        merkle_flat,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,
    )(leaves)


def digests_to_bytes(digests) -> list:
    """(N, 8) uint32 words -> list of 32-byte digests (host)."""
    arr = np.asarray(digests, dtype="<u4")
    return [arr[i].tobytes() for i in range(arr.shape[0])]

"""Batched BLAKE3 + Merkle tests vs the golden implementation."""

import numpy as np
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash import blake3 as b3
from zkvm.hash import blake3_jax as b3j
from zkvm.hash.merkle import MerkleTree


def test_jax_hash_rows_matches_hash_elements(rng):
    for width in [1, 2, 4, 8, 27, 28]:
        rows = [[rng.randrange(f128.P) for _ in range(width)] for _ in range(5)]
        got = b3j.digests_to_bytes(b3j.hash_rows(jnp.asarray(jf.to_limbs(rows))))
        for r in range(5):
            assert got[r] == b3.hash_elements(rows[r]), f"width={width} row={r}"


def test_jax_merge_matches_golden(rng):
    rows = [[rng.randrange(f128.P)] for _ in range(4)]
    digs = b3j.hash_rows(jnp.asarray(jf.to_limbs(rows)))
    merged = b3j.merge(digs[0::2], digs[1::2])
    host = b3j.digests_to_bytes(digs)
    got = b3j.digests_to_bytes(merged)
    assert got[0] == b3.merge(host[0], host[1])
    assert got[1] == b3.merge(host[2], host[3])


def test_merkle_tree_device_vs_host(rng):
    rows = [[rng.randrange(f128.P) for _ in range(3)] for _ in range(16)]
    digs = b3j.hash_rows(jnp.asarray(jf.to_limbs(rows)))
    t_dev = MerkleTree.from_device_levels(b3j.merkle_levels(digs))
    t_host = MerkleTree.from_leaves(b3j.digests_to_bytes(digs))
    assert t_dev.root == t_host.root
    assert t_dev.depth == 4


def test_merkle_open_verify(rng):
    leaves = [b3.blake3(bytes([i])) for i in range(32)]
    tree = MerkleTree.from_leaves(leaves)
    for idx in [0, 1, 13, 31]:
        path = tree.open(idx)
        assert MerkleTree.verify(tree.root, idx, leaves[idx], path)
        assert not MerkleTree.verify(tree.root, idx ^ 1, leaves[idx], path)
        assert not MerkleTree.verify(tree.root, idx, b3.blake3(b"x"), path)

"""Merkle tree over 32-byte BLAKE3 digests (commitments + auth paths).

Tree construction is batched on device (:func:`zkvm.hash.blake3_jax.merkle_levels`);
this module keeps the host-side levels for opening query paths and provides
the verifier-side path check.  Matches winter-crypto MerkleTree semantics
(SURVEY.md W3): node = blake3(left || right), leaves at depth log2(N).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .blake3 import merge


class DeviceMerkleTree:
    """Merkle tree kept on device as a (2N, 8) uint32 heap (blake3_jax.merkle_flat).

    Only the root (32 bytes, needed by the Fiat-Shamir transcript) is
    transferred eagerly; query authentication paths are gathered on device
    and fetched in ONE transfer per tree via :meth:`open_many` — the full
    tree never crosses the host boundary.  Node layout: nodes[1] = root,
    children of i at 2i / 2i+1, leaf j at nodes[N + j].
    """

    def __init__(self, nodes):
        self.nodes = nodes  # device (2N, 8) uint32
        self.n = int(nodes.shape[0]) // 2
        self._root = None

    @property
    def root(self) -> bytes:
        if self._root is None:
            self._root = np.asarray(self.nodes[1], dtype="<u4").tobytes()
        return self._root

    @property
    def depth(self) -> int:
        return self.n.bit_length() - 1

    def _path_indices(self, position: int) -> List[int]:
        idx = []
        i = position + self.n
        while i > 1:
            idx.append(i ^ 1)
            i >>= 1
        return idx

    def open_many(self, positions: Sequence[int]) -> List[List[bytes]]:
        """Authentication paths (leaf->root sibling digests) for positions."""
        import jax.numpy as jnp

        flat = [i for p in positions for i in self._path_indices(p)]
        arr = np.asarray(
            jnp.take(self.nodes, jnp.asarray(flat, dtype=jnp.int32), axis=0),
            dtype="<u4",
        )
        paths, k = [], 0
        for p in positions:
            d = self.depth
            paths.append([arr[k + t].tobytes() for t in range(d)])
            k += d
        return paths

    def open(self, position: int) -> List[bytes]:
        return self.open_many([position])[0]


class ShardedMerkleTree:
    """Merkle tree built as P per-device subtrees + a host-combined top.

    ``forest_nodes``: (2N, 8) device array in the forest layout of
    :func:`zkvm.hash.blake3_jax.merkle_forest_flat`; ``p``: subtree count
    (mesh size).  Roots and authentication paths are bit-identical to the
    single-device :class:`DeviceMerkleTree` over the same leaves — the
    sharding only changes where nodes are stored, not the tree.  The host
    combines exactly P-1 node hashes (microseconds); everything else stays
    on device until queried.
    """

    def __init__(self, forest_nodes, p: int):
        self.nodes = forest_nodes
        self.p = p
        self.n = int(forest_nodes.shape[0]) // 2  # total leaves
        self.local_n = self.n // p
        # host top: levels over the P local roots
        roots = np.asarray(
            forest_nodes[
                np.arange(p, dtype=np.int64) * (2 * self.local_n) + 1
            ],
            dtype="<u4",
        )
        leaves = [roots[i].tobytes() for i in range(p)]
        self.top = MerkleTree.from_leaves(leaves)

    @property
    def root(self) -> bytes:
        return self.top.root

    @property
    def depth(self) -> int:
        return self.n.bit_length() - 1

    def _local_path_indices(self, position: int) -> List[int]:
        q, r = divmod(position, self.local_n)
        base = q * 2 * self.local_n
        idx = []
        i = r + self.local_n
        while i > 1:
            idx.append(base + (i ^ 1))
            i >>= 1
        return idx

    def open_many(self, positions: Sequence[int]) -> List[List[bytes]]:
        """leaf->root sibling paths (local subtree part + host top part)."""
        import jax.numpy as jnp

        flat = [i for p_ in positions for i in self._local_path_indices(p_)]
        d_local = self.local_n.bit_length() - 1
        arr = np.asarray(
            jnp.take(self.nodes, jnp.asarray(flat, dtype=jnp.int32), axis=0),
            dtype="<u4",
        )
        paths, k = [], 0
        for pos in positions:
            local = [arr[k + t].tobytes() for t in range(d_local)]
            k += d_local
            paths.append(local + self.top.open(pos // self.local_n))
        return paths

    def open(self, position: int) -> List[bytes]:
        return self.open_many([position])[0]


class MerkleTree:
    def __init__(self, levels: List[List[bytes]]):
        self.levels = levels  # levels[0] = leaves ... levels[-1] = [root]

    @staticmethod
    def from_leaves(leaves: Sequence[bytes]) -> "MerkleTree":
        n = len(leaves)
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        levels = [list(leaves)]
        cur = list(leaves)
        while len(cur) > 1:
            cur = [merge(cur[i], cur[i + 1]) for i in range(0, len(cur), 2)]
            levels.append(cur)
        return MerkleTree(levels)

    @staticmethod
    def from_device_levels(device_levels) -> "MerkleTree":
        """Adopt levels computed by blake3_jax.merkle_levels."""
        levels = []
        for lv in device_levels:
            arr = np.asarray(lv, dtype="<u4")
            levels.append([arr[i].tobytes() for i in range(arr.shape[0])])
        return MerkleTree(levels)

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    @property
    def depth(self) -> int:
        return len(self.levels) - 1

    def open(self, index: int) -> List[bytes]:
        """Sibling digests from leaf to root (leaf itself not included)."""
        path = []
        for level in self.levels[:-1]:
            path.append(level[index ^ 1])
            index >>= 1
        return path

    @staticmethod
    def verify(root: bytes, index: int, leaf: bytes, path: List[bytes]) -> bool:
        node = leaf
        for sibling in path:
            if index & 1:
                node = merge(sibling, node)
            else:
                node = merge(node, sibling)
            index >>= 1
        return node == root

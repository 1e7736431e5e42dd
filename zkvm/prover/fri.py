"""FRI prover: degree-8 folds with per-layer Merkle commitments (W6).

Evaluations live on cosets ``offset * <w_D>`` in natural order.  A fold
group for position j is the 8 points {x : x^8 = y_j} = {x_j * w_8^t}, i.e.
evaluation indices {j + t*D/8}; each layer's Merkle leaf j hashes its 8
group values (winter-fri layout), so one query opens a whole group.

Folding: with local interpolant g of the group (b = iNTT_8 of the group
values), the next layer's value is g(beta) = sum_k b_k (beta/x_j)^k,
evaluated by Horner with a device power ladder — fully batched over j.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash import blake3_jax as b3j
from zkvm.hash.merkle import DeviceMerkleTree
from zkvm.ntt import ntt_jax as nj

FOLD = 8

# lane-chunk bound for the transposed layer commit (test-patchable)
_COMMIT_CHUNK_LANES = 1 << 17


class ProverError(Exception):
    """Internal prover invariant violation (not a verification failure)."""


@jax.jit
def _fold_core(evals: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    d = evals.shape[0]
    v = evals.reshape(FOLD, d // FOLD, jf.NLIMBS)  # v[t, j]
    b = nj.intt(jnp.moveaxis(v, 0, 1))  # (D/8, 8, NLIMBS), coeff axis -2
    acc = b[:, FOLD - 1, :]
    for k in range(FOLD - 2, -1, -1):
        acc = jf.fadd(jf.fmul(acc, q), b[:, k, :])
    return acc


def fold_layer(evals: jnp.ndarray, beta: int, offset: int) -> jnp.ndarray:
    """(D, 8) evaluations on offset*<w_D>  ->  (D/8, 8) on offset^8*<w_{D/8}>."""
    d = evals.shape[0]
    w_d = f128.get_root_of_unity(d)
    scale = f128.fmul(beta, f128.finv(offset))
    q = nj.ladder_host(f128.finv(w_d), d // FOLD, scale)  # (D/8, 8)
    return _fold_core(evals, q)


@jax.jit
def _commit_core(evals: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    d = evals.shape[0]
    groups = jnp.moveaxis(evals.reshape(FOLD, d // FOLD, jf.NLIMBS), 0, 1)
    nodes = b3j.merkle_flat(b3j.hash_rows(groups))
    return nodes, groups


def commit_layer(evals: jnp.ndarray) -> Tuple[DeviceMerkleTree, jnp.ndarray]:
    """Merkle tree over fold-group leaves; returns (tree, groups (D/8, 8, 8)).

    One fused dispatch (group hash + full tree) and one 32-byte root
    transfer — the tree stays on device until query paths are opened.
    """
    nodes, groups = _commit_core(evals)
    return DeviceMerkleTree(nodes), groups


@jax.jit
def _commit_core_t(evals_t: jnp.ndarray):
    """Transposed layer commit: evals_t (8, D) -> (merkle nodes, groups_t).

    groups_t is (FOLD, 8, D/FOLD): group j's value t at [t, :, j] (the
    evaluation at index t*(D/8)+j); leaf j hashes its 8 group values.

    Leaf hashing is chunked over lanes (lax.map) once the layer exceeds
    2^17 groups: the BLAKE3 SoA working set is ~16 u32 words per lane and
    the D=2^23 first layer of a 2^20-row trace exhausted HBM with every
    transient live at once (measured r5).  Lanes are independent, so
    chunking is value-exact; layers at bench sizes (<= 2^16 groups) keep
    the single-dispatch graph."""
    from zkvm.hash import blake3_t as b3t

    d = evals_t.shape[-1]
    l = d // FOLD
    v = jnp.swapaxes(evals_t.reshape(8, FOLD, l), 0, 1)  # (FOLD, 8, L)
    max_lanes = _COMMIT_CHUNK_LANES
    if l <= max_lanes:
        digs = b3t.hash_rows_t(v)  # (8, L)
    else:
        chunks = l // max_lanes
        vc = jnp.moveaxis(v.reshape(FOLD, 8, chunks, l // chunks), 2, 0)
        digs_c = jax.lax.map(b3t.hash_rows_t, vc)  # (chunks, 8, L/chunks)
        digs = jnp.moveaxis(digs_c, 0, 1).reshape(8, l)
    nodes = b3j.merkle_flat(jnp.swapaxes(digs, 0, 1))
    return nodes, v


@jax.jit
def _fold_core_t(v: jnp.ndarray, q_t: jnp.ndarray) -> jnp.ndarray:
    """Fold transposed groups: iNTT_8 along the group axis + Horner at beta
    (q_t = (beta/x_j) ladder, (8, D/8)).  Returns (8, D/8) evaluations —
    bit-identical to the standard path (exact arithmetic)."""
    from zkvm.field import jax_f128t as jt
    from zkvm.ntt import ntt_t as nt

    b = nt._axis_ntt(v, FOLD, True)  # (FOLD, 8, D/8), coeff axis -3
    b = jt.fmul(b, jt.const_col(f128.finv(FOLD)))
    acc = b[FOLD - 1]
    for k in range(FOLD - 2, -1, -1):
        acc = jt.fadd(jt.fmul(acc, q_t), b[k])
    return acc


def fri_prove_t(coin, evals_t: jnp.ndarray, offset: int, options) -> "FriProverResult":
    """Transposed-layout FRI prover; same transcript/outputs as
    :func:`fri_prove` (groups converted to the standard layout for the
    opening phase)."""
    import numpy as np

    from zkvm.field import jax_f128t as jt
    from zkvm.ntt import ntt_t as nt

    res = FriProverResult()
    size = evals_t.shape[-1]
    while size > options.max_remainder_size:
        nodes, v = _commit_core_t(evals_t)
        tree = DeviceMerkleTree(nodes)
        res.trees.append(tree)
        res.groups.append(v)  # (FOLD, 8, D/8) transposed; gather_groups
        res.transposed = True  # converts the <=num_queries opened groups
        coin.reseed(tree.root)
        beta = coin.draw()
        res.betas.append(beta)
        w_d = f128.get_root_of_unity(size)
        scale = f128.fmul(beta, f128.finv(offset))
        q_t = nt.ladder_t_host(f128.finv(w_d), size // FOLD, scale)
        evals_t = _fold_core_t(v, q_t)
        offset = pow(offset, FOLD, f128.P)
        size //= FOLD
    coeffs = nt.intt_t(evals_t)
    coeffs = jt.fmul(coeffs, nt.ladder_t_host(f128.finv(offset), size))
    host = jt.from_t(np.asarray(coeffs))
    max_len = size // options.blowup
    res.remainder = [int(v) for v in host[:max_len]]
    if any(int(v) != 0 for v in host[max_len:]):
        raise ProverError("FRI remainder degree overflow")
    coin.reseed_with_elements(res.remainder)
    return res


class FriProverResult:
    def __init__(self):
        self.trees: List[DeviceMerkleTree] = []
        # std path: (D_t/8, 8, 8) per layer; t path: (FOLD, 8, D_t/8)
        self.groups: List[jnp.ndarray] = []
        self.transposed = False
        self.betas: List[int] = []
        self.remainder: List[int] = []


def gather_groups(res: "FriProverResult", layer_idx: int, group_idx):
    """Opened fold groups as a host (K, FOLD, NLIMBS) std-limb array.

    Gathers only the <= num_queries requested groups on device; the t path
    stores layers in the transposed layout and converts just the gathered
    slice (a full-layer std copy is 256 MB at D=2^23 — measured OOM, r5).
    """
    import numpy as np

    g = res.groups[layer_idx]
    idx = jnp.asarray(group_idx)
    if res.transposed:
        return np.transpose(np.asarray(g[:, :, idx]), (2, 0, 1))
    return np.asarray(g[idx])


def fri_prove(coin, evals: jnp.ndarray, offset: int, options) -> FriProverResult:
    """Commit/fold until the remainder bound, driving the transcript."""
    import numpy as np

    res = FriProverResult()
    size = evals.shape[0]
    while size > options.max_remainder_size:
        tree, groups = commit_layer(evals)
        res.trees.append(tree)
        res.groups.append(groups)
        coin.reseed(tree.root)
        beta = coin.draw()
        res.betas.append(beta)
        evals = fold_layer(evals, beta, offset)
        offset = pow(offset, FOLD, f128.P)
        size //= FOLD
    # remainder: interpolate the final evaluations, un-scale the coset
    coeffs = nj.intt(evals)
    inv_off_ladder = nj.ladder_host(f128.finv(offset), size)
    coeffs = jf.fmul(coeffs, inv_off_ladder)
    host = jf.from_limbs(np.asarray(coeffs))
    max_len = size // options.blowup
    res.remainder = [int(v) for v in host[:max_len]]
    # high coefficients must vanish for an honest low-degree witness
    if any(int(v) != 0 for v in host[max_len:]):
        raise ProverError("FRI remainder degree overflow")
    coin.reseed_with_elements(res.remainder)
    return res


def fold_position(position: int, domain_size: int) -> int:
    """Query position in the next (folded) layer."""
    return position % (domain_size // FOLD)


def fold_group_values(group: List[int], position: int, domain_size: int, beta: int, offset: int) -> int:
    """Host-side fold of one opened group — the verifier's counterpart."""
    j = position % (domain_size // FOLD)
    w_d = f128.get_root_of_unity(domain_size)
    x_j = f128.fmul(offset, pow(w_d, j, f128.P))
    w8 = f128.get_root_of_unity(FOLD)
    # b = iNTT_8 of group values
    inv8 = f128.finv(FOLD)
    b = []
    for k in range(FOLD):
        acc = 0
        for t in range(FOLD):
            acc = f128.fadd(acc, f128.fmul(group[t], pow(w8, (-t * k) % FOLD, f128.P)))
        b.append(f128.fmul(acc, inv8))
    q = f128.fmul(beta, f128.finv(x_j))
    acc = b[FOLD - 1]
    for k in range(FOLD - 2, -1, -1):
        acc = f128.fadd(f128.fmul(acc, q), b[k])
    return acc

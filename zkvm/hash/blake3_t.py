"""Structure-of-arrays BLAKE3-256 row hashing for the transposed pipeline.

:mod:`zkvm.hash.blake3_jax` keeps the hash state as ``(..., 4)`` vectors —
4 of 128 TPU lanes do work.  Here the 16 state words are 16 *separate*
``(1, L)`` lane vectors (structure of arrays): every G step is a handful of
full-lane uint32 ops, the diagonalization is pure variable renaming, and the
message permutation is list renaming — no data movement at all.  The whole
row hash runs as ONE Pallas kernel over lane blocks of the transposed
``(C, 8, N)`` trace/LDE representation, so commitment hashing needs no
layout change of the NTT output.

Matches ``Blake3_256::hash_elements`` (16-byte LE limb encodings, single
chunk; SURVEY.md W3); golden-tested against :mod:`zkvm.hash.blake3_jax`
(which is golden-tested against the spec implementation).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .blake3 import IV, MSG_PERMUTATION, CHUNK_START, CHUNK_END, ROOT


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


def _compress_soa(cv, m, block_len, flags):
    """cv: list of 8 (1, L) words; m: list of 16 (1, L) words (mutated copy);
    returns the 8 output words (lo ^ hi)."""
    shape = cv[0].shape
    v = list(cv) + [
        jnp.full(shape, IV[0], jnp.uint32),
        jnp.full(shape, IV[1], jnp.uint32),
        jnp.full(shape, IV[2], jnp.uint32),
        jnp.full(shape, IV[3], jnp.uint32),
        jnp.full(shape, 0, jnp.uint32),  # counter lo
        jnp.full(shape, 0, jnp.uint32),  # counter hi
        jnp.full(shape, block_len, jnp.uint32),
        jnp.full(shape, flags, jnp.uint32),
    ]
    m = list(m)
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
            m = [m[i] for i in MSG_PERMUTATION]
    return [v[i] ^ v[i + 8] for i in range(8)]


def _hash_words_soa(words):
    """words: list of 4W (1, L) uint32 lane vectors (one element row each
    lane, 16-byte LE encodings) -> list of 8 digest words (1, L)."""
    total = len(words)
    nbytes = total * 4
    n_blocks = max(1, (total + 15) // 16)
    zero = jnp.zeros_like(words[0])
    padded = list(words) + [zero] * (n_blocks * 16 - total)
    cv = [jnp.full(words[0].shape, IV[i], jnp.uint32) for i in range(8)]
    for bi in range(n_blocks):
        flags = (CHUNK_START if bi == 0 else 0) | (
            (CHUNK_END | ROOT) if bi == n_blocks - 1 else 0
        )
        blen = 64
        if bi == n_blocks - 1 and nbytes % 64:
            blen = nbytes % 64
        cv = _compress_soa(cv, padded[bi * 16 : (bi + 1) * 16], blen, flags)
    return cv


def _rows_kernel(x_ref, out_ref):
    x = x_ref[:]  # (C, 8, L)
    c = x.shape[0]
    words = []
    for ci in range(c):
        for j in range(4):
            words.append(x[ci, 2 * j : 2 * j + 1, :] | (x[ci, 2 * j + 1 : 2 * j + 2, :] << jnp.uint32(16)))
    dig = _hash_words_soa(words)
    out_ref[:] = jnp.concatenate(dig, axis=0)  # (8, L)


_PROBED: set = set()
_BAD = {"disabled": False}


def _use_pallas() -> bool:
    env = os.environ.get("ZKVM_B3_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() not in ("cpu",)


def _pallas_rows(x: jnp.ndarray, lb: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, _, n = x.shape
    return pl.pallas_call(
        _rows_kernel,
        grid=(n // lb,),
        in_specs=[pl.BlockSpec((c, 8, lb), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((8, lb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x)


LANE_BLOCK = 512


def ensure_probed(c: int) -> bool:
    """Eagerly compile-check the row-hash kernel for C-element rows AND
    check its digests against the XLA row hash on random rows (the
    tunneled platform compiles asynchronously and a miscompile must latch
    the fallback; see ntt_t._probe)."""
    if not _use_pallas() or _BAD["disabled"]:
        return False
    if c in _PROBED:
        return True
    from zkvm.utils import probe_ledger

    if probe_ledger.check("blake3_t", str(c)):
        _PROBED.add(c)
        return True
    try:
        from . import blake3_jax as b3j

        rng = np.random.default_rng(0xB1A3 ^ c)
        x = jnp.asarray(
            rng.integers(0, 1 << 16, size=(c, 8, LANE_BLOCK), dtype=np.uint32)
        )
        out = np.asarray(_pallas_rows(x, LANE_BLOCK))
        oracle = jax.jit(
            lambda v: jnp.transpose(b3j.hash_rows(jnp.transpose(v, (2, 0, 1))), (1, 0))
        )
        want = np.asarray(oracle(x))
        if not np.array_equal(out, want):
            raise RuntimeError("kernel digests differ from the XLA oracle")
        _PROBED.add(c)
        probe_ledger.record("blake3_t", str(c))
        return True
    except Exception as exc:
        import warnings

        _BAD["disabled"] = True
        warnings.warn(
            f"Pallas BLAKE3 kernel failed ({type(exc).__name__}: {exc}); "
            "using the XLA row hash for this process."
        )
        return False


def hash_rows_t(x: jnp.ndarray) -> jnp.ndarray:
    """Transposed rows (C, 8, N) -> (8, N) digest words (transposed).

    Equal to blake3_jax.hash_rows of the (N, C, 8) view, transposed."""
    c, _, n = x.shape
    use = (
        _use_pallas()
        and not _BAD["disabled"]
        and n % LANE_BLOCK == 0
        and (c in _PROBED or (not isinstance(x, jax.core.Tracer) and ensure_probed(c)))
    )
    if use:
        return _pallas_rows(x, LANE_BLOCK)
    from . import blake3_jax as b3j

    rows = jnp.transpose(x, (2, 0, 1))  # (N, C, 8)
    return jnp.transpose(b3j.hash_rows(rows), (1, 0))  # (8, N)

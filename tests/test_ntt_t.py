"""Transposed-layout four-step NTT + SoA BLAKE3: golden equality tests.

The transposed stack (zkvm.ntt.ntt_t, zkvm.hash.blake3_t) must be
bit-identical to the standard-layout implementations for every entry point,
including the flat recursion used for domains beyond the axis limit.  On the
CPU mesh the Pallas kernels fall back to the same math as plain XLA graphs,
so these tests pin the algebra; the kernels themselves are probed/validated
on the real TPU (ensure_probed + scripts/microbench.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.ntt import ntt_jax as nj
from zkvm.ntt import ntt_t as nt


def _rand_cols(rng, c, n):
    vals = [[rng.randrange(f128.P) for _ in range(n)] for _ in range(c)]
    std = jnp.asarray(jf.to_limbs(vals))  # (c, n, 8)
    return std, jnp.swapaxes(std, -1, -2)  # transposed (c, 8, n)


@pytest.mark.parametrize("n", [4, 16, 64, 512])
def test_ntt_t_matches_standard(rng, n):
    std, t = _rand_cols(rng, 3, n)
    np.testing.assert_array_equal(
        np.asarray(nj.ntt(std)), np.asarray(nt.from_t(nt.ntt_t(t)))
    )
    np.testing.assert_array_equal(
        np.asarray(nj.intt(std)), np.asarray(nt.from_t(nt.intt_t(t)))
    )


@pytest.mark.parametrize("n", [16, 256])
def test_class_ntt_t_matches_coset_eval(rng, n):
    std, t = _rand_cols(rng, 2, n)
    base = rng.randrange(1, f128.P)
    ref = nj.ntt(jf.fmul(std, nj.ladder_host(base, n)))
    got = nt.from_t(nt.class_ntt_t(t, jnp.asarray(nt.jt.tlimbs(base))))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_ntt_t_recursion_branch(rng, monkeypatch):
    """Force the flat recursion (N2 > MAX_AXIS) and compare."""
    monkeypatch.setattr(nt, "MAX_AXIS", 4)
    n = 128
    std, t = _rand_cols(rng, 2, n)
    np.testing.assert_array_equal(
        np.asarray(nj.ntt(std)), np.asarray(nt.from_t(nt.ntt_t(t)))
    )
    base = rng.randrange(1, f128.P)
    ref = nj.ntt(jf.fmul(std, nj.ladder_host(base, n)))
    got = nt.from_t(nt.class_ntt_t(t, jnp.asarray(nt.jt.tlimbs(base))))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_scale_by_ladder_t(rng):
    n = 64
    std, t = _rand_cols(rng, 2, n)
    base = rng.randrange(1, f128.P)
    ref = jf.fmul(std, nj.ladder_host(base, n))
    got = nt.from_t(
        nt.scale_by_ladder_t(t, jnp.asarray(nt.jt.tlimbs(base)), n)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_ladder_t(rng):
    base = rng.randrange(1, f128.P)
    lad = nt.ladder_t_host(base, 32)
    ref = nj.ladder_host(base, 32)
    np.testing.assert_array_equal(
        np.asarray(jnp.swapaxes(lad, 0, 1)), np.asarray(ref)
    )


def test_hash_rows_t_matches_blake3_jax(rng):
    from zkvm.hash import blake3_jax as b3j
    from zkvm.hash import blake3_t as b3t

    for c, n in [(28, 32), (8, 16), (1, 8)]:
        std, t = _rand_cols(rng, c, n)
        ref = jnp.transpose(b3j.hash_rows(jnp.transpose(t, (2, 0, 1))), (1, 0))
        got = b3t.hash_rows_t(t)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        # the SoA compression math itself (kernel body), outside pallas
        words = []
        for ci in range(c):
            for j in range(4):
                words.append(
                    t[ci, 2 * j : 2 * j + 1, :]
                    | (t[ci, 2 * j + 1 : 2 * j + 2, :] << jnp.uint32(16))
                )
        soa = jnp.concatenate(b3t._hash_words_soa(words), axis=0)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(soa))

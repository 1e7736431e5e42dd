"""NTT tests: golden self-consistency + JAX vs golden."""

import numpy as np
import pytest
import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.ntt import golden as g
from zkvm.ntt import ntt_jax as nj


def test_golden_ntt_roundtrip(rng):
    vals = [rng.randrange(f128.P) for _ in range(16)]
    assert g.intt(g.ntt(vals)) == vals


def test_golden_ntt_is_evaluation(rng):
    coeffs = [rng.randrange(f128.P) for _ in range(8)]
    evals = g.ntt(coeffs)
    w = f128.get_root_of_unity(8)
    for k in range(8):
        assert evals[k] == g.eval_poly(coeffs, pow(w, k, f128.P))


def test_golden_coset_lde(rng):
    coeffs = [rng.randrange(f128.P) for _ in range(4)]
    evals = g.coset_lde(coeffs, 8)
    w = f128.get_root_of_unity(32)
    for k in range(32):
        x = f128.fmul(f128.DOMAIN_OFFSET, pow(w, k, f128.P))
        assert evals[k] == g.eval_poly(coeffs, x)


def test_jax_ntt_matches_golden(rng):
    for n in [2, 8, 64, 256]:
        vals = [rng.randrange(f128.P) for _ in range(n)]
        got = jf.from_limbs(np.asarray(nj.ntt(jnp.asarray(jf.to_limbs(vals)))))
        assert [int(v) for v in got] == g.ntt(vals)


def test_jax_intt_matches_golden(rng):
    vals = [rng.randrange(f128.P) for _ in range(64)]
    got = jf.from_limbs(np.asarray(nj.intt(jnp.asarray(jf.to_limbs(vals)))))
    assert [int(v) for v in got] == g.intt(vals)


def test_jax_ntt_batched(rng):
    cols = [[rng.randrange(f128.P) for _ in range(32)] for _ in range(3)]
    got = jf.from_limbs(np.asarray(nj.ntt(jnp.asarray(jf.to_limbs(cols)))))
    for b in range(3):
        assert [int(v) for v in got[b]] == g.ntt(cols[b])


def test_jax_coset_lde_matches_golden(rng):
    coeffs = [rng.randrange(f128.P) for _ in range(16)]
    got = jf.from_limbs(
        np.asarray(nj.coset_lde(jnp.asarray(jf.to_limbs(coeffs)), 8))
    )
    assert [int(v) for v in got] == g.coset_lde(coeffs, 8)


def test_lde_of_trace_column_extends(rng):
    # iNTT then coset-LDE: original values appear at stride-8 offsets? No —
    # the coset is disjoint from the subgroup; instead check degree: the
    # interpolant of the LDE restricted back through iNTT has the same coeffs.
    vals = [rng.randrange(f128.P) for _ in range(16)]
    coeffs = g.intt(vals)
    lde = g.coset_lde(coeffs, 4)
    # interpolate the 64 coset evals: scale back by offset^-i after iNTT
    back = g.intt(lde)
    inv_off = f128.finv(f128.DOMAIN_OFFSET)
    p = 1
    unscaled = []
    for c in back:
        unscaled.append(f128.fmul(c, p))
        p = f128.fmul(p, inv_off)
    assert unscaled[:16] == coeffs
    assert all(c == 0 for c in unscaled[16:])


@pytest.mark.slow  # ~2 min XLA:CPU compile of the unrolled TPU network;
# the TPU path itself is probe-validated against XLA on random inputs
def test_unrolled_network_matches_golden(rng):
    """The TPU fast-path butterfly network (ntt/intt dispatch to it on
    non-CPU backends) computes the same transform as the scan network."""
    for n in [2, 16, 128, 1024]:
        vals = [rng.randrange(f128.P) for _ in range(n)]
        x = jnp.asarray(jf.to_limbs(vals))
        fwd = jf.from_limbs(np.asarray(nj._ntt_unrolled(x, False)))
        assert [int(v) for v in fwd] == g.ntt(vals)
        inv_raw = nj._ntt_unrolled(x, True)
        inv = jf.fmul(inv_raw, jf.constant(f128.finv(n)))
        assert [int(v) for v in jf.from_limbs(np.asarray(inv))] == g.intt(vals)


@pytest.mark.slow
def test_unrolled_network_batched(rng):
    cols = [[rng.randrange(f128.P) for _ in range(64)] for _ in range(3)]
    got = jf.from_limbs(
        np.asarray(nj._ntt_unrolled(jnp.asarray(jf.to_limbs(cols)), False))
    )
    for b in range(3):
        assert [int(v) for v in got[b]] == g.ntt(cols[b])

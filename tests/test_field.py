"""Golden tests: JAX limb arithmetic vs Python-int field model."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkvm.field import f128
from zkvm.field import jax_f128 as jf


def _rand_elems(rng, n):
    # mix of uniform, small, and near-p values to hit carry/reduction edges
    specials = [0, 1, 2, f128.P - 1, f128.P - 2, (1 << 128) - 45 * (1 << 40),
                (1 << 64) - 1, 1 << 64, (1 << 127)]
    out = []
    for i in range(n):
        if i < len(specials):
            out.append(specials[i] % f128.P)
        else:
            out.append(rng.randrange(f128.P))
    return out


def test_limb_roundtrip(rng):
    vals = _rand_elems(rng, 64)
    limbs = jf.to_limbs(vals)
    assert limbs.shape == (64, 8)
    back = jf.from_limbs(limbs)
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("op,gold", [
    ("fadd", f128.fadd),
    ("fsub", f128.fsub),
    ("fmul", f128.fmul),
])
def test_binary_ops(rng, op, gold):
    a = _rand_elems(rng, 128)
    b = list(reversed(_rand_elems(rng, 128)))
    fn = jax.jit(getattr(jf, op))
    got = jf.from_limbs(np.asarray(fn(jnp.asarray(jf.to_limbs(a)), jnp.asarray(jf.to_limbs(b)))))
    want = [gold(x, y) for x, y in zip(a, b)]
    assert [int(v) for v in got] == want


def test_fneg(rng):
    a = _rand_elems(rng, 32)
    got = jf.from_limbs(np.asarray(jax.jit(jf.fneg)(jnp.asarray(jf.to_limbs(a)))))
    assert [int(v) for v in got] == [f128.fneg(x) for x in a]


def test_mul_stress_worst_case():
    # (p-1)^2 exercises the widest intermediate product
    a = [f128.P - 1] * 4
    got = jf.from_limbs(np.asarray(jf.fmul(jnp.asarray(jf.to_limbs(a)), jnp.asarray(jf.to_limbs(a)))))
    assert [int(v) for v in got] == [f128.fmul(f128.P - 1, f128.P - 1)] * 4


def test_fpow_const(rng):
    a = _rand_elems(rng, 16)
    for e in [0, 1, 2, 3, f128.ALPHA, 12345]:
        got = jf.from_limbs(np.asarray(jf.fpow_const(jnp.asarray(jf.to_limbs(a)), e)))
        assert [int(v) for v in got] == [pow(x, e, f128.P) for x in a]


def test_inv_alpha_exponent(rng):
    # x^(1/3) round-trips through the cube s-box
    a = _rand_elems(rng, 8)
    inv = jf.fpow_const(jnp.asarray(jf.to_limbs(a)), f128.INV_ALPHA)
    cubed = jf.fpow_const(inv, 3)
    got = jf.from_limbs(np.asarray(cubed))
    assert [int(v) for v in got] == a


def test_batch_inverse(rng):
    vals = _rand_elems(rng, 100)
    vals[3] = 0  # zero maps to zero
    got = jf.from_limbs(np.asarray(jax.jit(jf.batch_inverse)(jnp.asarray(jf.to_limbs(vals)))))
    for v, g in zip(vals, got):
        if v == 0:
            assert int(g) == 0
        else:
            assert f128.fmul(v, int(g)) == 1


def test_fsum(rng):
    vals = _rand_elems(rng, 37)
    got = jf.from_limbs(np.asarray(jf.fsum(jnp.asarray(jf.to_limbs(vals)), axis=0)))
    want = 0
    for v in vals:
        want = f128.fadd(want, v)
    assert int(got) == want


def test_roots_of_unity():
    for log_n in [1, 4, 10, 20, 40]:
        w = f128.get_root_of_unity(2 ** log_n)
        assert pow(w, 2 ** log_n, f128.P) == 1
        assert pow(w, 2 ** (log_n - 1), f128.P) == f128.P - 1  # primitive


def test_element_bytes_roundtrip(rng):
    for v in _rand_elems(rng, 8):
        assert f128.from_bytes(f128.to_bytes(v)) == v
    assert len(f128.to_bytes(0)) == 16

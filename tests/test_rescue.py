"""Rescue-Prime: constant integrity, round algebra, JAX vs golden."""

import jax.numpy as jnp

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash import rescue as r
from zkvm.hash import rescue_jax as rj


def test_mds_inverse_pair():
    for i in range(4):
        for j in range(4):
            v = sum(r.MDS[i * 4 + k] * r.INV_MDS[k * 4 + j] for k in range(4)) % f128.P
            assert v == (1 if i == j else 0)


def test_inv_alpha_is_cube_root_exponent():
    assert (f128.ALPHA * f128.INV_ALPHA) % (f128.P - 1) == 1


def test_ark_shape_and_zero_tail():
    assert len(r.ARK) == 16 and all(len(row) == 8 for row in r.ARK)
    assert r.ARK[14] == [0] * 8 and r.ARK[15] == [0] * 8


def test_round_constants_transpose():
    cols = r.get_round_constants()
    assert len(cols) == 8 and all(len(c) == 16 for c in cols)
    for i in range(16):
        for j in range(8):
            assert cols[j][i] == r.ARK[i][j]


def test_apply_round_invertible(rng):
    state = [rng.randrange(f128.P) for _ in range(4)]
    out = r.apply_round(state, 16, 200, 5)
    ark = r.ARK[5]
    t = [(out[i] - ark[4 + i]) % f128.P for i in range(4)]
    t = r.apply_inv_mds(t)
    t = r.apply_sbox(t)
    t[0] = (t[0] - 16) % f128.P
    t[1] = (t[1] - 200) % f128.P
    t = [(t[i] - ark[i]) % f128.P for i in range(4)]
    t = r.apply_inv_mds(t)
    t = r.apply_inv_sbox(t)
    assert t == state


def test_sponge_capacity_reset(rng):
    s = r.Rescue128()
    for step in range(16):
        s.update(0, 0)
    # after a full cycle the capacity lanes were reset at steps 14-15
    assert s.state[2] == 0 and s.state[3] == 0
    assert s.step == 16


def test_jax_round_matches_golden(rng):
    states = [[rng.randrange(f128.P) for _ in range(4)] for _ in range(6)]
    op_codes = [rng.randrange(32) for _ in range(6)]
    op_values = [rng.randrange(256) for _ in range(6)]
    step = 7

    got = rj.apply_round(
        jnp.asarray(jf.to_limbs(states)),
        jnp.asarray(jf.to_limbs(op_codes)),
        jnp.asarray(jf.to_limbs(op_values)),
        jnp.asarray(jf.to_limbs(r.ARK[step % 16])),
    )
    got_ints = jf.from_limbs(got)
    for b in range(6):
        want = r.apply_round(states[b], op_codes[b], op_values[b], step)
        assert [int(v) for v in got_ints[b]] == want


def test_jax_mds_matches_golden(rng):
    state = [rng.randrange(f128.P) for _ in range(4)]
    got = jf.from_limbs(rj.apply_mds(jnp.asarray(jf.to_limbs(state))))
    assert [int(v) for v in got] == r.apply_mds(state)
    got = jf.from_limbs(rj.apply_inv_mds(jnp.asarray(jf.to_limbs(state))))
    assert [int(v) for v in got] == r.apply_inv_mds(state)

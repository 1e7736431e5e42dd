"""Blowup-class-decomposed prover stages == monolithic stages, bit for bit.

The class path (pipeline._stage_*_cls) evaluates per residue class
i = r + blowup*k with an O(T) working set; these tests pin its outputs to
the monolithic stages on random column data (the algebra holds for any
values, not just valid traces).  Full-prove byte equality is covered by
tests/test_dist.py::test_real_prove_mesh_byte_equality (class path vs
mesh path) and the e2e suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
import zkvm.prover.pipeline as pp

# minutes of XLA:CPU compile for the mono+cls stage graphs; the byte-level
# equivalence these pin is exercised every default run through the
# conformance-vector prove (cls) and the driver's mesh dryrun (mono)
pytestmark = pytest.mark.slow

T = 32
BLOWUP = 8
D = T * BLOWUP


@pytest.fixture(scope="module")
def cols(rng_module):
    vals = [
        [rng_module.randrange(f128.P) for _ in range(T)] for _ in range(28)
    ]
    return jnp.asarray(jf.to_limbs(vals))


@pytest.fixture(scope="module")
def rng_module():
    import random

    return random.Random(0xBEEF)


def test_trace_commit_cls_matches_mono(cols):
    dc_c = pp._class_constants(T, BLOWUP)
    coeffs_m, lde, nodes_m = pp._stage_trace_lde(cols, blowup=BLOWUP)
    coeffs_c, nodes_c = pp._stage_trace_commit_cls(cols, dc_c["class_bases"])
    np.testing.assert_array_equal(np.asarray(coeffs_m), np.asarray(coeffs_c))
    np.testing.assert_array_equal(np.asarray(nodes_m), np.asarray(nodes_c))


def test_composition_cls_matches_mono(cols, rng_module):
    rng = rng_module
    dc_m = pp._domain_constants(T, BLOWUP)
    dc_c = pp._class_constants(T, BLOWUP)
    alphas = [rng.randrange(f128.P) for _ in range(20)]
    group0 = [(0, 0, 7), (11, 0, 9)]
    group1 = [(12, 5, 13)]
    coeffs, lde, _ = pp._stage_trace_lde(cols, blowup=BLOWUP)
    delta = 16
    q_m = pp._constraint_eval_mono(
        lde, dc_m, alphas, group0, group1, BLOWUP, delta, None
    )
    q_c = pp._constraint_eval_cls(
        coeffs, dc_c, alphas, group0, group1, BLOWUP, delta, T
    )
    np.testing.assert_array_equal(np.asarray(q_m), np.asarray(q_c))

    # composition commitment from the same evals
    h_m, comp_lde, nodes_m = pp._stage_comp_commit(
        q_m, dc_m["inv_off_ladder"], blowup=BLOWUP
    )
    from zkvm.ntt import ntt_jax as nj

    inv_off = nj.ladder_host(f128.finv(f128.DOMAIN_OFFSET), D)
    h_c, nodes_c = pp._stage_comp_commit_cls(q_c, inv_off, dc_c["class_bases"])
    np.testing.assert_array_equal(np.asarray(h_m), np.asarray(h_c))
    np.testing.assert_array_equal(np.asarray(nodes_m), np.asarray(nodes_c))


def test_deep_and_query_rows_cls_match_mono(cols, rng_module):
    rng = rng_module
    dc_m = pp._domain_constants(T, BLOWUP)
    dc_c = pp._class_constants(T, BLOWUP)
    coeffs, lde, _ = pp._stage_trace_lde(cols, blowup=BLOWUP)
    h_vals = [[rng.randrange(f128.P) for _ in range(T)] for _ in range(8)]
    h_coeffs = jnp.asarray(jf.to_limbs(h_vals))
    from zkvm.ntt import ntt_jax as nj

    comp_lde = nj.coset_lde(h_coeffs, BLOWUP)

    gammas = [rng.randrange(f128.P) for _ in range(28)]
    deltas = [rng.randrange(f128.P) for _ in range(28)]
    epsilons = [rng.randrange(f128.P) for _ in range(8)]
    z = rng.randrange(f128.P)
    zg = f128.fmul(z, dc_m["g_trace"])
    zm = pow(z, 8, f128.P)
    a_z, b_zg, h_zm = (
        rng.randrange(f128.P),
        rng.randrange(f128.P),
        rng.randrange(f128.P),
    )
    y_m = pp._stage_deep(
        lde,
        comp_lde,
        dc_m["x_ladder"],
        jnp.asarray(jf.to_limbs(gammas)),
        jnp.asarray(jf.to_limbs(deltas)),
        jnp.asarray(jf.to_limbs(epsilons)),
        jf.constant(a_z, (D,)),
        jf.constant(b_zg, (D,)),
        jf.constant(h_zm, (D,)),
        jf.constant(z, (D,)),
        jf.constant(zg, (D,)),
        jf.constant(zm, (D,)),
    )
    y_c = pp._stage_deep_cls(
        coeffs,
        h_coeffs,
        jnp.asarray(jf.to_limbs(gammas)),
        jnp.asarray(jf.to_limbs(deltas)),
        jnp.asarray(jf.to_limbs(epsilons)),
        jnp.asarray(jf.to_limbs(a_z)),
        jnp.asarray(jf.to_limbs(b_zg)),
        jnp.asarray(jf.to_limbs(h_zm)),
        jnp.asarray(jf.to_limbs(z)),
        jnp.asarray(jf.to_limbs(zg)),
        jnp.asarray(jf.to_limbs(zm)),
        dc_c["class_bases"],
    )
    np.testing.assert_array_equal(np.asarray(y_m), np.asarray(y_c))

    # query rows: polynomial evaluation == LDE row gather
    positions = [0, 1, 17, D - 1]
    rows_gather = pp._host_rows(lde, positions)
    pts = jnp.asarray(
        jf.to_limbs(
            [
                f128.fmul(f128.DOMAIN_OFFSET, pow(dc_c["w_d"], p, f128.P))
                for p in positions
            ]
        )
    )
    rows_eval = [
        [int(v) for v in row]
        for row in jf.from_limbs(np.asarray(pp._stage_query_rows(coeffs, pts)))
    ]
    assert rows_gather == rows_eval

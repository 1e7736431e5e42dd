"""Batched constraint evaluator vs the golden per-frame oracle."""

import random

import numpy as np
import jax.numpy as jnp

from zkvm.air import CYCLE_MASK
from zkvm.air.constraints_golden import evaluate_transition
from zkvm.air.constraints_jax import evaluate_constraints, merged_transition
from zkvm.air.periodic import periodic_at, periodic_lde
from zkvm.fhe import LweParameters, ServerKey
from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash.rescue import ARK
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor


def make_trace():
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    x = key.encrypt(2)
    program = Program.compile("read2\npush.3\nsmul\nread\nsadd")
    proc = Processor.run(program, ProgramInputs((4,), (x,), key))
    return proc.trace(), key


def test_batched_matches_golden_on_trace_domain():
    trace, key = make_trace()
    t = trace.length
    delta = key.parameters.delta

    cols = jnp.asarray(jf.to_limbs(trace.columns))  # (28, T, 8)
    nxt = jnp.roll(cols, -1, axis=1)
    reps = t // 16
    mask = jnp.asarray(jf.to_limbs(CYCLE_MASK * reps))
    ark = jnp.asarray(
        jf.to_limbs([[ARK[i % 16][j] for i in range(t)] for j in range(8)])
    )
    got = evaluate_constraints(cols, nxt, mask, ark, delta)
    got_host = [jf.from_limbs(np.asarray(v)) for v in got]

    for i in range(t - 2):
        want = evaluate_transition(
            trace.row(i), trace.row(i + 1), CYCLE_MASK[i % 16], ARK[i % 16], delta
        )
        for k in range(20):
            assert int(got_host[k][i]) == want[k], (i, k)
        assert want == [0] * 20  # valid trace


def test_periodic_lde_matches_pointwise_eval():
    # LDE-coset periodic values match direct evaluation at each coset point
    t, blowup = 32, 8
    d = t * blowup
    mask, ark = periodic_lde(t, blowup)
    mask_host = jf.from_limbs(np.asarray(mask))
    ark_host = jf.from_limbs(np.asarray(ark))
    w = f128.get_root_of_unity(d)
    for i in [0, 1, 7, 100, 255]:
        x = f128.fmul(f128.DOMAIN_OFFSET, pow(w, i, f128.P))
        m, a = periodic_at(t, x)
        assert int(mask_host[i]) == m
        assert [int(ark_host[j][i]) for j in range(8)] == a


def test_periodic_class_patterns_match_lde_slices():
    """Tiling a class pattern T/16 times equals periodic_lde[·, r::blowup].

    Pins the docstring claim in periodic.periodic_class_patterns: LDE
    position i = r + blowup*k restricted to class r has literal period 16
    in k, so the (16,8)-limb pattern tiled T/16 times must reproduce the
    full per-class slice of the dense LDE tensors.
    """
    from zkvm.air.periodic import periodic_class_patterns

    t, blowup = 64, 8
    mask, ark = periodic_lde(t, blowup)  # (D, 8), (8, D, 8)
    mask_pat, ark_pat = periodic_class_patterns(t, blowup)  # (B,16,8), (B,8,16,8)
    reps = t // 16
    for r in range(blowup):
        np.testing.assert_array_equal(
            np.tile(np.asarray(mask_pat[r]), (reps, 1)),
            np.asarray(mask[r::blowup]),
        )
        np.testing.assert_array_equal(
            np.tile(np.asarray(ark_pat[r]), (1, reps, 1)),
            np.asarray(ark[:, r::blowup]),
        )


def test_merged_transition_matches_weighted_sum():
    trace, key = make_trace()
    t = trace.length
    delta = key.parameters.delta
    cols = jnp.asarray(jf.to_limbs(trace.columns))
    reps = t // 16
    mask = jnp.asarray(jf.to_limbs(CYCLE_MASK * reps))
    ark = jnp.asarray(
        jf.to_limbs([[ARK[i % 16][j] for i in range(t)] for j in range(8)])
    )
    alphas = list(range(3, 23))
    got = jf.from_limbs(
        np.asarray(
            merged_transition(
                cols, 1, mask, ark, delta, jnp.asarray(jf.to_limbs(alphas))
            )
        )
    )
    P = f128.P
    for i in range(t - 2):
        want_vals = evaluate_transition(
            trace.row(i), trace.row(i + 1), CYCLE_MASK[i % 16], ARK[i % 16], delta
        )
        want = 0
        for a, v in zip(alphas, want_vals):
            want = (want + a * v) % P
        assert int(got[i]) == want, i


def test_periodic_at_matches_domain_points():
    t = 32
    g = f128.get_root_of_unity(t)
    for i in [0, 5, 17, 30]:
        mask, ark = periodic_at(t, pow(g, i, f128.P))
        assert mask == CYCLE_MASK[i % 16]
        assert ark == list(ARK[i % 16])

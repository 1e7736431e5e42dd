"""Transposed field layout + Pallas constraint kernel vs golden oracles.

The Pallas kernel runs in interpret mode here (CPU test mesh); on TPU the
same code compiles via Mosaic.  Equality targets:

* jax_f128t ops vs Python-int f128 (golden) and vs jax_f128 (std layout);
* merged_transition_t / merged_transition_pallas vs constraints_jax.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.field import jax_f128t as jt


def rand_elems(rng, n):
    return [rng.randrange(f128.P) for _ in range(n)]


@pytest.fixture
def elems(rng):
    return rand_elems(rng, 64)


def test_t_layout_roundtrip(elems):
    t = jt.tlimbs(elems)
    assert t.shape == (8, 64)
    back = jt.from_t(t)
    assert [int(v) for v in back] == elems


def test_t_add_sub_mul_match_golden(rng, elems):
    b = rand_elems(rng, 64)
    at = jnp.asarray(jt.tlimbs(elems))
    bt = jnp.asarray(jt.tlimbs(b))
    got_add = jt.from_t(np.asarray(jt.fadd(at, bt)))
    got_sub = jt.from_t(np.asarray(jt.fsub(at, bt)))
    got_mul = jt.from_t(np.asarray(jt.fmul(at, bt)))
    for i in range(64):
        assert int(got_add[i]) == f128.fadd(elems[i], b[i])
        assert int(got_sub[i]) == f128.fsub(elems[i], b[i])
        assert int(got_mul[i]) == f128.fmul(elems[i], b[i])


def test_t_edge_cases():
    edge = [0, 1, f128.P - 1, f128.P - 2, (1 << 128) % f128.P, 2**64, 2**127]
    n = len(edge)
    at = jnp.asarray(jt.tlimbs(edge))
    for other in (edge, list(reversed(edge))):
        bt = jnp.asarray(jt.tlimbs(other))
        got = jt.from_t(np.asarray(jt.fmul(at, bt)))
        for i in range(n):
            assert int(got[i]) == f128.fmul(edge[i], other[i])
        got = jt.from_t(np.asarray(jt.fsub(at, bt)))
        for i in range(n):
            assert int(got[i]) == f128.fsub(edge[i], other[i])


def test_t_fsum_matches_std(rng):
    vals = [rand_elems(rng, 32) for _ in range(6)]
    std = jnp.asarray(jf.to_limbs(vals))  # (6, 32, 8)
    tr = jnp.moveaxis(std, -1, -2)  # (6, 8, 32)
    want = jf.from_limbs(np.asarray(jf.fsum(std, axis=0)))
    got = jt.from_t(np.asarray(jt.fsum(tr, axis=0)))
    assert list(got) == list(want)


# ---------------------------------------------------------------------------
# constraint kernel
# ---------------------------------------------------------------------------

def _trace_lde_fixture():
    from zkvm.air.periodic import periodic_lde
    from zkvm.fhe import LweParameters, ServerKey
    from zkvm.isa import Program, ProgramInputs
    from zkvm.ntt import ntt_jax as nj
    from zkvm.processor import Processor

    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    program = Program.compile("read2\nread\nsadd\npush.1\npush.2\nadd\nsmul")
    x = key.encrypt(2)
    proc = Processor.run(program, ProgramInputs((1, 3), (x,), key))
    trace = proc.trace()
    blowup = 8
    cols = jnp.asarray(trace.as_limbs())
    lde = nj.coset_lde(nj.intt(cols), blowup)
    mask, ark = periodic_lde(trace.length, blowup)
    return lde, blowup, mask, ark, key.parameters.delta


def test_merged_transition_t_matches_std(rng):
    from zkvm.air.constraints_jax import merged_transition
    from zkvm.air.constraints_pallas import merged_transition_t
    from zkvm.hash import rescue_jax as rj

    lde, blowup, mask, ark, delta = _trace_lde_fixture()
    alphas = rand_elems(rng, 20)
    al = jnp.asarray(jf.to_limbs(alphas))

    want = np.asarray(merged_transition(lde, blowup, mask, ark, delta, al))

    lde_t = jnp.moveaxis(lde, -1, -2)
    got_t = merged_transition_t(
        lde_t,
        jnp.roll(lde_t, -blowup, axis=-1),
        jnp.moveaxis(mask, -1, -2),
        jnp.moveaxis(ark, -1, -2),
        rj.mds_limbs(),
        rj.inv_mds_limbs(),
        al,
        delta,
    )
    got = np.asarray(jnp.moveaxis(got_t, -1, -2))
    assert (got == want).all()


@pytest.mark.slow
def test_merged_transition_pallas_interpret_matches_std(rng):
    """Interpret-mode equality for the real pallas_call wrapper.

    Interpret mode on CPU is minutes-slow and exercises none of the Mosaic
    lowering constraints, so it is opt-in (``-m slow``); the fast coverage
    is ``test_merged_transition_t_matches_std`` plus the TPU compile smoke
    run in ``scripts/smoke_pallas_tpu.py`` / ``bench.py``.
    """
    from zkvm.air.constraints_jax import merged_transition
    from zkvm.air.constraints_pallas import merged_transition_via_pallas

    lde, blowup, mask, ark, delta = _trace_lde_fixture()
    alphas = rand_elems(rng, 20)
    al = jnp.asarray(jf.to_limbs(alphas))

    want = np.asarray(merged_transition(lde, blowup, mask, ark, delta, al))
    got = np.asarray(
        merged_transition_via_pallas(
            lde, blowup, mask, ark, delta, al, block=128, interpret=True
        )
    )
    assert (got == want).all()

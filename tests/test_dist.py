"""Multi-device sharded prover step on a virtual CPU mesh.

SURVEY.md section 2.3: the TPU build introduces row-axis (domain) sharding
over a device mesh as a first-class component.  These tests run the full
sharded prover compute step (LDE -> commitment digests -> constraint
composition -> DEEP -> FRI fold) over 1-device and 8-device meshes and
require bit-identical results — the collectives XLA inserts for the sharded
NTT/hash stages must not change semantics.
"""

import random

import numpy as np
import jax
import pytest

from zkvm.dist import make_mesh, sharded_prove_step
from zkvm.fhe import LweParameters, ServerKey
from zkvm.field import jax_f128 as jf
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor


@pytest.fixture(scope="module")
def tiny_trace():
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    program = Program.compile("push.1\npush.2\nadd")
    proc = Processor.run(program, ProgramInputs((), (), key))
    trace = proc.trace()
    return np.asarray(jf.to_limbs(trace.columns)), key.parameters.delta


def test_mesh_construction():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)


def test_sharded_step_matches_single_device(tiny_trace):
    cols, delta = tiny_trace
    t_len = cols.shape[1]

    res1 = sharded_prove_step(make_mesh(1), cols, delta)
    res8 = sharded_prove_step(make_mesh(8), cols, delta)

    for a, b in zip(res1, res8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trace_digests, comp_digests, folded = res8
    assert trace_digests.shape == (t_len * 8, 8)
    assert comp_digests.shape == (t_len * 8, 8)
    assert folded.shape == (t_len, 8)


def test_sharded_digests_match_pipeline_stage(tiny_trace):
    """The sharded trace commitment must equal the single-chip pipeline's."""
    import jax.numpy as jnp

    from zkvm.prover.pipeline import _stage_trace_lde

    cols, delta = tiny_trace
    _, _, nodes = _stage_trace_lde(jnp.asarray(cols), blowup=8)
    # nodes is the full Merkle heap (2D, 8); row digests are the leaves
    d = nodes.shape[0] // 2
    digests = nodes[d:]
    sharded_digests, _, _ = sharded_prove_step(make_mesh(8), cols, delta)
    np.testing.assert_array_equal(np.asarray(digests), np.asarray(sharded_digests))

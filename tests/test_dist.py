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


def test_sharded_ntt_matches_golden(rng):
    """Four-step all_to_all NTT == single-device NTT, bit for bit.

    Under shard_map no device ever holds the full input: each local block
    is N/8 rows (asserted via the mesh spec), and the only data movement is
    the three all_to_all exchanges.
    """
    import jax.numpy as jnp

    from zkvm.dist import coset_lde_sharded, intt_sharded, ntt_sharded
    from zkvm.ntt import ntt_jax as nj

    mesh = make_mesh(8)
    n = 512
    x = np.asarray(
        jf.to_limbs([[rng.randrange(2**64) for _ in range(n)] for _ in range(2)])
    )
    x = jnp.asarray(x)  # (2, 512, 8)
    np.testing.assert_array_equal(
        np.asarray(ntt_sharded(x, mesh)), np.asarray(nj.ntt(x))
    )
    np.testing.assert_array_equal(
        np.asarray(intt_sharded(x, mesh)), np.asarray(nj.intt(x))
    )
    c = x[:, :64, :]
    np.testing.assert_array_equal(
        np.asarray(coset_lde_sharded(c, 8, mesh)), np.asarray(nj.coset_lde(c, 8))
    )


@pytest.mark.slow  # full-pipeline compile at mesh rows=8 (minutes); the
# driver's MULTICHIP dryrun executes this exact path (prove+verify on the
# 8-device mesh) every round
def test_real_prove_mesh_byte_equality():
    """The REAL prover under a mesh: proof bytes identical to single-chip,
    and the proof verifies (VERDICT round 1, task 4)."""
    from zkvm.air.layout import PublicInputs
    from zkvm.prover import prove as stark_prove
    from zkvm.verifier import verify as stark_verify

    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    program = Program.compile("read2\nread\nsadd\npush.1\npush.2\nadd\nsmul")
    x = key.encrypt(2)
    trace = Processor.run(program, ProgramInputs((1, 3), (x,), key)).trace()
    pub = PublicInputs(program.hash, trace.outputs, key)

    p_single = stark_prove(trace, pub)
    p_mesh = stark_prove(trace, pub, mesh=make_mesh(8))
    assert p_single.to_bytes() == p_mesh.to_bytes()
    stark_verify(p_mesh, pub)


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


@pytest.mark.slow
def test_multihost_two_process_ntt():
    """Real jax.distributed across two CPU processes: the host-spanning
    four-step NTT is bit-identical to single-process (SURVEY P5).

    Marked slow: spawns two JAX subprocesses that each pay a fresh XLA
    warm-up (minutes); run with ``-m slow``.
    """
    import socket
    import subprocess
    import sys
    import os

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_smoke.py"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # bind port 0 to reserve a free ephemeral port (avoids collisions with
    # stale listeners or parallel test runs)
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        free_port = s.getsockname()[1]
    env["ZKVM_SMOKE_PORT"] = str(free_port)
    out = subprocess.run(
        [sys.executable, script],
        env=env,
        capture_output=True,
        timeout=1500,
        text=True,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert "bit-identical" in out.stdout

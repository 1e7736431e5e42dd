"""Adversarial (reject-path) verifier tests — VERDICT round 1, task 7.

Every proof field class is tampered and must raise VerificationError:
Merkle path siblings (trace / composition / FRI), OOD frame elements,
FRI roots / group values / remainder coefficients, query positions, the
PoW nonce under grinding, and public inputs.  A verifier is only as good
as its reject paths; these pin them.

Reference analogue: the checks winterfell::verify performs at
vm/src/lib.rs:91-98 (it rejects the same classes of malleation).
"""

import dataclasses
import random

import pytest

from zkvm.air.layout import PublicInputs
from zkvm.fhe import LweParameters, ServerKey
from zkvm.field import f128
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor
from zkvm.prover import ProofOptions, prove as stark_prove
from zkvm.prover.proof import Proof
from zkvm.verifier import VerificationError, verify as stark_verify


@pytest.fixture(scope="module")
def proven():
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    program = Program.compile("push.1\npush.2\nadd")
    trace = Processor.run(program, ProgramInputs((), (), key)).trace()
    pub = PublicInputs(program.hash, trace.outputs, key)
    proof = stark_prove(trace, pub)
    stark_verify(proof, pub)  # honest proof must pass
    return proof, pub


@pytest.fixture(scope="module")
def proven_fri():
    """A proof with >= 1 FRI layer (smaller remainder bound forces folds;
    the tiny trace's D = 512 never folds under the reference preset)."""
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(9)
    )
    program = Program.compile("push.1\npush.2\nadd")
    trace = Processor.run(program, ProgramInputs((), (), key)).trace()
    pub = PublicInputs(program.hash, trace.outputs, key)
    options = dataclasses.replace(ProofOptions(), fri_remainder_max_degree=7)
    proof = stark_prove(trace, pub, options)
    assert len(proof.fri_roots) >= 1
    stark_verify(proof, pub)
    return proof, pub


def reload(proof: Proof) -> Proof:
    """Deep copy via the wire format so mutations never leak across tests."""
    return Proof.from_bytes(proof.to_bytes())


def expect_reject(proof, pub, match: str | None = None):
    with pytest.raises(VerificationError) as err:
        stark_verify(proof, pub)
    if match:
        assert match in str(err.value), err.value


def test_tamper_trace_merkle_sibling(proven):
    proof, pub = proven
    p = reload(proof)
    path = p.queries[0].trace_path
    path[1] = bytes([path[1][0] ^ 1]) + path[1][1:]
    expect_reject(p, pub, "trace Merkle path invalid")


def test_tamper_comp_merkle_sibling(proven):
    proof, pub = proven
    p = reload(proof)
    path = p.queries[3].comp_path
    path[0] = bytes([path[0][0] ^ 0x80]) + path[0][1:]
    expect_reject(p, pub, "composition Merkle path invalid")


def test_tamper_trace_row_value(proven):
    proof, pub = proven
    p = reload(proof)
    p.queries[0].trace_row[5] = f128.fadd(p.queries[0].trace_row[5], 1)
    expect_reject(p, pub, "trace Merkle path invalid")


def test_tamper_ood_trace_element(proven):
    proof, pub = proven
    p = reload(proof)
    p.ood_trace_cur[12] = f128.fadd(p.ood_trace_cur[12], 1)
    expect_reject(p, pub)


def test_tamper_ood_next_element(proven):
    proof, pub = proven
    p = reload(proof)
    p.ood_trace_nxt[0] = f128.fadd(p.ood_trace_nxt[0], 1)
    expect_reject(p, pub)


def test_tamper_ood_composition_element(proven):
    proof, pub = proven
    p = reload(proof)
    p.ood_comp[0] = f128.fadd(p.ood_comp[0], 1)
    expect_reject(p, pub)


def test_tamper_fri_root(proven_fri):
    proof, pub = proven_fri
    p = reload(proof)
    r = p.fri_roots[0]
    p.fri_roots[0] = bytes([r[0] ^ 1]) + r[1:]
    expect_reject(p, pub)


def test_tamper_fri_group_value(proven_fri):
    proof, pub = proven_fri
    p = reload(proof)
    op = p.fri_openings[0][0]
    op.group[2] = f128.fadd(op.group[2], 1)
    expect_reject(p, pub)


def test_tamper_fri_remainder(proven):
    proof, pub = proven
    p = reload(proof)
    p.fri_remainder[0] = f128.fadd(p.fri_remainder[0], 1)
    expect_reject(p, pub)


def test_tamper_query_position(proven):
    proof, pub = proven
    p = reload(proof)
    p.queries[0].position ^= 1
    expect_reject(p, pub, "query position mismatch")


def test_tamper_trace_root(proven):
    proof, pub = proven
    p = reload(proof)
    p.trace_root = bytes([p.trace_root[0] ^ 1]) + p.trace_root[1:]
    expect_reject(p, pub)


def test_tamper_public_outputs(proven):
    proof, pub = proven
    bad = PublicInputs(
        pub.program_hash,
        tuple([f128.fadd(pub.stack_outputs[0], 1)] + list(pub.stack_outputs[1:])),
        pub.server_key,
    )
    expect_reject(reload(proof), bad)


def test_tamper_program_hash(proven):
    proof, pub = proven
    bad = PublicInputs(
        tuple(f128.fadd(h, 1) for h in pub.program_hash),
        pub.stack_outputs,
        pub.server_key,
    )
    expect_reject(reload(proof), bad)


def test_grinding_pow_nonce_rejected():
    """With grinding>0 a wrong nonce must fail the PoW check."""
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    program = Program.compile("push.1\npush.2\nadd")
    trace = Processor.run(program, ProgramInputs((), (), key)).trace()
    pub = PublicInputs(program.hash, trace.outputs, key)
    options = dataclasses.replace(ProofOptions(), grinding_factor=8)
    proof = stark_prove(trace, pub, options)
    stark_verify(proof, pub)  # honest grind passes
    bad = reload(proof)
    # a different nonce either fails the PoW outright or derails the
    # nonce-seeded query positions — both must reject
    bad.pow_nonce = proof.pow_nonce + 1
    with pytest.raises(VerificationError):
        stark_verify(bad, pub)


def test_security_floor_enforced(proven):
    proof, pub = proven
    with pytest.raises(VerificationError, match="security"):
        stark_verify(reload(proof), pub, min_security=200)

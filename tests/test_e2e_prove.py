"""End-to-end prove -> verify (the v1 conformance gate, SURVEY.md section 7).

Mirrors the reference e2e test (vm/src/lib.rs:47-99): compile, run with FHE
inputs, prove, decrypt the output, verify; plus soundness probes (tampered
proofs must be rejected).
"""

import random

import pytest

from zkvm import vm
from zkvm.fhe import FheUInt8, LweParameters, ServerKey
from zkvm.isa import Program, ProgramInputs
from zkvm.prover.proof import Proof
from zkvm.verifier import VerificationError


def make_key(seed=7):
    return ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(seed)
    )


def test_prove_verify_scalar_program():
    program = Program.compile("push.1\npush.2\nadd")
    key = make_key()
    inputs = ProgramInputs((), (), key)
    hash_, output, proof = vm.prove(program, inputs)
    assert output[0] == 3
    vm.verify(proof, hash_, output, key)


def test_prove_verify_fhe_program():
    # the reference test program (vm/src/lib.rs:52-58): (a + x) * 3
    program = Program.compile(
        "read2\nread\nsadd\npush.1\npush.2\nadd\nsmul"
    )
    key = make_key()
    a, b = 1, 3
    clear_x = 2
    x = key.encrypt(clear_x)
    inputs = ProgramInputs((a, b), (x,), key)
    hash_, output, proof = vm.prove(program, inputs)

    result = FheUInt8(tuple(output[:5]))
    assert key.decrypt(result) == (a + clear_x) * 3

    vm.verify(proof, hash_, output, key)


def test_proof_serialization_roundtrip():
    program = Program.compile("push.1\npush.2\nadd")
    key = make_key()
    hash_, output, proof = vm.prove(program, ProgramInputs((), (), key))
    data = proof.to_bytes()
    restored = Proof.from_bytes(data)
    assert restored.to_bytes() == data
    vm.verify(restored, hash_, output, key)


def test_tampered_proof_rejected():
    program = Program.compile("push.1\npush.2\nadd")
    key = make_key()
    hash_, output, proof = vm.prove(program, ProgramInputs((), (), key))

    # wrong public outputs
    bad_output = list(output)
    bad_output[0] = 4
    with pytest.raises(VerificationError):
        vm.verify(proof, hash_, tuple(bad_output), key)

    # wrong program hash
    with pytest.raises(VerificationError):
        vm.verify(proof, ((hash_[0] + 1) % (2**128 - 45 * 2**40 + 1), hash_[1]), output, key)

    # tampered query row
    data = bytearray(proof.to_bytes())
    mutated = Proof.from_bytes(bytes(data))
    mutated.queries[0].trace_row[12] = (mutated.queries[0].trace_row[12] + 1) % (
        2**128 - 45 * 2**40 + 1
    )
    with pytest.raises(VerificationError):
        vm.verify(mutated, hash_, output, key)

    # tampered OOD frame
    mutated = Proof.from_bytes(proof.to_bytes())
    mutated.ood_comp[0] = (mutated.ood_comp[0] + 1) % (2**128 - 45 * 2**40 + 1)
    with pytest.raises(VerificationError):
        vm.verify(mutated, hash_, output, key)

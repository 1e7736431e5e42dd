"""End-to-end test of the linear-regression client/server protocol.

Mirrors the reference example (examples/linear_regression/src/main.rs:20-86):
full byte-level round trip through InputData/OutputData, decryption of the
prediction, and proof verification.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.linear_regression import main as lr
from examples.linear_regression.protocol import InputData, OutputData


def test_linear_regression_end_to_end():
    input_bytes, client_key = lr.client_encrypt(seed=99)

    # byte round trip of the client payload
    payload = InputData.from_bytes(input_bytes)
    assert payload.to_bytes() == input_bytes
    assert payload.public_inputs == (3, 2, 4, 2, 1)
    assert len(payload.secret_inputs) == 4

    output_bytes = lr.server_prove(input_bytes)
    restored = OutputData.from_bytes(output_bytes)
    assert restored.to_bytes() == output_bytes

    prediction = lr.client_verify(output_bytes, client_key)
    b0, b1, b2, b3, b4 = lr.WEIGHTS
    x1, x2, x3, x4 = lr.FEATURES
    assert prediction == b0 + b1 * x1 + b2 * x2 + b3 * x3 + b4 * x4


def test_tampered_output_rejected():
    from zkvm.verifier import VerificationError

    input_bytes, client_key = lr.client_encrypt(seed=5)
    output_bytes = lr.server_prove(input_bytes)
    results = OutputData.from_bytes(output_bytes)

    # a lying server: claim a different public output
    bad = list(results.output)
    bad[5] = (bad[5] + 1) % (2**128 - 45 * 2**40 + 1)
    tampered = OutputData(results.program_hash, results.proof_bytes, tuple(bad))
    with pytest.raises(VerificationError):
        lr.client_verify(tampered.to_bytes(), client_key)

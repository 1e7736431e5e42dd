"""Pin the committed conformance vectors (CONFORMANCE.md).

The vectors are the offline half of the winterfell-0.9 adjudication: they
record the transcript values and wire bytes for the reference e2e program
(vm/src/lib.rs:47-99).  This test re-derives the transcript from the
committed artifacts — WITHOUT re-proving — so any change to the coin seed,
draw order, or wire layout that would invalidate the vectors fails CI until
the vectors are regenerated (scripts/gen_conformance_vectors.py).
"""

import json
import os
import random

import pytest

from zkvm.air.layout import TRACE_WIDTH, PublicInputs
from zkvm.fhe import LweParameters, ServerKey
from zkvm.hash.blake3 import hash_elements
from zkvm.prover import wire
from zkvm.prover.options import ProofOptions
from zkvm.verifier import verify_bytes

VECTORS = os.path.join(os.path.dirname(__file__), "..", "conformance", "vectors_e2e.json")


@pytest.fixture(scope="module")
def vec():
    with open(VECTORS) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pub(vec):
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(7)
    )
    assert list(key.key) == vec["secret_key_bits"], "key derivation drifted"
    return PublicInputs(
        tuple(int(v) for v in vec["program_hash"]),
        tuple(int(v) for v in vec["stack_outputs"]),
        key,
    )


def test_seed_elements_pinned(vec, pub):
    opts = ProofOptions()
    seed = wire.coin_seed(vec["trace_length"], TRACE_WIDTH, opts, pub)
    assert [str(v) for v in seed] == vec["seed_elements"]
    assert hash_elements(seed).hex() == vec["seed_digest_hex"]


def test_context_bytes_pinned(vec):
    opts = ProofOptions()
    assert (
        wire.context_bytes(vec["trace_length"], TRACE_WIDTH, opts).hex()
        == vec["context_bytes_hex"]
    )


def test_committed_proof_verifies(vec, pub):
    proof_bytes = bytes.fromhex(vec["proof_bytes_hex"])
    assert len(proof_bytes) == vec["proof_byte_length"]
    verify_bytes(proof_bytes, pub)


def test_transcript_draws_pinned(vec, pub):
    """Replay the coin over the committed roots/OOD values and compare every
    recorded draw (the per-phase diff a Rust session would run)."""
    from zkvm.air.layout import NUM_ASSERTIONS, NUM_TRANSITION_CONSTRAINTS
    from zkvm.prover.pipeline import NUM_COMP_COLUMNS
    from zkvm.prover.transcript import RandomCoin

    opts = ProofOptions()
    coin = RandomCoin(wire.coin_seed(vec["trace_length"], TRACE_WIDTH, opts, pub))
    coin.reseed(bytes.fromhex(vec["trace_root_hex"]))
    assert [
        str(v) for v in coin.draw_elements(NUM_TRANSITION_CONSTRAINTS)
    ] == vec["transition_coefficients"]
    assert [str(v) for v in coin.draw_elements(NUM_ASSERTIONS)] == vec[
        "boundary_coefficients"
    ]
    coin.reseed(bytes.fromhex(vec["comp_root_hex"]))
    assert str(coin.draw()) == vec["z"]
    coin.reseed_with_elements(
        [int(v) for v in vec["ood_trace_cur"]] + [int(v) for v in vec["ood_trace_nxt"]]
    )
    coin.reseed_with_elements([int(v) for v in vec["ood_comp"]])
    assert [str(v) for v in coin.draw_elements(TRACE_WIDTH)] == vec[
        "deep_trace_coefficients"
    ]
    assert [str(v) for v in coin.draw_elements(NUM_COMP_COLUMNS)] == vec[
        "deep_constraint_coefficients"
    ]
    for root_hex, alpha in zip(vec["fri_roots_hex"], vec["fri_alphas"]):
        coin.reseed(bytes.fromhex(root_hex))
        assert str(coin.draw()) == alpha
    coin.reseed_with_elements([int(v) for v in vec["fri_remainder"]])
    drawn = coin.draw_integers(
        opts.num_queries, vec["lde_domain_size"], vec["pow_nonce"]
    )
    assert drawn == vec["query_positions_drawn"]
    assert sorted(set(drawn)) == vec["query_positions_unique_sorted"]

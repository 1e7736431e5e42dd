"""Winterfell 0.9 wire format: batch-Merkle dedup + StarkProof round trip.

The byte layout is reconstructed from the winterfell 0.9 source tree
(see zkvm/prover/wire.py and CONFORMANCE.md); these tests pin
self-consistency (encode -> decode == identity), tamper rejection, and the
proof-size reduction from batch-Merkle path dedup.
"""

import random

import pytest

from zkvm import vm
from zkvm.fhe import LweParameters, ServerKey
from zkvm.hash.blake3 import blake3, hash_elements
from zkvm.hash.merkle import MerkleTree
from zkvm.isa import Program, ProgramInputs
from zkvm.prover import wire
from zkvm.prover.options import ProofOptions
from zkvm.prover.proof import Proof
from zkvm.air.layout import PublicInputs
from zkvm.verifier import VerificationError, verify_bytes


def make_key(seed=7):
    return ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(seed)
    )


# ---------------------------------------------------------------------------
# BatchMerkleProof
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,k,seed", [(16, 3, 0), (64, 8, 1), (256, 32, 2), (64, 1, 3)])
def test_batch_merkle_roundtrip(n, k, seed):
    rng = random.Random(seed)
    leaves = [blake3(bytes([i % 256]) * 4) for i in range(n)]
    tree = MerkleTree.from_leaves(leaves)
    depth = n.bit_length() - 1
    indexes = sorted(rng.sample(range(n), k))
    paths = [tree.open(i) for i in indexes]

    bmp = wire.BatchMerkleProof.from_paths(indexes, paths, depth)
    blob = bmp.serialize_nodes()
    bmp2 = wire.BatchMerkleProof.deserialize_nodes(blob, indexes, depth)
    rebuilt = bmp2.into_paths([leaves[i] for i in indexes])
    assert rebuilt == paths
    # every rebuilt path must authenticate against the root
    for i, path in zip(indexes, rebuilt):
        assert MerkleTree.verify(tree.root, i, leaves[i], path)


def test_batch_merkle_dedups_adjacent():
    """Sibling leaves share their whole path above level 0."""
    n = 64
    leaves = [blake3(bytes([i])) for i in range(n)]
    tree = MerkleTree.from_leaves(leaves)
    depth = 6
    indexes = [10, 11]  # siblings
    paths = [tree.open(i) for i in indexes]
    bmp = wire.BatchMerkleProof.from_paths(indexes, paths, depth)
    total = sum(len(v) for v in bmp.nodes)
    # naive would ship 12 digests; the pair shares all but the upper 5
    assert total == depth - 1


# ---------------------------------------------------------------------------
# Context encodings
# ---------------------------------------------------------------------------

def test_context_bytes_layout():
    opts = ProofOptions()
    blob = wire.context_bytes(1 << 10, 28, opts)
    # trace_info(6) + 1 + 16 modulus + options(6)
    assert len(blob) == 6 + 1 + 16 + 6
    assert blob[0] == 28  # main segment width
    assert blob[3] == 10  # log2 trace length
    assert blob[6] == 16  # modulus byte length
    assert blob[7:23] == wire.MODULUS_BYTES
    assert list(blob[23:]) == [32, 8, 0, 1, 8, 127]


def test_coin_seed_binds_context_and_pub_inputs():
    opts = ProofOptions()
    key = make_key()
    pub = PublicInputs((1, 2), tuple(range(16)), key)
    seed = wire.coin_seed(1 << 10, 28, opts, pub)
    assert seed[:2] == [(28 << 8), 1 << 10]
    assert seed[-18:] == [1, 2] + list(range(16))
    assert wire.coin_seed(1 << 11, 28, opts, pub) != seed


# ---------------------------------------------------------------------------
# StarkProof wire round trip
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def proven():
    program = Program.compile("push.1\npush.2\nadd")
    key = make_key()
    hash_, output, proof = vm.prove(program, ProgramInputs((), (), key))
    pub = PublicInputs(hash_, output, key)
    return proof, pub, hash_, output, key


def test_wire_roundtrip(proven):
    proof, pub, *_ = proven
    data = proof.to_wire_bytes()
    restored = Proof.from_wire_bytes(data, pub)
    assert restored == proof
    assert restored.to_wire_bytes() == data


def test_wire_verify_bytes(proven):
    proof, pub, *_ = proven
    verify_bytes(proof.to_wire_bytes(), pub)


def test_wire_smaller_than_v1(proven):
    """Batch-Merkle dedup + elided positions must shrink the proof."""
    proof, pub, *_ = proven
    assert len(proof.to_wire_bytes()) < len(proof.to_bytes())


def test_wire_parse_reports_structure(proven):
    proof, pub, *_ = proven
    wp = wire.parse(proof.to_wire_bytes())
    assert wp.trace_length == proof.trace_length
    assert wp.trace_width == proof.trace_width
    assert wp.num_unique_queries == len(proof.queries)
    assert wp.trace_root == proof.trace_root
    assert wp.fri_roots == proof.fri_roots
    assert wp.num_partitions == 1
    assert wp.pow_nonce == proof.pow_nonce


def test_wire_tampered_rejected(proven):
    proof, pub, *_ = proven
    data = bytearray(proof.to_wire_bytes())
    # flip one byte inside the first query-values region (beyond the header)
    data[len(data) // 2] ^= 1
    with pytest.raises(VerificationError):
        verify_bytes(bytes(data), pub)


def test_wire_truncated_rejected(proven):
    proof, pub, *_ = proven
    data = proof.to_wire_bytes()
    with pytest.raises(VerificationError):
        verify_bytes(data[:-3], pub)
    with pytest.raises(VerificationError):
        verify_bytes(data + b"\x00", pub)


def test_wire_roundtrip_multi_fri_layer():
    """>=2 FRI layers exercise encode()'s position chaining across layers.

    With the reference preset a T=16 trace has zero layers; shrinking the
    remainder degree to 0 (max remainder size 8) gives d=128 -> 16 -> 2,
    i.e. two folds, without an expensive large-trace prove.  Pins the
    round-4 advisor finding: encode() must chain NON-deduped positions so
    fri_openings stays aligned with query order.
    """
    from zkvm.prover import prove as stark_prove
    from zkvm.processor import Processor

    program = Program.compile("push.1\npush.2\nadd")
    key = make_key()
    trace = Processor.run(program, ProgramInputs((), (), key)).trace()
    pub = PublicInputs(program.hash, trace.outputs, key)
    opts = ProofOptions(fri_remainder_max_degree=0)
    proof = stark_prove(trace, pub, opts)
    assert len(proof.fri_roots) >= 2, "test needs a multi-layer FRI proof"

    data = proof.to_wire_bytes()
    restored = Proof.from_wire_bytes(data, pub)
    assert restored == proof
    assert restored.to_wire_bytes() == data
    verify_bytes(data, pub)


def test_wire_wrong_pub_inputs_rejected(proven):
    proof, pub, _, output, key = proven
    bad = PublicInputs((pub.program_hash[0] ^ 1, pub.program_hash[1]),
                       pub.stack_outputs, key)
    with pytest.raises(VerificationError):
        verify_bytes(proof.to_wire_bytes(), bad)

"""Generate the committed conformance vectors (CONFORMANCE.md).

Proves the reference e2e test program (vm/src/lib.rs:47-99: read2/read/sadd/
push/push/add/smul over one encrypted input) on the CPU backend with the
deterministic randomizer row, and records every transcript value plus a
per-section byte-offset map of the winterfell-wire proof.  A future
Rust-side session diffs these against the actual winterfell 0.9 crates to
adjudicate the [L]/[M] encodings in zkvm/prover/wire.py.

Usage:  python scripts/gen_conformance_vectors.py   (writes conformance/vectors_e2e.json)
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

from zkvm.utils.jax_cache import enable_compilation_cache

enable_compilation_cache("/tmp/zkvm_jax_cache_tests")

from zkvm import vm
from zkvm.air.layout import (
    NUM_ASSERTIONS,
    NUM_TRANSITION_CONSTRAINTS,
    TRACE_WIDTH,
    PublicInputs,
)
from zkvm.fhe import LweParameters, ServerKey
from zkvm.isa import Program, ProgramInputs
from zkvm.prover import wire
from zkvm.prover.options import ProofOptions
from zkvm.prover.pipeline import NUM_COMP_COLUMNS
from zkvm.prover.transcript import RandomCoin
from zkvm.hash.blake3 import hash_elements

PROGRAM = "read2\nread\nsadd\npush.1\npush.2\nadd\nsmul"
KEY_SEED = 7
A, B, CLEAR_X = 1, 3, 2


def main():
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(KEY_SEED)
    )
    program = Program.compile(PROGRAM)
    x = key.encrypt(CLEAR_X)
    inputs = ProgramInputs((A, B), (x,), key)
    hash_, output, proof = vm.prove(program, inputs)
    pub = PublicInputs(hash_, output, key)

    options = ProofOptions()
    t_len = proof.trace_length
    d = t_len * options.blowup

    # ---- transcript replay, recording every value ---------------------
    seed_elements = wire.coin_seed(t_len, TRACE_WIDTH, options, pub)
    coin = RandomCoin(seed_elements)
    record = {
        "description": "reference e2e program (vm/src/lib.rs:47-99) conformance vectors",
        "program_source": PROGRAM,
        "program_padded": [str(op) for op in program.code],
        "lwe_params": {"p": 8, "q": 128, "k": 4, "std": 2.412390240121573e-5},
        "key_seed_note": "ServerKey(params, random.Random(7)); see zkvm/fhe/lwe.py",
        "secret_key_bits": list(key.key),
        "ciphertext_x": [str(v) for v in x.ciphertext],
        "public_inputs_tape": [A, B],
        "program_hash": [str(v) for v in hash_],
        "stack_outputs": [str(v) for v in output],
        "trace_length": t_len,
        "lde_domain_size": d,
        "context_bytes_hex": wire.context_bytes(t_len, TRACE_WIDTH, options).hex(),
        "context_elements": [str(v) for v in
                             wire.context_elements(t_len, TRACE_WIDTH, options)],
        "pub_input_elements": [str(v) for v in pub.to_elements()],
        "seed_elements": [str(v) for v in seed_elements],
        "seed_digest_hex": hash_elements(seed_elements).hex(),
    }

    coin.reseed(proof.trace_root)
    record["trace_root_hex"] = proof.trace_root.hex()
    record["transition_coefficients"] = [
        str(v) for v in coin.draw_elements(NUM_TRANSITION_CONSTRAINTS)
    ]
    record["boundary_coefficients"] = [
        str(v) for v in coin.draw_elements(NUM_ASSERTIONS)
    ]
    coin.reseed(proof.comp_root)
    record["comp_root_hex"] = proof.comp_root.hex()
    record["z"] = str(coin.draw())
    coin.reseed_with_elements(list(proof.ood_trace_cur) + list(proof.ood_trace_nxt))
    record["ood_trace_cur"] = [str(v) for v in proof.ood_trace_cur]
    record["ood_trace_nxt"] = [str(v) for v in proof.ood_trace_nxt]
    coin.reseed_with_elements(list(proof.ood_comp))
    record["ood_comp"] = [str(v) for v in proof.ood_comp]
    record["deep_trace_coefficients"] = [
        str(v) for v in coin.draw_elements(TRACE_WIDTH)
    ]
    record["deep_constraint_coefficients"] = [
        str(v) for v in coin.draw_elements(NUM_COMP_COLUMNS)
    ]
    record["fri_roots_hex"] = [r.hex() for r in proof.fri_roots]
    record["fri_alphas"] = []
    for root in proof.fri_roots:
        coin.reseed(root)
        record["fri_alphas"].append(str(coin.draw()))
    coin.reseed_with_elements(list(proof.fri_remainder))
    record["fri_remainder"] = [str(v) for v in proof.fri_remainder]
    record["pow_nonce"] = proof.pow_nonce
    drawn = coin.draw_integers(options.num_queries, d, proof.pow_nonce)
    record["query_positions_drawn"] = drawn
    record["query_positions_unique_sorted"] = sorted(set(drawn))

    # ---- proof bytes + section offset map -----------------------------
    data = proof.to_wire_bytes()
    record["proof_bytes_hex"] = data.hex()
    record["proof_byte_length"] = len(data)

    # offsets: context | num_unique | commitments | trace q | comp q |
    #          ood | fri | nonce
    sections = {}
    off = 0
    clen = len(wire.context_bytes(t_len, TRACE_WIDTH, options))
    sections["context"] = [off, off + clen]; off += clen
    sections["num_unique_queries"] = [off, off + 1]; off += 1
    n_commit = 2 + len(proof.fri_roots)
    sections["commitments"] = [off, off + 2 + 32 * n_commit]
    off += 2 + 32 * n_commit
    for name in ("trace_queries", "constraint_queries"):
        start = off
        plen = int.from_bytes(data[off:off + 4], "little"); off += 4 + plen
        vlen = int.from_bytes(data[off:off + 4], "little"); off += 4 + vlen
        sections[name] = [start, off]
    start = off
    slen = int.from_bytes(data[off:off + 2], "little"); off += 2 + slen
    elen = int.from_bytes(data[off:off + 2], "little"); off += 2 + elen
    sections["ood_frame"] = [start, off]
    start = off
    off += 1
    for _ in range(len(proof.fri_roots)):
        vlen = int.from_bytes(data[off:off + 4], "little"); off += 4 + vlen
        plen = int.from_bytes(data[off:off + 4], "little"); off += 4 + plen
    rlen = int.from_bytes(data[off:off + 2], "little"); off += 2 + rlen
    off += 1  # num_partitions
    sections["fri_proof"] = [start, off]
    sections["pow_nonce"] = [off, off + 8]; off += 8
    assert off == len(data), (off, len(data))
    record["proof_sections"] = sections

    out_dir = os.path.join(os.path.dirname(__file__), "..", "conformance")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "vectors_e2e.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out} ({len(data)} proof bytes)")


if __name__ == "__main__":
    main()

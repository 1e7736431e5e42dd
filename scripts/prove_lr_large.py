"""Large-scale linear-regression prove: BASELINE.md config 5.

Builds an n-term dot-product-over-encrypted-inputs program (the
``examples/linear_regression/lr.txt`` block repeated: read2/read/smul/add2
chains closed by read/sadd — reference examples/linear_regression/lr.txt),
sized so the execution trace reaches the requested power-of-two length,
then proves + verifies end to end and reports per-phase wall-clock.

Usage: python scripts/prove_lr_large.py [log2_rows]   (default 20)
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zkvm.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from zkvm.air.layout import PublicInputs
from zkvm.fhe import FheUInt8, LweParameters, ServerKey
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor
from zkvm.prover import prove as stark_prove
from zkvm.runtime import NativeProcessor, native_available
from zkvm.utils.profiler import profiler
from zkvm.verifier import verify as stark_verify


def build_program(n_terms: int) -> str:
    """Dot product of n_terms encrypted features with public weights."""
    ops = ["read2", "read", "smul"]
    for _ in range(n_terms - 1):
        ops += ["read2", "read", "smul", "add2"]
    ops += ["read", "sadd"]
    return "\n".join(ops)


def main():
    log2_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    # Reference trace sizing (vm/src/processor/mod.rs:71-79): the chiplet
    # capacity starts at 16 and DOUBLES when clk reaches it, and the trace
    # length is next_pow2(capacity + 1) — i.e. 2 * next_pow2(clk).  To land
    # on a 2^k-row trace the padded program (16/14 NOOP cycle overhead)
    # must fit in (2^(k-2), 2^(k-1)] clock steps; 4 real ops per term.
    max_ops = 7 * 2 ** (log2_rows - 1) // 8
    n_terms = (max_ops - 1) // 4 - 8  # small safety margin below the edge
    params = LweParameters(8, 128, 4, 2.412390240121573e-5)
    key = ServerKey(params, random.Random(2026))

    rng = random.Random(7)
    weights = [rng.randrange(8) for _ in range(n_terms)]
    bias = rng.randrange(8)
    features = [rng.randrange(2) for _ in range(n_terms)]

    t0 = time.time()
    cts = tuple(key.encrypt(x) for x in features)
    print(f"encrypt {n_terms} features: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    program = Program.compile(build_program(n_terms))
    print(f"compile {4*n_terms+2} ops: {time.time()-t0:.1f}s", flush=True)

    inputs = ProgramInputs(tuple(weights) + (bias,), cts, key)
    t0 = time.time()
    if native_available():
        trace = NativeProcessor.run(program, inputs)
    else:
        trace = Processor.run(program, inputs).trace()
    print(f"trace gen ({trace.length} rows): {time.time()-t0:.1f}s", flush=True)
    assert trace.length == 2 ** log2_rows, trace.length
    pub = PublicInputs(program.hash, trace.outputs, key)

    t0 = time.time()
    proof = stark_prove(trace, pub)
    print(f"warm-up prove (incl. compile): {time.time()-t0:.1f}s", flush=True)

    profiler.enable()
    t0 = time.time()
    proof = stark_prove(trace, pub)
    total = time.time() - t0
    profiler.report()
    profiler.disable()
    print(
        f"steady-state prove: {total:.2f}s ({trace.length/total:,.0f} rows/s)",
        flush=True,
    )

    # client-side result recovery + verification
    clear = key.decrypt(FheUInt8(list(proof_output(trace))))
    # decrypt rounds by delta then truncates to a byte (server_key.rs:64-76)
    expected = (bias + sum(w * x for w, x in zip(weights, features))) & 0xFF
    assert clear == expected, (clear, expected)
    t0 = time.time()
    stark_verify(proof, pub)
    print(f"verify: {time.time()-t0:.2f}s; decrypted result {clear} == {expected}")


def proof_output(trace):
    return trace.outputs[:5]


if __name__ == "__main__":
    main()

"""Per-phase prover profiling on the current JAX backend.

Usage: python scripts/profile_prove.py [n_ops]
Prints the profiler phase report for a steady-state prove (second run).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zkvm.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from zkvm.air.layout import PublicInputs
from zkvm.fhe import LweParameters, ServerKey
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor
from zkvm.prover import prove as stark_prove
from zkvm.runtime import NativeProcessor, native_available
from zkvm.utils.profiler import profiler


def main():
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    key = ServerKey(LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(3))
    ops = ["read"] + ["read", "add"] * ((n_ops - 1) // 2)
    program = Program.compile("\n".join(ops))
    inputs = ProgramInputs(tuple([1] * (n_ops // 2 + 2)), (), key)
    t0 = time.time()
    if native_available():
        trace = NativeProcessor.run(program, inputs)
    else:
        trace = Processor.run(program, inputs).trace()
    print(f"trace gen ({trace.length} rows): {time.time()-t0:.3f}s")
    pub = PublicInputs(program.hash, trace.outputs, key)

    t0 = time.time()
    stark_prove(trace, pub)
    print(f"warm-up prove: {time.time()-t0:.1f}s")

    profiler.enable()
    t0 = time.time()
    stark_prove(trace, pub)
    total = time.time() - t0
    profiler.report()
    print(f"steady-state prove: {total:.3f}s  ({trace.length/total:,.0f} rows/s)")


if __name__ == "__main__":
    main()

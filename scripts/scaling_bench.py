"""Per-phase prover timings at 1/2/4/8 virtual devices + collective counts.

SURVEY §2.3 P2/P5 evidence: runs the REAL prover (zkvm.prover.prove) over
row-sharded meshes of 1/2/4/8 virtual CPU devices on one trace, records
per-phase wall-clock from the profiler, asserts byte-identical proofs
across mesh sizes, and counts the XLA collectives (all-to-all / all-reduce
/ all-gather / collective-permute) in each compiled sharded module.

CPU-mesh numbers are *scaling-shape* evidence (collective structure, phase
breakdown), not absolute perf — the absolute numbers live in PERF.md from
the real chip.  Usage:

    python scripts/scaling_bench.py [log2_trace_len (default 10)]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import random

    from zkvm.air.layout import PublicInputs
    from zkvm.dist import make_mesh
    from zkvm.fhe import LweParameters, ServerKey
    from zkvm.isa import Program, ProgramInputs
    from zkvm.prover import prove as stark_prove
    from zkvm.runtime import NativeProcessor, native_available
    from zkvm.processor import Processor
    from zkvm.utils.profiler import profiler

    log2t = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_ops = (1 << log2t) - 6  # leave room for padding to exactly 2^log2t
    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(3)
    )
    ops = ["read"] + ["read", "add"] * ((n_ops - 1) // 2)
    program = Program.compile("\n".join(ops))
    inputs = ProgramInputs(tuple([1] * (n_ops // 2 + 2)), (), key)
    if native_available():
        trace = NativeProcessor.run(program, inputs)
    else:
        trace = Processor.run(program, inputs).trace()
    pub = PublicInputs(program.hash, trace.outputs, key)
    print(f"# trace length {trace.length}", file=sys.stderr)

    results = {}
    reference_bytes = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        # warm-up/compile pass, then a measured pass
        proof = stark_prove(trace, pub, mesh=mesh)
        if reference_bytes is None:
            reference_bytes = proof.to_bytes()
        else:
            assert proof.to_bytes() == reference_bytes, (
                f"proof bytes diverged at {n_dev} devices"
            )
        profiler.enable()
        profiler.phases.clear()
        t0 = time.time()
        stark_prove(trace, pub, mesh=mesh)
        total = time.time() - t0
        phases = {p.name: round(p.seconds, 4) for p in profiler.phases}
        profiler.disable()
        results[n_dev] = {"total_s": round(total, 3), "phases": phases}
        print(
            json.dumps(
                {
                    "devices": n_dev,
                    "trace_rows": trace.length,
                    "total_s": round(total, 3),
                    "rows_per_sec": round(trace.length / total, 1),
                    "phases": phases,
                    "proof_bytes_identical": True,
                }
            )
        )

    # collective counts: lower the sharded stages and count collective ops
    # in the optimized HLO of the 8-device compile
    from zkvm.dist.ntt_dist import ntt_sharded
    import jax.numpy as jnp
    import numpy as np
    from zkvm.field import jax_f128 as jf

    mesh = make_mesh(8)
    n = trace.length * 8
    x = jnp.asarray(
        np.asarray(jf.to_limbs([[1] * n])), dtype=jnp.uint32
    )
    compiled = (
        jax.jit(lambda v: ntt_sharded(v, mesh)).lower(x).compile()
    )
    hlo = compiled.as_text()
    counts = {
        op: hlo.count(op)
        for op in ("all-to-all", "all-reduce", "all-gather", "collective-permute")
    }
    print(json.dumps({"module": "ntt_sharded_8dev", "collectives": counts}))


if __name__ == "__main__":
    main()

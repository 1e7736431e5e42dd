"""Top-level API: run + prove + verify a program (vm/src/lib.rs:13-29 parity).

``prove(program, inputs)`` executes the program, generates the 28-column
trace, and produces a STARK proof with the reference parameter preset
(32 queries, blowup 8, grinding 0, FRI fold 8, remainder degree <= 127).
Returns ``(program_hash, stack_outputs[16], Proof)``.
"""

from __future__ import annotations

from typing import Tuple

from zkvm.air.layout import PublicInputs
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor
from zkvm.prover import Proof, ProofOptions, prove as stark_prove
from zkvm.utils.profiler import profiler
from zkvm.verifier import verify as stark_verify, VerificationError


def prove(
    program: Program,
    inputs: ProgramInputs,
    options: ProofOptions = ProofOptions(),
    use_native: bool = True,
) -> Tuple[tuple, tuple, Proof]:
    from zkvm.runtime import NativeProcessor, native_available

    with profiler.phase("trace_gen"):
        if use_native and native_available():
            trace = NativeProcessor.run(program, inputs)
        else:
            trace = Processor.run(program, inputs).trace()
    output = trace.outputs
    pub = PublicInputs(program.hash, output, inputs.server_key)
    proof = stark_prove(trace, pub, options)
    return program.hash, output, proof


def verify(
    proof: Proof,
    program_hash: tuple,
    stack_outputs: tuple,
    server_key,
    min_security: int = 95,
):
    """Raises :class:`VerificationError` when the proof does not check out."""
    pub = PublicInputs(tuple(program_hash), tuple(stack_outputs), server_key)
    stark_verify(proof, pub, min_security)

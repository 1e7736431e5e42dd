"""Top-level API: run + prove + verify a program (vm/src/lib.rs:13-29 parity).

``prove(program, inputs)`` executes the program, generates the 28-column
trace, and produces a STARK proof with the reference parameter preset
(32 queries, blowup 8, grinding 0, FRI fold 8, remainder degree <= 127).
Returns ``(program_hash, stack_outputs[16], Proof)``.

Deployment knobs come from one typed :class:`zkvm.config.ZkVmConfig`
(SURVEY.md section 5 — the reference hardcodes all parameters at call
sites): proof options, native-vs-python trace generation, profiler,
randomizer-row seed, and mesh shape for the sharded prover.
"""

from __future__ import annotations

from typing import Optional, Tuple

from zkvm.air.layout import PublicInputs
from zkvm.config import ZkVmConfig
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor
from zkvm.prover import Proof, ProofOptions, prove as stark_prove
from zkvm.utils.profiler import profiler
from zkvm.verifier import verify as stark_verify, VerificationError

_DEFAULT_SEED = 0xD15EA5E


def prove(
    program: Program,
    inputs: ProgramInputs,
    options: Optional[ProofOptions] = None,
    use_native: Optional[bool] = None,
    config: Optional[ZkVmConfig] = None,
) -> Tuple[tuple, tuple, Proof]:
    """Prove; explicit ``options``/``use_native`` override the config."""
    from zkvm.runtime import NativeProcessor, native_available

    cfg = config or ZkVmConfig()
    if options is None:
        options = cfg.proof
    if use_native is None:
        use_native = cfg.runtime.use_native_trace
    seed = cfg.runtime.seed if cfg.runtime.seed is not None else _DEFAULT_SEED
    if cfg.runtime.profile:
        profiler.enable()

    mesh = None
    if cfg.mesh.rows > 1:
        from zkvm.dist import make_mesh

        mesh = make_mesh(cfg.mesh.rows, axis=cfg.mesh.axis_name)

    with profiler.phase("trace_gen"):
        if use_native and native_available():
            trace = NativeProcessor.run(program, inputs, seed=seed)
        else:
            trace = Processor.run(program, inputs).trace(seed=seed)
    output = trace.outputs
    pub = PublicInputs(program.hash, output, inputs.server_key)
    proof = stark_prove(trace, pub, options, mesh=mesh)
    return program.hash, output, proof


def verify(
    proof: Proof,
    program_hash: tuple,
    stack_outputs: tuple,
    server_key,
    min_security: Optional[int] = None,
    config: Optional[ZkVmConfig] = None,
):
    """Raises :class:`VerificationError` when the proof does not check out."""
    if min_security is None:
        min_security = (config or ZkVmConfig()).min_security
    pub = PublicInputs(tuple(program_hash), tuple(stack_outputs), server_key)
    stark_verify(proof, pub, min_security)


def verify_bytes(
    proof_bytes: bytes,
    program_hash: tuple,
    stack_outputs: tuple,
    server_key,
    min_security: Optional[int] = None,
    config: Optional[ZkVmConfig] = None,
):
    """Verify a proof in the winterfell wire format (the byte shape the
    reference's client hands to winterfell::verify, main.rs:85)."""
    from zkvm.verifier import verify_bytes as stark_verify_bytes

    if min_security is None:
        min_security = (config or ZkVmConfig()).min_security
    pub = PublicInputs(tuple(program_hash), tuple(stack_outputs), server_key)
    stark_verify_bytes(proof_bytes, pub, min_security)

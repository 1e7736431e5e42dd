"""Typed config + profiler subsystems (SURVEY.md section 5)."""

import random

from zkvm.config import REFERENCE_CONFIG, ZkVmConfig, from_env
from zkvm.utils.profiler import Profiler


def test_reference_preset_matches_baseline():
    # BASELINE.md: 32 queries, blowup 8, grinding 0, fold 8, remainder <=127
    p = REFERENCE_CONFIG.proof
    assert (p.num_queries, p.blowup, p.grinding_factor) == (32, 8, 0)
    assert (p.fri_folding_factor, p.fri_remainder_max_degree) == (8, 127)
    # LWE demo params p=8 q=128 k=4 (main.rs:34-38); delta = q/p * scaling
    lwe = REFERENCE_CONFIG.lwe
    assert (lwe.plaintext_modulus, lwe.ciphertext_modulus, lwe.k) == (8, 128, 4)
    assert REFERENCE_CONFIG.min_security == 95


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("ZKVM_PROFILE", "1")
    monkeypatch.setenv("ZKVM_MESH_ROWS", "4")
    cfg = from_env()
    assert cfg.runtime.profile
    assert cfg.mesh.rows == 4
    monkeypatch.setenv("ZKVM_NATIVE", "0")
    assert not from_env().runtime.use_native_trace


def test_profiler_collects_phases():
    prof = Profiler()
    prof.enable()
    with prof.phase("alpha", rows=1000):
        sum(range(10000))
    with prof.phase("alpha", rows=1000):
        pass
    with prof.phase("beta"):
        pass
    prof.disable()
    assert len(prof.phases) == 3
    assert prof.phases[0].rows_per_sec > 0
    totals = prof.totals()
    assert set(totals) == {"alpha", "beta"}
    assert "alpha" in prof.report()


def test_profiled_prove_records_pipeline_phases():
    from zkvm import vm
    from zkvm.fhe import LweParameters, ServerKey
    from zkvm.isa import Program, ProgramInputs
    from zkvm.utils.profiler import profiler

    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(1)
    )
    profiler.enable()
    try:
        vm.prove(Program.compile("push.1\npush.2\nadd"), ProgramInputs((), (), key))
    finally:
        names = {p.name for p in profiler.phases}
        profiler.disable()
    assert {
        "trace_gen",
        "trace_lde_commit",
        "constraint_eval",
        "composition_commit",
        "deep_composition",
        "fri",
    } <= names

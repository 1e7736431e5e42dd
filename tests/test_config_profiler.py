"""Typed config + profiler subsystems (SURVEY.md section 5)."""

import random

import pytest

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


def _knob_fixture():
    from zkvm.fhe import LweParameters, ServerKey
    from zkvm.isa import Program, ProgramInputs

    key = ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(1)
    )
    program = Program.compile("push.1\npush.2\nadd")
    return key, program, ProgramInputs((), (), key)


def test_config_knobs_drive_vm_prove():
    """Every ZkVmConfig knob must change vm.prove behavior (VERDICT r1 #8).

    The knobs that need their own full-pipeline XLA compile (mesh.rows,
    grinding_factor) live in :func:`test_config_mesh_and_grinding_knobs`
    (slow); this default-set half reuses the T=32 class-prover compile the
    rest of the suite already pays for.
    """
    from zkvm import vm
    from zkvm.config import RuntimeConfig
    from zkvm.utils.profiler import profiler

    key, program, inputs = _knob_fixture()

    # runtime.seed drives the randomizer row -> different proof bytes
    cfg_a = ZkVmConfig(runtime=RuntimeConfig(seed=1, profile=False))
    cfg_b = ZkVmConfig(runtime=RuntimeConfig(seed=2, profile=False))
    _, _, pa = vm.prove(program, inputs, config=cfg_a)
    _, _, pb = vm.prove(program, inputs, config=cfg_b)
    _, _, pa2 = vm.prove(program, inputs, config=cfg_a)
    assert pa.to_bytes() != pb.to_bytes()  # seed changes the proof
    assert pa.to_bytes() == pa2.to_bytes()  # and deterministically so

    # runtime.profile enables the profiler
    profiler.disable()
    profiler.phases.clear()
    cfg_p = ZkVmConfig(runtime=RuntimeConfig(seed=1, profile=True))
    vm.prove(program, inputs, config=cfg_p)
    try:
        assert {p.name for p in profiler.phases} >= {"trace_gen", "fri"}
        assert profiler.enabled
    finally:
        profiler.disable()


@pytest.mark.slow  # each knob forces a fresh full-pipeline XLA compile
def test_config_mesh_and_grinding_knobs():
    import dataclasses

    from zkvm import vm
    from zkvm.config import MeshConfig, RuntimeConfig

    key, program, inputs = _knob_fixture()
    cfg_a = ZkVmConfig(runtime=RuntimeConfig(seed=1, profile=False))
    _, _, pa = vm.prove(program, inputs, config=cfg_a)

    # mesh.rows=8 shards the prover; same seed -> identical bytes
    cfg_m = ZkVmConfig(
        runtime=RuntimeConfig(seed=1, profile=False), mesh=MeshConfig(rows=8)
    )
    _, _, pm = vm.prove(program, inputs, config=cfg_m)
    assert pm.to_bytes() == pa.to_bytes()

    # proof options flow through (grinding_factor=4 -> prover grinds a
    # nonce the verifier accepts)
    opts = dataclasses.replace(ZkVmConfig().proof, grinding_factor=4)
    cfg_g = ZkVmConfig(
        proof=opts, runtime=RuntimeConfig(seed=1, profile=False)
    )
    hash_, out, pg = vm.prove(program, inputs, config=cfg_g)
    assert pg.grinding_factor == 4
    vm.verify(pg, hash_, out, key)


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

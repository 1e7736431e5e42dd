"""AIR golden tests: valid traces satisfy all constraints (air/src/tests mirror)."""

import random

from zkvm.air import CYCLE_MASK, PublicInputs, get_assertions
from zkvm.air.constraints_golden import evaluate_transition, selectors, opcode_to_element
from zkvm.fhe import LweParameters, ServerKey
from zkvm.hash.rescue import ARK
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor


def make_key(seed=7):
    return ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(seed)
    )


def run_trace(source, public=(), secret=(), key=None):
    key = key or make_key()
    program = Program.compile(source)
    inputs = ProgramInputs(public=public, secret=secret, server_key=key)
    proc = Processor.run(program, inputs)
    return proc.trace(), key, program


def assert_all_transitions_zero(trace, delta):
    t = trace.length
    for i in range(t - 2):  # steps 0..T-3 enforced (2 exemptions)
        cur, nxt = trace.row(i), trace.row(i + 1)
        res = evaluate_transition(
            cur, nxt, CYCLE_MASK[i % 16], ARK[i % 16], delta
        )
        assert res == [0] * 20, f"constraint violated at step {i}: {res}"


def test_scalar_program_satisfies_constraints():
    trace, key, _ = run_trace("push.1\npush.2\nadd")
    assert_all_transitions_zero(trace, key.parameters.delta)


def test_mul_read_program_satisfies_constraints():
    trace, key, _ = run_trace("read\nread\nmul\npush.7\nadd", public=(3, 5))
    assert_all_transitions_zero(trace, key.parameters.delta)


def test_fhe_program_satisfies_constraints():
    key = make_key()
    x = key.encrypt(2)
    y = key.encrypt(3)
    trace, key, _ = run_trace(
        "read2\nread\nsmul\nread2\nread\nsmul\nadd2\nread\nsadd",
        public=(3, 4, 1),
        secret=(x, y),
        key=key,
    )
    assert_all_transitions_zero(trace, key.parameters.delta)


def test_boundary_assertions_hold():
    trace, key, program = run_trace("push.1\npush.2\nadd")
    pub = PublicInputs(program.hash, trace.outputs, key)
    for col, step, value in get_assertions(pub, trace.length):
        assert trace.columns[col][step] == value, (col, step, value)


def test_selectors_one_hot():
    # each opcode's decoder bits activate exactly its selector
    from zkvm.isa.opcodes import OpCode

    for op in OpCode:
        cur = [0] * 28
        for i in range(5):
            cur[1 + i] = (int(op) >> i) & 1
        sel = selectors(cur)
        name = op.name.lower()
        for k in ["add", "sadd", "add2", "mul", "smul", "push", "read", "read2", "noop"]:
            assert sel[k] == (1 if k == name else 0), (name, k)
        assert opcode_to_element(cur) == int(op)


def test_constraint_catches_bad_add():
    trace, key, _ = run_trace("push.1\npush.2\nadd")
    # corrupt the post-add stack value
    bad = [list(c) for c in trace.columns]
    # add executes at clk 10 (push aligned at 0 and 8) — find it via bits
    for i in range(trace.length - 2):
        cur = trace.row(i)
        if selectors(cur)["add"] == 1:
            nxt = list(trace.row(i + 1))
            nxt[12] = (nxt[12] + 1) % (2**128 - 45 * 2**40 + 1)
            res = evaluate_transition(cur, nxt, CYCLE_MASK[i % 16], ARK[i % 16], key.parameters.delta)
            assert res[3] != 0
            return
    raise AssertionError("no add op found in trace")

"""Trace generator tests mirroring vm/src/processor/tests/ in the reference."""

import random

import pytest

from zkvm.field import f128
from zkvm.fhe import LweParameters, ServerKey
from zkvm.hash.rescue import Rescue128
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor, StackError, ChipletsError


def make_key(seed=7):
    return ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(seed)
    )


def run(source, public=(), secret=(), key=None):
    key = key or make_key()
    program = Program.compile(source)
    inputs = ProgramInputs(public=public, secret=secret, server_key=key)
    return Processor.run(program, inputs), program, key


def test_trace_row31_matches_reference_layout():
    # mirror of vm/src/processor/tests/mod.rs:19-43
    proc, program, _ = run("push.5\npush.3\nadd")
    trace = proc.trace()
    assert trace.length == 64  # capacity 32 (doubled at clk=16) + 1 → pow2
    assert trace.width == 28
    row = trace.row(31)
    assert row[0] == 31  # clk
    assert row[1:6] == [0, 0, 0, 0, 0]  # decoder bits zero after program end
    assert row[6] == 0  # hash flag zero after program end
    assert tuple(row[7:9]) == program.hash  # sponge rate = program hash
    assert row[9:11] == [0, 0]  # capacity lanes reset at cycle steps 14-15
    assert row[11] == 1  # depth
    assert row[12] == 8  # 5 + 3


def test_trace_last_row_randomized_nonzero():
    proc, _, _ = run("push.5\npush.3\nadd")
    trace = proc.trace()
    last = trace.row(trace.length - 1)
    assert all(v != 0 for v in last)
    # deterministic for a fixed seed
    trace2 = Processor.run(
        Program.compile("push.5\npush.3\nadd"),
        ProgramInputs((), (), make_key()),
    ).trace()
    assert trace2.row(trace2.length - 1) == last


def test_clock_column_increments():
    proc, _, _ = run("push.1\npush.2\nadd")
    trace = proc.trace()
    assert trace.columns[0][:-1] == list(range(trace.length - 1))


def test_decoder_bits_little_endian():
    # read = 0b10001 → bits 0 and 4 at columns 1 and 5
    proc, _, _ = run("read\nread\nadd", public=(1, 2))
    trace = proc.trace()
    assert [trace.columns[1 + i][0] for i in range(5)] == [1, 0, 0, 0, 1]
    # add executes at clk 3 → bits at row 2: add = 0b01000 → bit3
    assert [trace.columns[1 + i][2] for i in range(5)] == [0, 0, 0, 1, 0]


def test_stack_add_mul():
    proc, _, _ = run("push.5\npush.3\nmul")
    assert proc.output()[0] == 15
    proc, _, _ = run("push.5\npush.3\nadd\npush.2\nmul")
    assert proc.output()[0] == 16


def test_read_pops_in_order():
    proc, _, _ = run("read\nread\nadd", public=(3, 12))
    assert proc.output()[0] == 15
    assert proc.output()[1] == 0


def test_read2_pushes_ciphertext():
    key = make_key()
    x = key.encrypt(33)
    proc, _, _ = run("read2", secret=(x,), key=key)
    assert proc.output()[:5] == tuple(x.ciphertext)
    # depth accounts 5 slots
    trace = proc.trace()
    assert trace.columns[11][1] == 5


def test_sadd_smul_add2_match_serverkey():
    key = make_key()
    x = key.encrypt(33)
    y = key.encrypt(7)

    proc, _, _ = run("read2\npush.3\nsadd", secret=(x,), key=key)
    want = key.scalar_add(3, x)
    assert proc.output()[:5] == tuple(want.ciphertext)
    assert key.decrypt(want) == 36

    proc, _, _ = run("read2\npush.3\nsmul", secret=(x,), key=key)
    want = key.scalar_mul(3, x)
    assert proc.output()[:5] == tuple(want.ciphertext)

    proc, _, _ = run("read2\nread2\nadd2", secret=(x, y), key=key)
    want = key.add(y, x)  # second read2 pushes y on top
    assert proc.output()[:5] == tuple(want.ciphertext)
    assert key.decrypt(want) == 40


def test_stack_underflow():
    with pytest.raises(StackError):
        run("push.1\nadd")


def test_empty_inputs():
    with pytest.raises(StackError):
        run("read")
    with pytest.raises(StackError):
        run("read2")


def test_stack_overflow():
    src = "\n".join(["push.1"] * 17)
    with pytest.raises(StackError):
        run(src)


def test_sponge_trace_matches_independent_rescue():
    proc, program, _ = run("push.5\npush.3\nadd")
    trace = proc.trace()
    sponge = Rescue128()
    for i, op in enumerate(program.code):
        sponge.update(op.code, op.value)
        for lane in range(4):
            assert trace.columns[7 + lane][i + 1] == sponge.state[lane]


def test_hash_flag_one_during_program():
    proc, program, _ = run("push.5\npush.3\nadd")
    trace = proc.trace()
    n = len(program.code)
    assert trace.columns[6][:n] == [1] * n
    assert all(v == 0 for v in trace.columns[6][n:-1])


def test_output_final_stack_state():
    proc, _, _ = run("push.1\npush.2\nadd")
    out = proc.output()
    assert out[0] == 3 and all(v == 0 for v in out[1:])

"""Native C++ trace generator vs the Python golden processor."""

import random

import numpy as np
import pytest

from zkvm.fhe import LweParameters, ServerKey
from zkvm.field.jax_f128 import from_limbs
from zkvm.isa import Program, ProgramInputs
from zkvm.processor import Processor, StackError
from zkvm.runtime import NativeProcessor, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native trace generator not built"
)


def make_key(seed=7):
    return ServerKey(
        LweParameters(8, 128, 4, 2.412390240121573e-5), random.Random(seed)
    )


def both(source, public=(), secret=(), key=None):
    key = key or make_key()
    program = Program.compile(source)
    inputs = ProgramInputs(public, secret, key)
    golden = Processor.run(program, inputs).trace()
    native = NativeProcessor.run(program, inputs)
    return golden, native


def assert_equal_traces(golden, native):
    assert native.length == golden.length
    got = from_limbs(np.asarray(native.as_limbs()))
    for c in range(28):
        for r in range(golden.length):
            assert int(got[c][r]) == golden.columns[c][r], (c, r)
    assert native.outputs == golden.outputs
    assert native.program_hash == golden.program_hash


def test_scalar_program_identical():
    golden, native = both("push.1\npush.2\nadd")
    assert_equal_traces(golden, native)


def test_mul_read_program_identical():
    golden, native = both("read\nread\nmul\npush.7\nadd", public=(3, 5))
    assert_equal_traces(golden, native)


def test_fhe_program_identical():
    key = make_key()
    x = key.encrypt(2)
    y = key.encrypt(3)
    golden, native = both(
        "read2\nread\nsmul\nread2\nread\nsmul\nadd2\nread\nsadd",
        public=(3, 4, 1),
        secret=(x, y),
        key=key,
    )
    assert_equal_traces(golden, native)


def test_larger_program_identical():
    ops = ["read"] + ["read", "add"] * 40 + ["push.3", "mul"]
    golden, native = both("\n".join(ops), public=tuple([1] * 60))
    assert_equal_traces(golden, native)


def test_native_error_paths():
    key = make_key()
    program = Program.compile("read")
    with pytest.raises(StackError):
        NativeProcessor.run(program, ProgramInputs((), (), key))
    program = Program.compile("add")
    with pytest.raises(StackError):
        NativeProcessor.run(program, ProgramInputs((), (), key))

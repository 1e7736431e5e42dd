"""ISA layer: opcode definitions and the assembler (host-side, cheap)."""

from .opcodes import OpCode, Operation
from .program import Program, ProgramError, ProgramInputs

__all__ = ["OpCode", "Operation", "Program", "ProgramError", "ProgramInputs"]

"""zkvm: a TPU-native zkVM proving stack.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``Encrypt-zkVM`` Rust workspace (see SURVEY.md): a stack-machine VM with
homomorphic (LWE) ciphertext instructions, a 28-column execution trace, and a
zk-STARK (f128 field, Rescue-Prime program hash, Blake3 Merkle commitments,
FRI) proving correct execution.

Layer map (mirrors SURVEY.md section 7):

  field/      f128 limb arithmetic: Python golden model + batched JAX/TPU ops
  hash/       Rescue-Prime sponge, Blake3-256, Merkle trees
  fhe/        LWE scheme over the STARK field (client + in-trace ops)
  isa/        opcodes + assembler (host-side, cheap)
  processor/  trace generation (native C++ fast path, Python golden)
  air/        the 20 transition + 22 boundary constraint system
  ntt/        batched radix-2 NTT / coset LDE
  prover/     STARK pipeline: commit, compose, DEEP, FRI, Fiat-Shamir
  verifier/   independent verifier (full cryptographic checks)
  dist/       multi-chip sharding (mesh, collective NTT/Merkle/FRI)
"""

__version__ = "0.1.0"

"""Ambient NTT constants: keep O(N) twiddle tables out of jitted graphs.

Twiddle tables and layout-permutation indices are functions of the
transform size only, but they were historically fetched at *trace* time
inside the jitted prover stages, so XLA embedded them as module literals.
At T=2^16 that put ~140 MB of constant data into the stage modules; at
T=2^20 the composition-commit module (which owns a size-D=2^23 iNTT whose
mid-twiddle tensor alone is 256 MB) exceeded the tunneled TPU platform's
remote-compile request limit outright (HTTP 413, round-5 run of
scripts/prove_lr_large.py) — the module could not even be submitted.

The fix is the standard JAX idiom: pass the tables as *arguments*.  To
avoid threading a parameter through every internal call layer, the stage
jits install their constant dict here (a contextvar) for the duration of
tracing; :func:`fetch` returns the ambient (traced) array when the key is
provided and falls back to the legacy eager builder otherwise, so eager
callers (tests, the verifier, probes) are unaffected.

Keys are strings like ``nt.mid:{n}:{inverse}:{scaled}`` — see
``ntt_t.mid_consts`` and ``ntt_jax.table_consts`` for the builders.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Callable, Dict

_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "zkvm_ntt_consts", default=None
)


@contextlib.contextmanager
def provide(consts: Dict[str, object]):
    """Install `consts` for fetch() during this (tracing) scope."""
    token = _CTX.set(consts)
    try:
        yield
    finally:
        _CTX.reset(token)


def fetch(key: str, builder: Callable[[], object]):
    """Ambient array for `key`, or `builder()` (legacy eager bake)."""
    amb = _CTX.get()
    if amb is not None and key in amb:
        return amb[key]
    return builder()

"""Per-phase prover instrumentation (SURVEY.md section 5, net-new).

The reference has an inert ``tracing`` dependency and no subscriber; here the
prover phases (trace-gen, LDE+commit, constraint eval, composition commit,
DEEP, FRI, query assembly) report wall-clock and rows/sec through a process
-wide :class:`Profiler`.  Disabled (the default) it costs one attribute check
per phase; enabled it blocks on device results at phase boundaries so the
numbers are honest device times, and can also wrap everything in a JAX
profiler trace for XLA-level inspection (``ZKVM_PROFILE_DIR``).

Usage::

    from zkvm.utils.profiler import profiler
    profiler.enable()
    ... prove ...
    profiler.report()   # or profiler.phases for raw numbers
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class PhaseStat:
    name: str
    seconds: float
    rows: Optional[int] = None
    live_bytes: Optional[int] = None

    @property
    def rows_per_sec(self) -> Optional[float]:
        if self.rows is None or self.seconds == 0:
            return None
        return self.rows / self.seconds


@dataclass
class Profiler:
    enabled: bool = False
    phases: List[PhaseStat] = field(default_factory=list)
    _trace_dir: Optional[str] = None

    def enable(self, trace_dir: Optional[str] = None):
        self.enabled = True
        self.phases = []
        self._trace_dir = trace_dir or os.environ.get("ZKVM_PROFILE_DIR")
        if self._trace_dir:
            import jax

            jax.profiler.start_trace(self._trace_dir)

    def disable(self):
        if self._trace_dir:
            import jax

            jax.profiler.stop_trace()
            self._trace_dir = None
        self.enabled = False

    @staticmethod
    def sync(x) -> None:
        """Barrier on a device value by fetching ONE element to host.

        ``jax.block_until_ready`` is a no-op on at least one remote TPU
        platform (axon): dispatch is unboundedly asynchronous and "ready"
        resolves immediately.  A 1-element host transfer cannot complete
        before the producing computation has, so it is the honest barrier —
        and it costs ~nothing (32 bytes over the wire).
        """
        import jax
        import numpy as np

        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "ravel"):
                np.asarray(leaf.ravel()[0:1])

    @contextlib.contextmanager
    def phase(self, name: str, rows: Optional[int] = None, sync=None):
        """Time a phase; ``sync`` is an array (tree) to block on at exit."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            self.sync(sync)
        live = None
        if os.environ.get("ZKVM_PROFILE_MEM", "") == "1":
            import jax

            # device-buffer footprint attributable to this phase boundary
            # (host view of live jax.Arrays; platform memory_stats() is
            # unavailable through the tunnel)
            live = sum(
                a.nbytes for a in jax.live_arrays() if hasattr(a, "nbytes")
            )
        self.phases.append(
            PhaseStat(name, time.perf_counter() - t0, rows, live)
        )

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for p in self.phases:
            out[p.name] = out.get(p.name, 0.0) + p.seconds
        return out

    def report(self) -> str:
        lines = ["phase                    seconds      rows/s   live GiB"]
        for p in self.phases:
            rps = f"{p.rows_per_sec:,.0f}" if p.rows_per_sec else ""
            mem = f"{p.live_bytes / 2**30:.2f}" if p.live_bytes else ""
            lines.append(
                f"{p.name:<24} {p.seconds:>8.4f}  {rps:>10}  {mem:>8}"
            )
        text = "\n".join(lines)
        print(text)
        return text


profiler = Profiler()
"""Process-wide profiler instance used by the prover pipeline."""

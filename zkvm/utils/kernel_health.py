"""Kernel-health report: which Pallas fast paths are live vs fallen back.

Every Pallas kernel family probes each shape once per process (compile + run
+ random-input equality vs its XLA oracle) and silently latches a
bit-identical XLA fallback on failure (DESIGN.md "T-mode").  Robust for
production, but invisible in benchmarks: a Mosaic regression would only show
up as an unexplained perf drop (VERDICT r3 Weak #3).  This module makes the
latched state observable; ``bench.py`` embeds it in its JSON output so every
``BENCH_r*.json`` records which kernels actually ran.
"""

from __future__ import annotations

from typing import Dict


def report() -> Dict:
    """Snapshot of per-family probe state (call AFTER proving)."""
    import jax

    out: Dict = {"backend": jax.default_backend()}

    from zkvm.prover import pipeline

    out["tmode"] = bool(pipeline._use_tmode()) and bool(pipeline._use_classes())
    families: Dict[str, Dict] = {}

    from zkvm.ntt import ntt_t

    families["ntt_stage"] = {
        "live": sorted(str(k) for k in ntt_t._PROBED_SHAPES),
        "failed": sorted(str(k) for k in ntt_t._BAD_SHAPES),
        "disabled": bool(ntt_t._PALLAS_BAD["disabled"]),
    }

    from zkvm.hash import blake3_t

    families["blake3_t"] = {
        "live": sorted(str(k) for k in blake3_t._PROBED),
        "failed": [],
        "disabled": bool(blake3_t._BAD["disabled"]),
    }

    from zkvm.air import constraints_pallas

    families["composition_t"] = {
        "live": sorted(str(k) for k in constraints_pallas._COMP_PROBED),
        "failed": [],
        "disabled": bool(constraints_pallas._COMP_BAD["disabled"]),
    }

    families["composition_std"] = {
        "live": [],
        "failed": [],
        "disabled": bool(pipeline._PALLAS_STATE["disabled"]),
    }

    out["families"] = families
    out["pallas_kernels_live"] = sum(len(f["live"]) for f in families.values())
    out["fallbacks"] = sorted(
        name
        for name, f in families.items()
        if f["disabled"] or f["failed"]
    )
    return out

"""Micro-benchmarks of the prover's device primitives on the current backend.

Usage: python scripts/microbench.py [T] [names...]
Times each hot primitive at trace length T (default 2^16).  NOTE: on the
tunneled TPU platform ``block_until_ready`` does not actually wait, so each
measurement chains REPS executions and syncs with a tiny dependent fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zkvm.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from zkvm.field import jax_f128 as jf
from zkvm.hash import blake3_jax as b3j
from zkvm.ntt import ntt_jax as nj

REPS = 5


def bench(name, fn, *args):
    """fn must be jitted; returns an array.  Chains REPS dependent runs."""
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # compile + sync
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # sync the queue
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt*1e3:10.2f} ms")
    return dt


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    only = set(sys.argv[2:])
    d = t_len * 8
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  T={t_len}  D={d}")

    def sel(name):
        return not only or any(o in name for o in only)

    cols = jnp.asarray(
        rng.integers(0, 1 << 16, (28, t_len, 8), dtype=np.uint32)
    )
    rows_t = jnp.asarray(
        rng.integers(0, 1 << 16, (t_len, 28, 8), dtype=np.uint32)
    )
    leaves = jnp.asarray(rng.integers(0, 1 << 16, (d, 8), dtype=np.uint32))
    vec = jnp.asarray(rng.integers(0, 1 << 16, (t_len, 8), dtype=np.uint32))

    if sel("fmul"):
        bench("fmul (28,T,8)^2", jax.jit(jf.fmul), cols, cols)
    if sel("intt"):
        bench("intt (28,T,8)", nj.intt, cols)
    if sel("ntt"):
        bench("ntt (28,T,8)", nj.ntt, cols)
    if sel("hash_rows"):
        bench("hash_rows (T,28,8)", b3j.hash_rows, rows_t)
    if sel("merge"):
        bench("merge (D/2,8)x2", b3j.merge, leaves[: d // 2], leaves[d // 2 :])
    if sel("merkle"):
        bench("merkle_flat (D,8)", b3j.merkle_flat, leaves)
    if sel("binv"):
        bench("batch_inverse (T,8)", jax.jit(jf.batch_inverse), vec)

    if sel("constraints"):
        from zkvm.air.constraints_jax import merged_transition
        from zkvm.air.constraints_pallas import merged_transition_pallas_pair
        from zkvm.air.periodic import periodic_class_patterns

        # tile the 16-step per-class patterns to full (T, 8) columns, the
        # shape the constraint kernels consume inside the pipeline
        mask_pat, ark_pat = periodic_class_patterns(t_len, 8)
        mask_cls = jnp.tile(mask_pat, (1, t_len // 16, 1))
        ark_cls = jnp.tile(ark_pat, (1, 1, t_len // 16, 1))
        alphas = jnp.asarray(
            rng.integers(0, 1 << 16, (20, 8), dtype=np.uint32)
        )
        nxt = jnp.roll(cols, -1, axis=1)
        delta = 16

        xla_fn = jax.jit(
            lambda c, n, m, a, al: merged_transition(c, 8, m, a, delta, al, nxt=n)
        )
        bench(
            "constraints XLA (28,T,8)",
            xla_fn, cols, nxt, mask_cls[0], ark_cls[0], alphas,
        )
        if jax.default_backend() != "cpu":
            pl_fn = jax.jit(
                lambda c, n, m, a, al: merged_transition_pallas_pair(
                    c, n, m, a, delta, al
                )
            )
            try:
                bench(
                    "constraints Pallas (28,T,8)",
                    pl_fn, cols, nxt, mask_cls[0], ark_cls[0], alphas,
                )
            except Exception as e:
                print(f"pallas kernel failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

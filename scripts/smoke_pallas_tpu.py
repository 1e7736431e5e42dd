"""Compile + run the Pallas constraint kernel on the default backend.

Run on a machine with a real TPU attached (no args).  Asserts bit-equality
against the XLA constraint path and prints both throughputs.  This is the
non-interpret smoke check that round 1 lacked (the kernel shipped broken
because only interpret mode was ever exercised).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from zkvm.air import constraints_pallas as cp
    from zkvm.air.constraints_jax import merged_transition
    from zkvm.air.periodic import periodic_lde

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    t_len, blowup = 2**13, 8
    d = t_len * blowup
    lde = jnp.asarray(rng.integers(0, 2**16, size=(28, d, 8), dtype=np.uint32))
    mask, ark = periodic_lde(t_len, blowup)
    alphas = jnp.asarray(rng.integers(0, 2**16, size=(20, 8), dtype=np.uint32))
    delta = 16

    fx = jax.jit(lambda l: merged_transition(l, blowup, mask, ark, delta, alphas))
    fp = jax.jit(
        lambda l: cp.merged_transition_via_pallas(l, blowup, mask, ark, delta, alphas)
    )
    from zkvm.utils.profiler import Profiler

    qx = fx(lde)
    qp = fp(lde)
    assert bool(jnp.array_equal(qx, qp)), "pallas kernel != XLA constraint path"

    # NB: block_until_ready is a no-op on the axon remote platform; a
    # 1-element host fetch (Profiler.sync) is the honest barrier.
    for name, f in (("xla", fx), ("pallas", fp)):
        def timed():
            t0 = time.time()
            Profiler.sync(f(lde))
            return time.time() - t0

        best = min(timed() for _ in range(5))
        print(f"{name}: {best * 1e3:.1f} ms, {d / best / 1e6:.2f} Mrows/s")
    print("OK")


if __name__ == "__main__":
    main()

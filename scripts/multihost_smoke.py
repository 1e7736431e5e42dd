"""Two-process jax.distributed smoke: sharded NTT across a host boundary.

Launches itself twice (coordinator + worker) on the CPU backend, each
process owning 4 virtual devices of one global 8-device mesh, and checks
that the four-step all_to_all NTT over the host-spanning mesh is
bit-identical to the single-process result.  This exercises the real
``jax.distributed`` runtime (SURVEY.md section 2.3 P5) — the same code
path a TPU pod uses, with DCN standing in for the gRPC transport here.

Usage:  python scripts/multihost_smoke.py            # launcher
        (internally re-execs itself with ZKVM_PROCESS_ID=0/1)
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("ZKVM_SMOKE_PORT", "8476"))
N = 512  # transform size; 8 devices -> 64 rows per device


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from zkvm.dist.multihost import initialize, make_global_mesh, process_info

    initialize(f"localhost:{PORT}", 2, pid)
    info = process_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 8, info

    import numpy as np
    from zkvm.dist import ntt_sharded
    from zkvm.dist.multihost import replicate_to_hosts
    from zkvm.field import jax_f128 as jf
    from zkvm.ntt import golden as g

    rng = np.random.default_rng(7)
    vals = [int(v) for v in rng.integers(0, 2**63, size=N)]
    x = jax.numpy.asarray(jf.to_limbs(vals))  # replicated input
    mesh = make_global_mesh()
    got = replicate_to_hosts(ntt_sharded(x, mesh))
    want = np.asarray(jf.to_limbs(g.ntt(vals)))
    if pid == 0:
        np.testing.assert_array_equal(got, want)
        print("MULTIHOST-NTT-OK", flush=True)


def main() -> None:
    if "ZKVM_PROCESS_ID" in os.environ:
        worker(int(os.environ["ZKVM_PROCESS_ID"]))
        return
    procs = []
    for pid in (0, 1):
        env = dict(os.environ, ZKVM_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    ok = all(p.returncode == 0 for p in procs) and "MULTIHOST-NTT-OK" in outs[0]
    if not ok:
        for i, o in enumerate(outs):
            print(f"--- process {i} ---\n{o[-4000:]}")
        sys.exit(1)
    print("OK: 2-process jax.distributed NTT bit-identical")


if __name__ == "__main__":
    main()

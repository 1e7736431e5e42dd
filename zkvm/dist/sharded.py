"""Sharded prover compute step: the device-heavy pipeline under a mesh.

One jitted function covering the prover's hot path — trace LDE, row-digest
commitment, fused constraint evaluation + zerofier division, composition
split + column LDE, DEEP combination, and one FRI fold — with every O(D)
array sharded over the mesh row axis.  The Fiat-Shamir scalars interleave
with commitments on the host in the full prover; here they are inputs, so
the whole step compiles as one SPMD program (this is also what the driver's
``dryrun_multichip`` exercises).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from zkvm.air.constraints_jax import merged_transition
from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash import blake3_jax as b3j
from zkvm.ntt import ntt_jax as nj
from zkvm.prover.fri import FOLD, fold_layer


def _prove_step(cols, mask, ark, alphas, x_ladder, inv_xt_tiled, e1c, e2c,
                deep_coeffs, z_point, delta, blowup):
    """cols (28, T, 8) -> (trace digests, comp digests, folded deep evals)."""
    trace_coeffs = nj.intt(cols)
    lde = nj.coset_lde(trace_coeffs, blowup)  # (28, D, 8)
    d = lde.shape[1]

    rows = jnp.moveaxis(lde, 0, 1)
    trace_digests = b3j.hash_rows(rows)  # (D, 8) uint32

    q_t = merged_transition(lde, blowup, mask, ark, delta, alphas)
    exempt = jf.fmul(jf.fsub(x_ladder, e1c), jf.fsub(x_ladder, e2c))
    q_t = jf.fmul(q_t, jf.fmul(exempt, inv_xt_tiled))

    comp_coeffs = nj.intt(q_t)
    h_coeffs = jnp.stack([comp_coeffs[k::8] for k in range(8)], axis=0)
    comp_lde = nj.coset_lde(h_coeffs, blowup)  # (8, D, 8)
    comp_digests = b3j.hash_rows(jnp.moveaxis(comp_lde, 0, 1))

    # DEEP combine with provided coefficients, then one FRI fold
    a = jf.fsum(jf.fmul(lde, deep_coeffs[:28, None, :]), axis=0)
    h = jf.fsum(jf.fmul(comp_lde, deep_coeffs[28:36, None, :]), axis=0)
    den = jf.fsub(x_ladder, z_point)
    y = jf.fmul(jf.fadd(a, h), jf.batch_inverse(den))
    folded = fold_layer(y, 12345, f128.DOMAIN_OFFSET)
    return trace_digests, comp_digests, folded


def sharded_prove_step(mesh, cols_host, delta: int, blowup: int = 8):
    """Compile + run the prover step over the mesh; returns host results.

    ``cols_host``: (28, T, 8) uint32 limb array.  The D-sized arrays are
    sharded over the mesh 'row' axis; small constants are replicated.
    """
    from zkvm.air.periodic import periodic_lde

    t_len = cols_host.shape[1]
    d = t_len * blowup
    g_trace = f128.get_root_of_unity(t_len)
    w_d = f128.get_root_of_unity(d)
    offset = f128.DOMAIN_OFFSET

    mask, ark = periodic_lde(t_len, blowup)
    x_ladder = nj.ladder_host(w_d, d, offset)
    s_t = pow(offset, t_len, f128.P)
    w_b = f128.get_root_of_unity(blowup)
    inv_xt = [
        f128.finv(f128.fsub(f128.fmul(s_t, pow(w_b, i, f128.P)), 1))
        for i in range(blowup)
    ]
    inv_xt_tiled = jnp.tile(jnp.asarray(jf.to_limbs(inv_xt)), (t_len, 1))
    e1c = jf.constant(pow(g_trace, t_len - 1, f128.P), (d,))
    e2c = jf.constant(pow(g_trace, t_len - 2, f128.P), (d,))
    alphas = jnp.asarray(jf.to_limbs(list(range(3, 23))))
    deep = jnp.asarray(jf.to_limbs(list(range(5, 41))))
    z_point = jf.constant(0xABCDEF, (d,))

    shard_rows = NamedSharding(mesh, P(None, "row", None))
    shard_d = NamedSharding(mesh, P("row", None))
    repl = NamedSharding(mesh, P())

    cols = jax.device_put(jnp.asarray(cols_host), repl)
    mask = jax.device_put(mask, shard_d)
    ark = jax.device_put(ark, shard_rows)
    x_ladder = jax.device_put(x_ladder, shard_d)
    inv_xt_tiled = jax.device_put(inv_xt_tiled, shard_d)

    fn = jax.jit(
        functools.partial(_prove_step, delta=delta, blowup=blowup),
        out_shardings=(shard_d, shard_d, repl),
    )
    with mesh:
        out = fn(cols, mask, ark, alphas, x_ladder, inv_xt_tiled, e1c, e2c,
                 deep, z_point)
        return jax.tree_util.tree_map(lambda x: jax.device_get(x), out)

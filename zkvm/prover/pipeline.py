"""The STARK prover pipeline (device-resident heavy path).

Stages (SURVEY.md section 3.1 hot loops #2-#4, rebuilt TPU-first):

1. interpolate the 28 trace columns (batched iNTT) and extend onto the
   8x blowup coset (batched NTT); commit via batched BLAKE3 row hashes +
   Merkle;
2. evaluate all transition constraints over the LDE domain in one fused
   pass, add boundary quotients, divide by zerofiers pointwise;
3. split the composition polynomial into 8 degree-<T columns
   (C(x) = sum_k x^k h_k(x^8)), LDE + commit;
4. DEEP: draw z, open the OOD frame, combine trace/composition quotients
   into Y(x) over the domain;
5. FRI-fold Y with per-layer commitments; draw query positions; assemble
   openings.

Each numbered stage is one jitted function (cached per trace shape), so a
steady-state prove is a handful of fused XLA executions; the Fiat-Shamir
coin and Merkle path assembly run on host (microseconds).  Only ~num_queries
rows are ever gathered back to host.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

import os

from zkvm.air.constraints_jax import merged_transition
from zkvm.air.constraints_pallas import merged_transition_via_pallas
from zkvm.air.layout import (
    NUM_ASSERTIONS,
    NUM_EXEMPTIONS,
    NUM_TRANSITION_CONSTRAINTS,
    TRACE_WIDTH,
    PublicInputs,
    get_assertions,
)
from zkvm.air.periodic import periodic_lde
from zkvm.field import f128
from zkvm.field import jax_f128 as jf
from zkvm.hash import blake3_jax as b3j
from zkvm.hash.merkle import DeviceMerkleTree
from zkvm.ntt import ntt_jax as nj
from zkvm.utils.profiler import profiler
from .fri import FOLD, fri_prove
from .options import ProofOptions
from .proof import FriLayerOpening, Proof, QueryOpening
from .transcript import RandomCoin

NUM_COMP_COLUMNS = 8  # ce blowup for max constraint degree 7


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    """Mosaic constraint kernel on real TPU; XLA fusion elsewhere.

    Override with ZKVM_PALLAS=1/0.  The Pallas path needs the TPU Mosaic
    compiler — on the CPU test mesh it would run interpreted (slow), so
    auto-select keys off the default backend platform.
    """
    env = os.environ.get("ZKVM_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    import jax

    return jax.default_backend() not in ("cpu",)


@functools.lru_cache(maxsize=None)
def _domain_constants(t_len: int, blowup: int):
    """Host-computed per-domain constants, moved to device once."""
    d = t_len * blowup
    offset = f128.DOMAIN_OFFSET
    g_trace = f128.get_root_of_unity(t_len)
    w_d = f128.get_root_of_unity(d)
    x_ladder = nj.ladder_host(w_d, d, offset)
    s_t = pow(offset, t_len, f128.P)
    w_b = f128.get_root_of_unity(blowup)
    inv_xt = [
        f128.finv(f128.fsub(f128.fmul(s_t, pow(w_b, i, f128.P)), 1))
        for i in range(blowup)
    ]
    inv_xt_tiled = jnp.tile(jnp.asarray(jf.to_limbs(inv_xt)), (t_len, 1))
    inv_off_ladder = nj.ladder_host(f128.finv(offset), d)
    e1 = pow(g_trace, t_len - 1, f128.P)
    e2 = pow(g_trace, t_len - 2, f128.P)
    x_last = pow(g_trace, t_len - NUM_EXEMPTIONS, f128.P)
    mask, ark = periodic_lde(t_len, blowup)
    return dict(
        d=d,
        g_trace=g_trace,
        x_ladder=x_ladder,
        inv_xt_tiled=inv_xt_tiled,
        inv_off_ladder=inv_off_ladder,
        e1=e1,
        e2=e2,
        x_last=x_last,
        mask=mask,
        ark=ark,
    )


# ---------------------------------------------------------------------------
# jitted stages (cached by input shapes)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("blowup",))
def _stage_trace_lde(cols, blowup):
    coeffs = nj.intt(cols)
    lde = nj.coset_lde(coeffs, blowup)
    nodes = b3j.merkle_flat(b3j.hash_rows(jnp.moveaxis(lde, 0, 1)))
    return coeffs, lde, nodes


@functools.partial(
    jax.jit,
    static_argnames=("blowup", "delta", "e1", "e2", "x_last", "use_pallas"),
)
def _stage_composition(
    lde, mask, ark, alphas, x_ladder, inv_xt_tiled,
    bvals0, bbetas0, bcols0, bvals1, bbetas1, bcols1,
    blowup, delta, e1, e2, x_last, use_pallas=False,
):
    d = lde.shape[1]
    if use_pallas:
        q = merged_transition_via_pallas(lde, blowup, mask, ark, delta, alphas)
    else:
        q = merged_transition(lde, blowup, mask, ark, delta, alphas)
    exempt = jf.fmul(
        jf.fsub(x_ladder, jf.constant(e1, (d,))),
        jf.fsub(x_ladder, jf.constant(e2, (d,))),
    )
    q = jf.fmul(q, jf.fmul(exempt, inv_xt_tiled))

    # boundary groups at steps 0 and last_step; one batched inversion
    den0 = jf.fsub(x_ladder, jf.constant(1, (d,)))
    den1 = jf.fsub(x_ladder, jf.constant(x_last, (d,)))
    inv_prod = jf.batch_inverse(jf.fmul(den0, den1))
    inv0 = jf.fmul(inv_prod, den1)
    inv1 = jf.fmul(inv_prod, den0)

    g0 = jf.fsum(jf.fmul(jf.fsub(lde[bcols0, :, :], bvals0[:, None, :]), bbetas0[:, None, :]), axis=0)
    g1 = jf.fsum(jf.fmul(jf.fsub(lde[bcols1, :, :], bvals1[:, None, :]), bbetas1[:, None, :]), axis=0)
    q = jf.fadd(q, jf.fmul(g0, inv0))
    q = jf.fadd(q, jf.fmul(g1, inv1))
    return q


@functools.partial(jax.jit, static_argnames=("blowup",))
def _stage_comp_commit(comp_evals, inv_off_ladder, blowup):
    coeffs = jf.fmul(nj.intt(comp_evals), inv_off_ladder)
    h_coeffs = jnp.stack(
        [coeffs[k :: NUM_COMP_COLUMNS] for k in range(NUM_COMP_COLUMNS)], axis=0
    )
    comp_lde = nj.coset_lde(h_coeffs, blowup)
    nodes = b3j.merkle_flat(b3j.hash_rows(jnp.moveaxis(comp_lde, 0, 1)))
    return h_coeffs, comp_lde, nodes


@jax.jit
def _stage_eval_at(coeffs, ladder):
    """Evaluate polys (C, T, 8) at the ladder's point -> (C, 8)."""
    return jf.fsum(jf.fmul(coeffs, ladder), axis=-1)


@jax.jit
def _stage_deep(lde, comp_lde, x_ladder, gammas, deltas, epsilons,
                a_z, b_zg, h_zm, z_c, zg_c, zm_c):
    d = lde.shape[1]
    a = jf.fsum(jf.fmul(lde, gammas[:, None, :]), axis=0)
    b = jf.fsum(jf.fmul(lde, deltas[:, None, :]), axis=0)
    h = jf.fsum(jf.fmul(comp_lde, epsilons[:, None, :]), axis=0)
    den = jnp.concatenate(
        [jf.fsub(x_ladder, z_c), jf.fsub(x_ladder, zg_c), jf.fsub(x_ladder, zm_c)],
        axis=0,
    )
    inv = jf.batch_inverse(den)
    y = jf.fmul(jf.fsub(a, a_z), inv[:d])
    y = jf.fadd(y, jf.fmul(jf.fsub(b, b_zg), inv[d : 2 * d]))
    y = jf.fadd(y, jf.fmul(jf.fsub(h, h_zm), inv[2 * d :]))
    return y


@jax.jit
def _gather_rows(arr, positions):
    """arr (C, D, 8), positions (Q,) -> (Q, C, 8)."""
    return jnp.moveaxis(arr[:, positions, :], 0, 1)


def _host_rows(arr, positions) -> List[List[int]]:
    got = jf.from_limbs(np.asarray(_gather_rows(arr, jnp.asarray(positions))))
    return [[int(v) for v in row] for row in got]


def _weighted_host(weights: List[int], values: List[int]) -> int:
    acc = 0
    for w, v in zip(weights, values):
        acc = f128.fadd(acc, f128.fmul(w, v))
    return acc


def prove(trace, pub_inputs: PublicInputs, options: ProofOptions = ProofOptions()) -> Proof:
    t_len = trace.length
    blowup = options.blowup
    delta = pub_inputs.server_key.parameters.delta
    dc = _domain_constants(t_len, blowup)
    d = dc["d"]

    # ---- 1. trace LDE + commitment -----------------------------------
    cols = jnp.asarray(trace.as_limbs())  # (28, T, 8)
    with profiler.phase("trace_lde_commit", rows=d) as _:
        trace_coeffs, lde, trace_nodes = _stage_trace_lde(cols, blowup=blowup)
        if profiler.enabled:
            jax.block_until_ready(trace_nodes)
    trace_tree = DeviceMerkleTree(trace_nodes)

    seed = [TRACE_WIDTH, t_len] + options.to_elements() + pub_inputs.to_elements()
    coin = RandomCoin(seed)
    coin.reseed(trace_tree.root)

    alphas = coin.draw_elements(NUM_TRANSITION_CONSTRAINTS)
    betas = coin.draw_elements(NUM_ASSERTIONS)

    # ---- 2. constraint composition -----------------------------------
    assertions = get_assertions(pub_inputs, t_len)
    group0 = [(c, v, b) for (c, s, v), b in zip(assertions, betas) if s == 0]
    group1 = [(c, v, b) for (c, s, v), b in zip(assertions, betas) if s != 0]
    with profiler.phase("constraint_eval", rows=d):
        comp_evals = _stage_composition(
            lde,
            dc["mask"],
            dc["ark"],
            jnp.asarray(jf.to_limbs(alphas)),
            dc["x_ladder"],
            dc["inv_xt_tiled"],
            jnp.asarray(jf.to_limbs([v for _, v, _ in group0])),
            jnp.asarray(jf.to_limbs([b for _, _, b in group0])),
            jnp.asarray([c for c, _, _ in group0], dtype=jnp.int32),
            jnp.asarray(jf.to_limbs([v for _, v, _ in group1])),
            jnp.asarray(jf.to_limbs([b for _, _, b in group1])),
            jnp.asarray([c for c, _, _ in group1], dtype=jnp.int32),
            blowup=blowup,
            delta=delta,
            e1=dc["e1"],
            e2=dc["e2"],
            x_last=dc["x_last"],
            use_pallas=_use_pallas(),
        )
        if profiler.enabled:
            jax.block_until_ready(comp_evals)

    # ---- 3. composition commitment -----------------------------------
    with profiler.phase("composition_commit", rows=d):
        h_coeffs, comp_lde, comp_nodes = _stage_comp_commit(
            comp_evals, dc["inv_off_ladder"], blowup=blowup
        )
        if profiler.enabled:
            jax.block_until_ready(comp_nodes)
    comp_tree = DeviceMerkleTree(comp_nodes)
    coin.reseed(comp_tree.root)

    # ---- 4. DEEP ------------------------------------------------------
    z = coin.draw()
    zg = f128.fmul(z, dc["g_trace"])
    z_m = pow(z, NUM_COMP_COLUMNS, f128.P)

    ood_cur = [
        int(v)
        for v in jf.from_limbs(
            np.asarray(_stage_eval_at(trace_coeffs, nj.ladder_host(z, t_len)))
        )
    ]
    ood_nxt = [
        int(v)
        for v in jf.from_limbs(
            np.asarray(_stage_eval_at(trace_coeffs, nj.ladder_host(zg, t_len)))
        )
    ]
    coin.reseed_with_elements(ood_cur + ood_nxt)
    ood_comp = [
        int(v)
        for v in jf.from_limbs(
            np.asarray(_stage_eval_at(h_coeffs, nj.ladder_host(z_m, t_len)))
        )
    ]
    coin.reseed_with_elements(ood_comp)

    gammas = coin.draw_elements(TRACE_WIDTH)
    deltas = coin.draw_elements(TRACE_WIDTH)
    epsilons = coin.draw_elements(NUM_COMP_COLUMNS)

    with profiler.phase("deep_composition", rows=d):
        y = _stage_deep(
            lde,
            comp_lde,
            dc["x_ladder"],
            jnp.asarray(jf.to_limbs(gammas)),
            jnp.asarray(jf.to_limbs(deltas)),
            jnp.asarray(jf.to_limbs(epsilons)),
            jf.constant(_weighted_host(gammas, ood_cur), (d,)),
            jf.constant(_weighted_host(deltas, ood_nxt), (d,)),
            jf.constant(_weighted_host(epsilons, ood_comp), (d,)),
            jf.constant(z, (d,)),
            jf.constant(zg, (d,)),
            jf.constant(z_m, (d,)),
        )
        if profiler.enabled:
            jax.block_until_ready(y)

    # ---- 5. FRI + queries ---------------------------------------------
    with profiler.phase("fri", rows=d):
        fri = fri_prove(coin, y, f128.DOMAIN_OFFSET, options)

    nonce = 0  # grinding factor is 0 in the reference preset
    positions = coin.draw_integers(options.num_queries, d, nonce)

    with profiler.phase("query_assembly"):
        trace_rows = _host_rows(lde, positions)
        comp_rows = _host_rows(comp_lde, positions)
        trace_paths = trace_tree.open_many(positions)
        comp_paths = comp_tree.open_many(positions)

    proof = Proof(
        trace_length=t_len,
        trace_width=TRACE_WIDTH,
        num_queries=options.num_queries,
        blowup=blowup,
        grinding_factor=options.grinding_factor,
        fri_folding_factor=options.fri_folding_factor,
        fri_remainder_max_degree=options.fri_remainder_max_degree,
        trace_root=trace_tree.root,
        comp_root=comp_tree.root,
        ood_trace_cur=ood_cur,
        ood_trace_nxt=ood_nxt,
        ood_comp=ood_comp,
        fri_roots=[t.root for t in fri.trees],
        fri_remainder=fri.remainder,
        pow_nonce=nonce,
    )
    for p, trow, tpath, crow, cpath in zip(
        positions, trace_rows, trace_paths, comp_rows, comp_paths
    ):
        proof.queries.append(
            QueryOpening(
                position=p,
                trace_row=trow,
                trace_path=tpath,
                comp_row=crow,
                comp_path=cpath,
            )
        )
    # FRI openings per layer
    size = d
    layer_positions = list(positions)
    for layer_idx, tree in enumerate(fri.trees):
        group_idx = sorted(set(p % (size // FOLD) for p in layer_positions))
        gathered = jf.from_limbs(
            np.asarray(fri.groups[layer_idx][jnp.asarray(group_idx)])
        )
        groups_host = {
            j: [int(v) for v in g] for j, g in zip(group_idx, gathered)
        }
        paths_host = dict(zip(group_idx, tree.open_many(group_idx)))
        layer = []
        folded = []
        for p in layer_positions:
            j = p % (size // FOLD)
            layer.append(
                FriLayerOpening(group=groups_host[j], path=paths_host[j])
            )
            folded.append(j)
        proof.fri_openings.append(layer)
        layer_positions = folded
        size //= FOLD

    return proof

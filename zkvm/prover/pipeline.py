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

The Fiat-Shamir coin and Merkle path assembly run on host (microseconds);
every O(D) array stays on device until the final gather of ~32 rows.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from zkvm.air.constraints_jax import merged_transition
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
from zkvm.hash.merkle import MerkleTree
from zkvm.ntt import ntt_jax as nj
from .fri import FOLD, fold_position, fri_prove
from .options import ProofOptions
from .proof import FriLayerOpening, Proof, QueryOpening
from .transcript import RandomCoin

NUM_COMP_COLUMNS = 8  # ce blowup for max constraint degree 7


def _weighted_column_sum(columns: jnp.ndarray, weights: List[int]) -> jnp.ndarray:
    """sum_c w_c * columns[c]  ->  (D, 8)."""
    w = jnp.asarray(jf.to_limbs(weights))  # (C, 8)
    prod = jf.fmul(columns, w[:, None, :])
    return jf.fsum(prod, axis=0)


def _evaluate_at(coeffs: jnp.ndarray, point: int) -> List[int]:
    """Evaluate polys (C, T, 8) at a host point via ladder dot -> C ints."""
    t = coeffs.shape[-2]
    ladder = nj.power_ladder_device(point, t)
    vals = jf.fsum(jf.fmul(coeffs, ladder), axis=-1)
    return [int(v) for v in np.atleast_1d(jf.from_limbs(np.asarray(vals)))]


def prove(trace, pub_inputs: PublicInputs, options: ProofOptions = ProofOptions()) -> Proof:
    t_len = trace.length
    blowup = options.blowup
    d = t_len * blowup
    offset = f128.DOMAIN_OFFSET
    delta = pub_inputs.server_key.parameters.delta
    g_trace = f128.get_root_of_unity(t_len)
    w_d = f128.get_root_of_unity(d)

    # ---- 1. trace LDE + commitment -----------------------------------
    cols = jnp.asarray(jf.to_limbs(trace.columns))  # (28, T, 8)
    trace_coeffs = nj.intt(cols)
    lde = nj.coset_lde(trace_coeffs, blowup)  # (28, D, 8)
    rows = jnp.moveaxis(lde, 0, 1)  # (D, 28, 8)
    trace_tree = MerkleTree.from_device_levels(b3j.merkle_levels(b3j.hash_rows(rows)))

    seed = (
        [TRACE_WIDTH, t_len]
        + options.to_elements()
        + pub_inputs.to_elements()
    )
    coin = RandomCoin(seed)
    coin.reseed(trace_tree.root)

    alphas = coin.draw_elements(NUM_TRANSITION_CONSTRAINTS)
    betas = coin.draw_elements(NUM_ASSERTIONS)

    # ---- 2. constraint composition over the LDE domain ---------------
    mask, ark = periodic_lde(t_len, blowup)
    alphas_l = jnp.asarray(jf.to_limbs(alphas))
    q_t = merged_transition(lde, blowup, mask, ark, delta, alphas_l)

    # transition zerofier inverse: (x - e1)(x - e2) / (x^T - 1);
    # x^T - 1 is 8-periodic over the coset -> invert 8 host values
    x_ladder = nj.power_ladder_device(w_d, d, offset)  # (D, 8)
    e1 = pow(g_trace, t_len - 1, f128.P)
    e2 = pow(g_trace, t_len - 2, f128.P)
    s_t = pow(offset, t_len, f128.P)
    w_b = f128.get_root_of_unity(blowup)
    inv_xt = [
        f128.finv(f128.fsub(f128.fmul(s_t, pow(w_b, i, f128.P)), 1))
        for i in range(blowup)
    ]
    inv_xt_tiled = jnp.tile(jnp.asarray(jf.to_limbs(inv_xt)), (t_len, 1))
    exempt = jf.fmul(
        jf.fsub(x_ladder, jf.constant(e1, (d,))),
        jf.fsub(x_ladder, jf.constant(e2, (d,))),
    )
    q_t = jf.fmul(q_t, jf.fmul(exempt, inv_xt_tiled))

    # boundary quotients, grouped by assertion step (0 and last_step)
    assertions = get_assertions(pub_inputs, t_len)
    last_step = t_len - NUM_EXEMPTIONS
    groups = {0: [], last_step: []}
    for (col, step, value), beta in zip(assertions, betas):
        groups[step].append((col, value, beta))

    x_last = pow(g_trace, last_step, f128.P)
    denom = jf.fmul(
        jf.fsub(x_ladder, jf.constant(1, (d,))),
        jf.fsub(x_ladder, jf.constant(x_last, (d,))),
    )
    inv_denom = jf.batch_inverse(denom)
    inv_step = {
        0: jf.fmul(inv_denom, jf.fsub(x_ladder, jf.constant(x_last, (d,)))),
        last_step: jf.fmul(inv_denom, jf.fsub(x_ladder, jf.constant(1, (d,)))),
    }

    comp = q_t
    for step, items in groups.items():
        acc = jf.zeros((d,))
        for col, value, beta in items:
            term = jf.fsub(lde[col], jf.constant(value, (d,)))
            acc = jf.fadd(acc, jf.fmul(term, jf.constant(beta, (d,))))
        comp = jf.fadd(comp, jf.fmul(acc, inv_step[step]))

    # ---- 3. composition polynomial columns ---------------------------
    comp_coeffs_coset = nj.intt(comp)
    inv_off = nj.power_ladder_device(f128.finv(offset), d)
    comp_coeffs = jf.fmul(comp_coeffs_coset, inv_off)  # (D, 8) true coeffs
    h_coeffs = jnp.stack(
        [comp_coeffs[k::NUM_COMP_COLUMNS] for k in range(NUM_COMP_COLUMNS)], axis=0
    )  # (8, T, 8)
    comp_lde = nj.coset_lde(h_coeffs, blowup)  # (8, D, 8)
    comp_rows = jnp.moveaxis(comp_lde, 0, 1)
    comp_tree = MerkleTree.from_device_levels(
        b3j.merkle_levels(b3j.hash_rows(comp_rows))
    )
    coin.reseed(comp_tree.root)

    # ---- 4. DEEP ------------------------------------------------------
    z = coin.draw()
    zg = f128.fmul(z, g_trace)
    z_m = pow(z, NUM_COMP_COLUMNS, f128.P)

    ood_cur = _evaluate_at(trace_coeffs, z)
    ood_nxt = _evaluate_at(trace_coeffs, zg)
    coin.reseed_with_elements(ood_cur + ood_nxt)
    ood_comp = _evaluate_at(h_coeffs, z_m)
    coin.reseed_with_elements(ood_comp)

    gammas = coin.draw_elements(TRACE_WIDTH)
    deltas = coin.draw_elements(TRACE_WIDTH)
    epsilons = coin.draw_elements(NUM_COMP_COLUMNS)

    a_lde = _weighted_column_sum(lde, gammas)
    b_lde = _weighted_column_sum(lde, deltas)
    h_lde = _weighted_column_sum(comp_lde, epsilons)
    a_z = 0
    b_zg = 0
    for c in range(TRACE_WIDTH):
        a_z = f128.fadd(a_z, f128.fmul(gammas[c], ood_cur[c]))
        b_zg = f128.fadd(b_zg, f128.fmul(deltas[c], ood_nxt[c]))
    h_zm = 0
    for k in range(NUM_COMP_COLUMNS):
        h_zm = f128.fadd(h_zm, f128.fmul(epsilons[k], ood_comp[k]))

    den = jnp.concatenate(
        [
            jf.fsub(x_ladder, jf.constant(z, (d,))),
            jf.fsub(x_ladder, jf.constant(zg, (d,))),
            jf.fsub(x_ladder, jf.constant(z_m, (d,))),
        ],
        axis=0,
    )
    inv = jf.batch_inverse(den)
    y = jf.fmul(jf.fsub(a_lde, jf.constant(a_z, (d,))), inv[:d])
    y = jf.fadd(y, jf.fmul(jf.fsub(b_lde, jf.constant(b_zg, (d,))), inv[d : 2 * d]))
    y = jf.fadd(y, jf.fmul(jf.fsub(h_lde, jf.constant(h_zm, (d,))), inv[2 * d :]))

    # ---- 5. FRI + queries ---------------------------------------------
    fri = fri_prove(coin, y, offset, options)

    nonce = 0  # grinding factor is 0 in the reference preset
    positions = coin.draw_integers(options.num_queries, d, nonce)

    rows_host = jf.from_limbs(np.asarray(rows))
    comp_rows_host = jf.from_limbs(np.asarray(comp_rows))

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
    for p in positions:
        proof.queries.append(
            QueryOpening(
                position=p,
                trace_row=[int(v) for v in rows_host[p]],
                trace_path=trace_tree.open(p),
                comp_row=[int(v) for v in comp_rows_host[p]],
                comp_path=comp_tree.open(p),
            )
        )
    # FRI openings per layer
    size = d
    layer_positions = list(positions)
    for layer_idx, tree in enumerate(fri.trees):
        groups = fri.group_values[layer_idx]
        layer = []
        folded = []
        for p in layer_positions:
            j = p % (size // FOLD)
            layer.append(
                FriLayerOpening(
                    group=[int(v) for v in groups[j]], path=tree.open(j)
                )
            )
            folded.append(j)
        proof.fri_openings.append(layer)
        layer_positions = folded
        size //= FOLD

    return proof

"""Randomized equivalence: the round-5 decomposed propose_expansions
(slot-table gates + broadcast combine, ops/board.py) against the
one-is_valid_quad-call-per-combo reference formulation it replaced.

The decomposition claims BIT-IDENTICAL results (same f32 op sequences
on the same values, reordered only across independent elements). This
test pins that claim on randomized saddle fields dense enough to
exercise every gate, including ties and degenerate (duplicate-position)
candidates.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from aprilgrid_tpu.ops.board import _combo_index, knn_table, propose_expansions
from aprilgrid_tpu.ops.geometry import is_valid_quad_idx, theta_distance_degree
from aprilgrid_tpu.ops.rochade import Saddles


def _reference_propose(saddles, knn, alive, quads, active, spacing_ratio):
    """The pre-round-5 formulation (git 67976f2~1), kept verbatim as
    the equivalence oracle."""
    p = saddles.p[quads]
    t = saddles.theta[quads]
    ratio = 1.0 + spacing_ratio
    v01 = p[:, 1] - p[:, 0]
    v32 = p[:, 2] - p[:, 3]
    r01 = 0.5 * jnp.sum(v01 * v01, -1)
    r32 = 0.5 * jnp.sum(v32 * v32, -1)
    targets = jnp.stack(
        [p[:, 0] + v01 * ratio, p[:, 1] + v01 * ratio,
         p[:, 2] + v32 * ratio, p[:, 3] + v32 * ratio], axis=1)
    radius_sq = jnp.stack([r01, r01, r32, r32], axis=1)
    pool = jnp.stack(
        [knn[quads[:, 1]], knn[quads[:, 1]],
         knn[quads[:, 2]], knn[quads[:, 2]]], axis=1)
    pool_p = saddles.p[pool]
    d2 = jnp.sum((pool_p - targets[:, :, None, :]) ** 2, axis=-1)
    d2 = jnp.where(alive[pool], d2, jnp.inf)
    neg, slot = lax.top_k(-d2, 3)
    idx = jnp.take_along_axis(pool, slot, axis=-1)
    dist_sq = -neg
    ok = (
        jnp.isfinite(dist_sq)
        & (dist_sq <= radius_sq[..., None])
        & active[idx]
        & (theta_distance_degree(t[..., None], saddles.theta[idx]) < 5.0)
    )
    endpoints = jnp.stack([p[:, 1], p[:, 1], p[:, 2], p[:, 2]], axis=1)
    d2_ep = jnp.sum((pool_p - endpoints[:, :, None, :]) ** 2, axis=-1)
    r_pool = jnp.sqrt(jnp.max(jnp.where(alive[pool], d2_ep, 0.0), axis=-1))
    d_et = jnp.sqrt(jnp.sum((targets - endpoints) ** 2, axis=-1))
    d3 = jnp.sqrt(jnp.minimum(dist_sq[..., 2], jnp.float32(1e30)))
    covered = (d_et + d3 <= r_pool) | (jnp.sum(alive) <= pool.shape[-1])
    pool_overflow = (~covered).any(axis=-1)
    order = jnp.argsort(~ok, axis=-1, stable=True)
    idx = jnp.take_along_axis(idx, order, axis=-1)
    ok = jnp.take_along_axis(ok, order, axis=-1)
    combos = jnp.asarray(_combo_index())
    corner = jnp.arange(4)
    cand = idx[:, corner[None, :], combos]
    cand_ok = ok[:, corner[None, :], combos].all(-1)
    cand_ok &= is_valid_quad_idx(saddles, cand)
    first = jnp.argmax(cand_ok, axis=-1)
    new_quads = jnp.take_along_axis(
        cand, first[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    return new_quads, cand_ok.any(axis=-1), pool_overflow


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_propose_expansions_bit_identical(seed):
    rng = np.random.default_rng(seed)
    n = 160
    # clustered field: grid-ish positions + jitter so radius/theta gates
    # pass often; a handful of exact duplicates exercises tie-breaking
    base = rng.uniform(0, 200, size=(n, 2)).astype(np.float32)
    base[: n // 2] = (
        np.stack(np.meshgrid(np.arange(8), np.arange(10)), -1)
        .reshape(-1, 2)[: n // 2] * 20.0
        + rng.normal(0, 1.5, (n // 2, 2))
    ).astype(np.float32)
    base[5] = base[4]  # exact duplicate positions
    theta = rng.uniform(-90, 90, n).astype(np.float32)
    theta[: n // 3] = theta[0]  # big same-theta population
    saddles = Saddles(
        p=jnp.asarray(base),
        k=jnp.ones(n, jnp.float32),
        theta=jnp.asarray(theta),
        phi=jnp.full((n,), 45.0, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    alive = jnp.asarray(rng.random(n) > 0.1)
    active = alive & jnp.asarray(rng.random(n) > 0.15)
    knn = knn_table(saddles, alive)
    quads = jnp.asarray(
        rng.integers(0, n, size=(48, 4), dtype=np.int32)
    )
    got = propose_expansions(saddles, knn, alive, quads, active, 0.3)
    ref = _reference_propose(saddles, knn, alive, quads, active, 0.3)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    # quad indices only matter where a valid combo exists
    v = np.asarray(ref[1])
    np.testing.assert_array_equal(
        np.asarray(got[0])[v], np.asarray(ref[0])[v]
    )
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))

"""Seed-quad hypothesis search.

The reference's init_quads (src/detector.rs:543-586) takes the 50 nearest
neighbors of a seed saddle from a kd-tree, splits them into same- and
different-orientation sets, and tests every (s1, {d0, d1}) combination
with is_valid_quad. On TPU the kd-tree becomes a masked distance top-k
and the combination loops become one broadcasted predicate over a static
(s1, pair) enumeration whose flattened order equals the reference's
iteration order — so quad candidate ordering (which drives best-board
tie-breaking) is preserved.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from .geometry import cross, is_valid_quad, theta_distance_degree


class QuadSet(NamedTuple):
    quads: jnp.ndarray  # (MQ, 4) int32 saddle indices [s0, d0, s1, d1]
    valid: jnp.ndarray  # (MQ,) bool


@functools.lru_cache(maxsize=None)
def _pair_enum(nn: int) -> tuple[np.ndarray, np.ndarray]:
    """All (a, b) with a < b over nn positions, in combinations order."""
    pa, pb = [], []
    for a in range(nn):
        for b in range(a + 1, nn):
            pa.append(a)
            pb.append(b)
    return np.array(pa, np.int32), np.array(pb, np.int32)


def init_quads(saddles, alive: jnp.ndarray, s0_idx: jnp.ndarray, nn: int, max_quads: int) -> QuadSet:
    """Candidate quads seeded at ``s0_idx`` (src/detector.rs:543-586).

    ``alive`` masks the saddles currently in play (reference passes an
    already-filtered list; we mask instead of re-indexing).
    """
    n = saddles.valid.shape[0]
    k = min(nn, n)
    p0 = saddles.p[s0_idx]
    t0 = saddles.theta[s0_idx]

    d2 = jnp.sum((saddles.p - p0) ** 2, axis=-1)
    d2 = jnp.where(alive, d2, jnp.inf)
    neg_d, nn_idx = lax.top_k(-d2, k)  # ascending distance, self first
    nn_ok = jnp.isfinite(neg_d)

    td = theta_distance_degree(t0, saddles.theta[nn_idx])
    same = nn_ok & (td < 5.0)
    diff = nn_ok & (td > 80.0)
    # position 0 is the seed itself (distance 0) — excluded (nearest[1..])
    pos0 = jnp.zeros(k, bool).at[0].set(True)
    same &= ~pos0
    diff &= ~pos0

    pa, pb = _pair_enum(k)
    pa = jnp.asarray(pa)
    pb = jnp.asarray(pb)

    s1_i = nn_idx[:, None]                     # (k, 1)
    d0_i = nn_idx[pa][None, :]                 # (1, P)
    d1_i = nn_idx[pb][None, :]

    cand_ok = same[:, None] & diff[pa][None, :] & diff[pb][None, :]
    geom_ok = is_valid_quad(
        p0, t0,
        saddles.p[d0_i], saddles.theta[d0_i],
        saddles.p[s1_i],
        saddles.p[d1_i], saddles.theta[d1_i],
    )
    ok = cand_ok & geom_ok

    # CCW/CW orientation: swap d0/d1 when cross(v01, v02) <= 0
    v01 = saddles.p[d0_i] - p0
    v02 = saddles.p[s1_i] - p0
    pos = cross(v01, v02) > 0.0
    qa = jnp.where(pos, d0_i, d1_i)
    qb = jnp.where(pos, d1_i, d0_i)

    s1_b = jnp.broadcast_to(s1_i, qa.shape)
    flat_ok = ok.reshape(-1)
    flat_quads = jnp.stack(
        [
            jnp.full(qa.size, s0_idx, jnp.int32).reshape(qa.shape).reshape(-1),
            qa.reshape(-1).astype(jnp.int32),
            s1_b.reshape(-1).astype(jnp.int32),
            qb.reshape(-1).astype(jnp.int32),
        ],
        axis=-1,
    )

    total = flat_ok.shape[0]
    (sel,) = jnp.nonzero(flat_ok, size=max_quads, fill_value=total)
    valid = sel < total
    safe = jnp.minimum(sel, total - 1)
    return QuadSet(quads=flat_quads[safe], valid=valid)

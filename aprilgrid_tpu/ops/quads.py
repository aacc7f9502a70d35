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
    overflow: jnp.ndarray  # () int32 — cheap-gate survivors dropped at
    #                        the exact-phase capacity (see init_quads;
    #                        0 on every golden/stress scene)


@functools.lru_cache(maxsize=None)
def _pair_enum(nn: int) -> tuple[np.ndarray, np.ndarray]:
    """All (a, b) with a < b over nn positions, in combinations order."""
    pa, pb = [], []
    for a in range(nn):
        for b in range(a + 1, nn):
            pa.append(a)
            pb.append(b)
    return np.array(pa, np.int32), np.array(pb, np.int32)


def init_quads(
    saddles,
    alive: jnp.ndarray,
    s0_idx: jnp.ndarray,
    nn: int,
    max_quads: int,
    cheap_cap: int = 2048,
    same_cap: int = 40,
    diff_cap: int = 40,
) -> QuadSet:
    """Candidate quads seeded at ``s0_idx`` (src/detector.rs:543-586).

    ``alive`` masks the saddles currently in play (reference passes an
    already-filtered list; we mask instead of re-indexing).

    Two-phase evaluation (round-5 xla-mode rescue): the (k x C(k,2))
    combination sweep — 61k combos at k=50 — first runs only the
    TRIG-FREE gates of is_valid_quad (theta partition, cross-sign
    convexity, dot orientation, plus the per-s1 white-block angle:
    k atan2 instead of 61k x 5). Survivors (measured <= ~1000 per seed
    on the golden scenes, tools: round-5 probe) are compacted to
    ``cheap_cap`` and only they pay the full exact predicate — a ~30x
    transcendental cut with BIT-IDENTICAL results: phase 1 evaluates
    the same f32 expressions as is_valid_quad's corresponding gates, so
    phase 2's extra gates decide exactly the combos the one-phase sweep
    would have accepted. ``overflow`` counts dropped survivors
    (0 everywhere it was measured; audited via DetectResult.flags).
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

    # -- phase 1: trig-free gates on small per-slot tables ------------
    pk = saddles.p[nn_idx]            # (k, 2) neighbor positions
    v0j = pk - p0                     # (k, 2): v01[d0], v02[s1], v03[d1]
    # white-block angle: depends on s1 only — k atan2, not 61k
    rad = jnp.radians(t0)
    v_theta = jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)
    wang = jnp.abs(
        jnp.degrees(
            jnp.arctan2(
                v0j[:, 0] * v_theta[1] - v0j[:, 1] * v_theta[0],
                v0j[:, 0] * v_theta[0] + v0j[:, 1] * v_theta[1],
            )
        )
    )
    white_ok = (wang >= 60.0) & (wang <= 120.0)  # (k,) per s1

    # Compact the same/diff sets BEFORE enumerating combos. The
    # reference iterates same x C(diff, 2) where each set is typically
    # 10-30 members of the 50-NN — the dense (k, C(k,2)) sweep enumerated
    # 61k combos regardless, and its phase-2 nonzero (a cumsum over the
    # flat combo axis) dominated init_quads' cost on the TPU backend.
    # Compaction is order-preserving (nonzero is ascending), so the
    # (s1, pair) enumeration over compacted positions IS the reference
    # iteration order (src/detector.rs:563-570). Caps: the max set
    # sizes over EVERY saddle of every golden scene measure 31/30
    # (round-5 probe); 40/40 leaves 1.3x headroom, and truncation rides
    # the audit counter like every other capacity.
    sc = min(same_cap, k)
    dc = min(diff_cap, k)
    (s_sel,) = jnp.nonzero(same, size=sc, fill_value=k)
    (d_sel,) = jnp.nonzero(diff, size=dc, fill_value=k)
    s_live = s_sel < k
    d_live = d_sel < k
    set_overflow = (
        jnp.sum(same).astype(jnp.int32) - s_live.sum().astype(jnp.int32)
    ) + (jnp.sum(diff).astype(jnp.int32) - d_live.sum().astype(jnp.int32))
    ss = jnp.minimum(s_sel, k - 1)
    ds = jnp.minimum(d_sel, k - 1)
    pk_s, pk_d = pk[ss], pk[ds]
    v0s, v0d = v0j[ss], v0j[ds]

    # cross/dot tables over the compacted subsets — the SAME f32 op
    # sequences as is_valid_quad's c0/c1/c01/c12 and dot gates (mul,
    # mul, sub on identical values), so phase 1 can never reject a
    # combo phase 2 would accept. Orientation matters (cross(a, b) is
    # an op sequence, not just a sign): cr_ds[d, s] = cross(v0j[d],
    # v0j[s]), cr_sd[s, d] = cross(v0j[s], v0j[d]).
    cr_ds = v0d[:, None, 0] * v0s[None, :, 1] - v0d[:, None, 1] * v0s[None, :, 0]
    cr_sd = v0s[:, None, 0] * v0d[None, :, 1] - v0s[:, None, 1] * v0d[None, :, 0]
    dt_ds = v0d[:, None, 0] * v0s[None, :, 0] + v0d[:, None, 1] * v0s[None, :, 1]
    # edge tables e[a, b] = p[b] - p[a] (v12 at [d0, s1], v23 at
    # [s1, d1] — derived from positions as the reference does)
    ex_ds = pk_s[None, :, 0] - pk_d[:, None, 0]   # (D, S)
    ey_ds = pk_s[None, :, 1] - pk_d[:, None, 1]
    ex_sd = pk_d[None, :, 0] - pk_s[:, None, 0]   # (S, D)
    ey_sd = pk_d[None, :, 1] - pk_s[:, None, 1]
    c01_ds = v0d[:, None, 0] * ey_ds - v0d[:, None, 1] * ex_ds

    # per-combo gates on the (s1, d0, d1) cube of compacted slots; the
    # i < j triangle over ascending-compacted diff slots IS combinations
    # order over the original slots
    tri = jnp.arange(dc)
    cand_ok = (
        s_live[:, None, None]
        & d_live[None, :, None]
        & d_live[None, None, :]
        & (tri[:, None] < tri[None, :])[None, :, :]
    )
    # c12 = cross(v12, v23) = x12*y23 - y12*x23 (op order as
    # geometry.cross): x12 = ex[d_i, s], y23 = ey[s, d_j]
    c12_cube = (
        ex_ds.T[:, :, None] * ey_sd[:, None, :]
        - ey_ds.T[:, :, None] * ex_sd[:, None, :]
    )  # (S, D, D)
    cheap_ok = (
        cand_ok
        & white_ok[ss][:, None, None]
        & (cr_ds.T[:, :, None] * cr_sd[:, None, :] >= 0.0)
        & (c01_ds.T[:, :, None] * c12_cube >= 0.0)
        & (dt_ds.T[:, :, None] >= 0.0)
        & (dt_ds.T[:, None, :] >= 0.0)
    )

    # -- phase 2: exact predicate on the compacted survivors ----------
    flat_cheap = cheap_ok.reshape(-1)
    total = flat_cheap.shape[0]
    cap = min(cheap_cap, total)
    (surv,) = jnp.nonzero(flat_cheap, size=cap, fill_value=total)
    p2_live = surv < total
    s_safe = jnp.minimum(surv, total - 1)
    overflow = set_overflow + (
        jnp.sum(flat_cheap).astype(jnp.int32) - p2_live.sum().astype(jnp.int32)
    )
    s_live = p2_live
    s1_g = nn_idx[ss[s_safe // (dc * dc)]]
    d0_g = nn_idx[ds[(s_safe // dc) % dc]]
    d1_g = nn_idx[ds[s_safe % dc]]
    geom_ok = is_valid_quad(
        p0, t0,
        saddles.p[d0_g], saddles.theta[d0_g],
        saddles.p[s1_g],
        saddles.p[d1_g], saddles.theta[d1_g],
    )
    ok = s_live & geom_ok

    # CCW/CW orientation: swap d0/d1 when cross(v01, v02) <= 0
    v01 = saddles.p[d0_g] - p0
    v02 = saddles.p[s1_g] - p0
    pos = cross(v01, v02) > 0.0
    qa = jnp.where(pos, d0_g, d1_g).astype(jnp.int32)
    qb = jnp.where(pos, d1_g, d0_g).astype(jnp.int32)
    quads_c = jnp.stack(
        [
            jnp.full(qa.shape, s0_idx, jnp.int32),
            qa,
            s1_g.astype(jnp.int32),
            qb,
        ],
        axis=-1,
    )  # (cap, 4), in flat (s1-major, pair-minor) order = reference order

    # final selection: first max_quads valid, preserving order
    (sel,) = jnp.nonzero(ok, size=max_quads, fill_value=cap)
    valid = sel < cap
    safe = jnp.minimum(sel, cap - 1)
    return QuadSet(quads=quads_c[safe], valid=valid, overflow=overflow)

"""Board growth: associate saddles into a Kalibr AprilGrid.

The reference grows a board from a seed quad by recursive depth-first
expansion over grid cells, extrapolating each quad edge outward by
(1 + spacing_ratio) and validating 3-nearest-neighbor candidate corners
(Board::try_expand / try_expand_one / find_closest_potential_saddle_idxs,
src/board.rs:114-234), then repairs interior holes from opposite
neighbors (try_fix_missing, src/board.rs:52-112).

Recursion is inherently sequential, so the TPU recast grows the whole
frontier in parallel: every (placed cell, direction) pair on the frontier
proposes an expansion each sweep, conflicts (two proposals claiming the
same target cell or the same saddle) are resolved by proposal order, and
sweeps repeat inside a ``lax.while_loop`` until no placement happens. A
6x6 board settles in ~10-14 sweeps instead of ~150 sequential
expansions; many candidate boards grow concurrently under ``vmap``. The
geometric predicates (edge extrapolation, radius gate, orientation gate,
quad validity, candidate ordering) match the reference exactly, so on
clean data the resulting board is identical; only traversal order
differs.

All four 3-NN queries of a proposal batch into one masked ``top_k`` —
keeping the op count minimal matters more than FLOPs here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from .geometry import is_valid_quad_idx, theta_distance_degree

# direction -> (dx, dy) of the target cell, in reference order
# (src/board.rs:120-128): 0:+x, 1:-y, 2:-x, 3:+y
_DIRS = ((1, 0), (0, -1), (-1, 0), (0, 1))


class BoardState(NamedTuple):
    cell_quad: jnp.ndarray  # (G2, 4) int32 saddle indices, -1 if empty
    placed: jnp.ndarray     # (G2,) bool
    failed: jnp.ndarray     # (G2,) bool — attempted but not (yet) placed
    active: jnp.ndarray     # (N,) bool — saddles still claimable
    score: jnp.ndarray      # () int32 — number of placed cells
    pruned: jnp.ndarray     # () int32 — expansion attempts whose k-NN
    #                         pool provably may have missed a true 3-NN
    #                         (density-assumption overflow — see
    #                         propose_expansions; small nonzero counts
    #                         occur benignly on normal scenes, e.g.
    #                         degenerate candidate quads extrapolating
    #                         far-away targets, so this is an audit
    #                         counter surfaced via DetectResult.flags,
    #                         not a warning)


@functools.lru_cache(maxsize=None)
def _neighbor_arrays(grid_radius: int) -> tuple[np.ndarray, np.ndarray]:
    """Static target-cell index map (G2, 4) plus in-grid mask."""
    g = 2 * grid_radius + 1
    g2 = g * g
    cells = np.arange(g2, dtype=np.int32)
    cx = cells % g
    cy = cells // g
    tgt = np.empty((g2, 4), np.int32)
    ok = np.empty((g2, 4), bool)
    for d, (dx, dy) in enumerate(_DIRS):
        tx = cx + dx
        ty = cy + dy
        inside = (tx >= 0) & (tx < g) & (ty >= 0) & (ty < g)
        tgt[:, d] = np.where(inside, ty * g + tx, g2)
        ok[:, d] = inside
    return tgt, ok


@functools.lru_cache(maxsize=None)
def _combo_index() -> np.ndarray:
    """(81, 4) candidate-slot combos in reference nesting order
    (idx0 outermost .. idx3 innermost, src/board.rs:160-163)."""
    a = np.arange(3)
    return np.stack(
        [
            np.repeat(a, 27),
            np.tile(np.repeat(a, 9), 3),
            np.tile(np.repeat(a, 3), 9),
            np.tile(a, 27),
        ],
        axis=-1,
    ).astype(np.int32)


def knn_table(saddles, alive: jnp.ndarray, k: int = 64) -> jnp.ndarray:
    """(N, k) nearest-neighbor index table over the round's alive saddles
    (the reference rebuilds its kd-tree per round over the surviving
    list, src/detector.rs:592-595).

    Computed once per board search; expansion targets are always within
    ~2.3 tag-edge lengths of a source corner, so the true 3-NN of a
    target is contained in the source's k-NN list at any realistic board
    density (see propose_expansions)."""
    d2 = jnp.sum(
        (saddles.p[:, None, :] - saddles.p[None, :, :]) ** 2, axis=-1
    )
    d2 = jnp.where(alive[None, :], d2, jnp.inf)
    _, idx = lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


def propose_expansions(
    saddles,
    knn: jnp.ndarray,
    alive: jnp.ndarray,
    quads: jnp.ndarray,
    active: jnp.ndarray,
    spacing_ratio: float,
    act_off: jnp.ndarray | None = None,
):
    """Batched try_expand_one (src/board.rs:153-234).

    ``quads``: (P, 4) rotated source quads [s0, s1, s2, s3]. Returns
    (new_quads (P, 4), valid (P,)) — the first valid candidate combo per
    proposal, in reference nesting order. Candidate search is pruned to
    the k-NN list of the edge endpoint nearest each extrapolated target.

    ``act_off``: optional (P,) int32 offsets into a FLAT ``active`` of
    several concatenated per-board masks — proposals from different
    boards then consult their own board's claimable-saddle set
    (grow_boards_joint); ``None`` keeps the single shared mask.
    """
    p = saddles.p[quads]       # (P, 4, 2)
    t = saddles.theta[quads]   # (P, 4)
    ratio = 1.0 + spacing_ratio

    # edge s0->s1 extrapolates for new corners 0,1; edge s3->s2 for 3,2
    v01 = p[:, 1] - p[:, 0]
    v32 = p[:, 2] - p[:, 3]
    r01 = 0.5 * jnp.sum(v01 * v01, -1)
    r32 = 0.5 * jnp.sum(v32 * v32, -1)
    targets = jnp.stack(
        [
            p[:, 0] + v01 * ratio,   # new corner 0
            p[:, 1] + v01 * ratio,   # new corner 1
            p[:, 2] + v32 * ratio,   # new corner 2
            p[:, 3] + v32 * ratio,   # new corner 3
        ],
        axis=1,
    )  # (P, 4, 2)
    radius_sq = jnp.stack([r01, r01, r32, r32], axis=1)  # (P, 4)

    # candidate pools: targets for corners 0/1 sit past s1; for 2/3 past
    # s2 — prune the N-wide search to those endpoints' k-NN lists.
    # Corners 0/1 share one pool and 2/3 the other, so gather each ONCE
    # ((P, 2, K) instead of (P, 4, K) — the pool gathers dominate this
    # function's memory traffic on TPU) and broadcast to the 4 corners.
    pool2 = jnp.stack([knn[quads[:, 1]], knn[quads[:, 2]]], axis=1)
    pool2_p = saddles.p[pool2]        # (P, 2, K, 2)
    pool2_alive = alive[pool2]        # (P, 2, K)
    corner_src = jnp.asarray([0, 0, 1, 1])
    pool = pool2[:, corner_src]       # (P, 4, K) — view, no new gather
    pool_p = pool2_p[:, corner_src]
    d2 = jnp.sum((pool_p - targets[:, :, None, :]) ** 2, axis=-1)
    # the reference tree holds the round's surviving saddles (board-
    # consumed ones included — those are gated by `active` afterwards)
    d2 = jnp.where(pool2_alive[:, corner_src], d2, jnp.inf)
    # 3-NN by three masked argmin passes (bit-identical to lax.top_k's
    # stable first-on-ties order; TPU lowers top_k to a full 64-wide
    # sort, ~10x the cost of three lane reduces)
    slots = []
    negs = []
    dcur = d2
    for _ in range(3):
        s = jnp.argmin(dcur, axis=-1)
        v = jnp.take_along_axis(dcur, s[..., None], axis=-1)[..., 0]
        slots.append(s)
        negs.append(v)
        dcur = jnp.where(
            jnp.arange(dcur.shape[-1]) == s[..., None], jnp.inf, dcur
        )
    slot = jnp.stack(slots, axis=-1)             # (P, 4, 3) nearest-first
    dist_sq = jnp.stack(negs, axis=-1)
    idx = jnp.take_along_axis(pool, slot, axis=-1)
    t_cand = saddles.theta[idx]       # (P, 4, 3)
    p_cand = jnp.take_along_axis(pool_p, slot[..., None], axis=2)
    if act_off is None:
        act = active[idx]
    else:
        act = active[idx + act_off[:, None, None]]
    ok = (
        jnp.isfinite(dist_sq)
        & (dist_sq <= radius_sq[..., None])
        & act
        & (theta_distance_degree(t[..., None], t_cand) < 5.0)
    )

    # Density-assumption audit (the reference queries a true kd-tree's
    # global 3-NN and THEN gates; this recast prunes the query to the
    # endpoint's k-NN pool). The pruned query is provably identical
    # when no un-pooled saddle can displace one of the 3 picks: every
    # point closer to the target than the 3rd in-pool pick is inside
    # the pool when dist(endpoint, target) + d3 <= pool radius
    # (triangle inequality), or when the pool already holds every alive
    # saddle. Uncertifiable attempts are COUNTED (BoardState.pruned) so
    # a density-driven parity break is detectable rather than silent.
    # Degenerate candidate quads with huge edges extrapolate targets
    # beyond any pool's reach, so small nonzero counts are expected and
    # benign — validated by golden/stress parity (PARITY.md #3).
    endpoints2 = jnp.stack([p[:, 1], p[:, 2]], axis=1)  # (P, 2, 2)
    d2_ep2 = jnp.sum(
        (pool2_p - endpoints2[:, :, None, :]) ** 2, axis=-1
    )  # (P, 2, K) — corners 0/1 and 2/3 share an endpoint AND a pool,
    # so the pool-radius reduce runs at half width and broadcasts
    r_pool = jnp.sqrt(
        jnp.max(jnp.where(pool2_alive, d2_ep2, 0.0), axis=-1)
    )[:, corner_src]
    d_et = jnp.sqrt(
        jnp.sum((targets - endpoints2[:, corner_src]) ** 2, axis=-1)
    )
    d3 = jnp.sqrt(jnp.minimum(dist_sq[..., 2], jnp.float32(1e30)))
    covered = (d_et + d3 <= r_pool) | (jnp.sum(alive) <= pool.shape[-1])
    pool_overflow = (~covered).any(axis=-1)  # (P,)

    # compact each 3-candidate list (reference iterates passing entries
    # in distance order, src/board.rs:197-232)
    order = jnp.argsort(~ok, axis=-1, stable=True)
    idx = jnp.take_along_axis(idx, order, axis=-1)
    ok = jnp.take_along_axis(ok, order, axis=-1)
    t_cand = jnp.take_along_axis(t_cand, order, axis=-1)
    p_cand = jnp.take_along_axis(p_cand, order[..., None], axis=2)

    # -- is_valid_quad over the 3^4 candidate combos, DECOMPOSED -------
    # The one-call-per-combo form gathered (P, 81, 4) positions/thetas
    # and paid 7 transcendentals per combo. Every gate term of
    # is_valid_quad (src/saddle.rs:17-67) depends on at most 3 of the 4
    # corners, so each is evaluated ONCE on a (3, 3[, 3]) slot table —
    # same f32 op sequences on the same values, so results are
    # bit-identical — and the 81 combos only broadcast-AND the tables.
    # No gathers, 117 atan2 instead of 405 per proposal. Corner roles:
    # new quad = [s0, d0, s1, d1] = candidate corners [0, 1, 2, 3],
    # combo axes named (i, j, k, l) for corners 0..3.
    p0c, p1c, p2c, p3c = (p_cand[:, c] for c in range(4))  # (P, 3, 2)

    def edge(pa_, pb_):  # pb[b] - pa[a] -> (P, a, b, 2)
        return pb_[:, None, :, :] - pa_[:, :, None, :]

    v01 = edge(p0c, p1c)  # axes (i, j)
    v02 = edge(p0c, p2c)  # (i, k)
    v03 = edge(p0c, p3c)  # (i, l)
    v12 = edge(p1c, p2c)  # (j, k)
    v23 = edge(p2c, p3c)  # (k, l)
    v30 = edge(p3c, p0c)  # (l, i)

    def crs(u, v):
        """cross over chained edge tables: u (P, a, s, 2), v (P, s, b, 2)
        — u's second axis is v's first — -> (P, a, s, b), the same
        mul/mul/sub op sequence as geometry.cross."""
        return (
            u[:, :, :, None, 0] * v[:, None, :, :, 1]
            - u[:, :, :, None, 1] * v[:, None, :, :, 0]
        )

    def dt_(u, v):
        return (
            u[:, :, :, None, 0] * v[:, None, :, :, 0]
            + u[:, :, :, None, 1] * v[:, None, :, :, 1]
        )

    def ang(c, d):
        return jnp.degrees(jnp.arctan2(c, d))

    def swap12(x):  # (P, a, b, ...) -> (P, b, a, ...)
        return x.transpose(0, 2, 1, 3)

    # c0 = cross(v01, v02): both edges start at corner 0, so feed v01
    # with axes swapped to (j, i) and swap back -> (P, i, j, k)
    c0x = swap12(crs(swap12(v01), v02))
    c1x = swap12(crs(swap12(v02), v03))  # cross(v02, v03) -> (P, i, k, l)
    c01x = crs(v01, v12)                 # (P, i, j, k): share j
    c12x = crs(v12, v23)                 # (P, j, k, l): share k
    a0 = ang(c01x, dt_(v01, v12))        # (P, i, j, k)
    a1 = ang(c12x, dt_(v12, v23))        # (P, j, k, l)
    a2 = ang(crs(v23, v30), dt_(v23, v30))   # (P, k, l, i)
    a3 = ang(crs(v30, v01), dt_(v30, v01))   # (P, l, i, j)
    dd01 = swap12(dt_(swap12(v01), v02))     # dot(v01, v02) -> (P, i, j, k)
    dd30 = swap12(dt_(swap12(v03), v02))     # dot(v03, v02) -> (P, i, l, k)

    # theta gate (d0 vs d1) -> (P, j, l)
    th9 = theta_distance_degree(
        t_cand[:, 1, :, None], t_cand[:, 3, None, :]
    ) <= 5.0
    # white-block: |angle(v02, theta-dir(s0))| in [60, 120] -> (P, i, k)
    rad = jnp.radians(t_cand[:, 0])                  # (P, 3)
    vtx, vty = jnp.cos(rad), jnp.sin(rad)
    wang = jnp.abs(
        ang(
            v02[..., 0] * vty[:, :, None] - v02[..., 1] * vtx[:, :, None],
            v02[..., 0] * vtx[:, :, None] + v02[..., 1] * vty[:, :, None],
        )
    )
    w9 = (wang >= 60.0) & (wang <= 120.0)

    # combine on (P, i, j, k, l); row-major reshape = the reference's
    # idx0-outermost..idx3-innermost nesting (_combo_index order)
    P_ = quads.shape[0]
    ok_q = (
        th9[:, None, :, None, :]
        & w9[:, :, None, :, None]
        & (c0x[..., None] * c1x[:, :, None, :, :] >= 0.0)
        & (c01x[..., None] * c12x[:, None, :, :, :] >= 0.0)
        & (
            jnp.abs(a0[..., None] - a2.transpose(0, 3, 1, 2)[:, :, None])
            <= 10.0
        )
        & (
            jnp.abs(
                a1[:, None] - a3.transpose(0, 2, 3, 1)[:, :, :, None, :]
            )
            <= 10.0
        )
        & (dd01[..., None] >= 0.0)
        & (dd30.transpose(0, 1, 3, 2)[:, :, None] >= 0.0)
        & ok[:, 0, :, None, None, None]
        & ok[:, 1, None, :, None, None]
        & ok[:, 2, None, None, :, None]
        & ok[:, 3, None, None, None, :]
    )
    cand_ok = ok_q.reshape(P_, 81)

    first = jnp.argmax(cand_ok, axis=-1)          # (P,) first valid combo
    fi, fj, fk, fl = first // 27, (first // 9) % 3, (first // 3) % 3, first % 3
    new_quads = jnp.stack(
        [
            jnp.take_along_axis(idx[:, 0], fi[:, None], axis=-1)[:, 0],
            jnp.take_along_axis(idx[:, 1], fj[:, None], axis=-1)[:, 0],
            jnp.take_along_axis(idx[:, 2], fk[:, None], axis=-1)[:, 0],
            jnp.take_along_axis(idx[:, 3], fl[:, None], axis=-1)[:, 0],
        ],
        axis=-1,
    )
    return new_quads, cand_ok.any(axis=-1), pool_overflow


def resolve_conflicts(
    tgt: jnp.ndarray,
    quad: jnp.ndarray,
    valid: jnp.ndarray,
    n: int,
    g2: int,
) -> jnp.ndarray:
    """Order-priority conflict resolution: a valid proposal is deferred
    when any EARLIER valid proposal shares its target cell or a saddle
    (matching the reference's sequential expansion order,
    src/board.rs:114-152 — earlier frontier entries expand first).

    Formulated as scatter-min "claims" instead of the previous
    (P, P, 4, 4) pairwise-equality matrix: each valid proposal stamps
    its index onto its 4 saddles and its target cell; proposal i is
    blocked iff any of its resources carries a claim < i. Exactly the
    dense formulation's accept set (pinned by
    tests/test_board_conflicts.py) at O(P) scatter/gather cost instead
    of O(P^2) — the pairwise matrix was the dominant byte traffic of a
    growth sweep once vmapped over (boards x frames).
    """
    p = tgt.shape[0]
    p_idx = jnp.arange(p, dtype=jnp.int32)
    claim_s = jnp.full((n + 1,), p, jnp.int32).at[
        jnp.where(valid[:, None], quad, n)
    ].min(jnp.broadcast_to(p_idx[:, None], quad.shape))
    claim_t = jnp.full((g2 + 1,), p, jnp.int32).at[
        jnp.where(valid, tgt, g2)
    ].min(p_idx)
    blocked = (jnp.min(claim_s[quad], axis=1) < p_idx) | (
        claim_t[jnp.minimum(tgt, g2)] < p_idx
    )
    return valid & ~blocked


def resolve_conflicts_dense(
    tgt: jnp.ndarray, quad: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """The original O(P^2) pairwise formulation, kept as the
    equivalence oracle for tests/test_board_conflicts.py."""
    same_tgt = tgt[:, None] == tgt[None, :]
    share = (quad[:, None, :, None] == quad[None, :, None, :]).any((-1, -2))
    p_idx = jnp.arange(tgt.shape[0])
    earlier = (p_idx[None, :] < p_idx[:, None]) & valid[None, :]
    blocked = (earlier & (same_tgt | share)).any(axis=1)
    return valid & ~blocked


def grow_board(
    saddles,
    knn: jnp.ndarray,
    alive: jnp.ndarray,
    seed_quad: jnp.ndarray,
    seed_valid: jnp.ndarray,
    active_in: jnp.ndarray,
    spacing_ratio: float,
    grid_radius: int,
    max_attempts: int = 64,
    max_sweeps: int = 32,
) -> BoardState:
    """Grow one board from a seed quad (Board::new, src/board.rs:27-48).

    Designed to be ``vmap``-ed over many seed quads: the while_loop then
    runs in lockstep until every board has quiesced.
    """
    g = 2 * grid_radius + 1
    g2 = g * g
    center = grid_radius * g + grid_radius
    n = saddles.valid.shape[0]

    tgt_np, ok_np = _neighbor_arrays(grid_radius)
    tgt_map = jnp.asarray(tgt_np)
    tgt_ok = jnp.asarray(ok_np)

    cell_quad = jnp.full((g2, 4), -1, jnp.int32).at[center].set(seed_quad)
    placed = jnp.zeros(g2, bool).at[center].set(seed_valid)
    failed = jnp.zeros(g2, bool)
    # seed consumes quad[1:] only (src/board.rs:34-36)
    seed_used = jnp.zeros(n, bool).at[seed_quad[1:]].set(True)
    active = active_in & ~(seed_used & seed_valid)

    def sweep(state):
        cell_quad, placed, failed, active, _, it, pruned = state

        # frontier attempts: placed cell x direction with an untried
        # target, in cell-major / direction-minor priority order. Cells
        # that already failed are excluded — the reference marks them
        # None and never retries (src/board.rs:148); this also keeps
        # permanently-failing attempts from monopolizing the
        # max_attempts selection window on dense frontiers.
        tgt_all = tgt_map.reshape(-1)  # (G2*4,)
        tgt_safe = jnp.minimum(tgt_map, g2 - 1)
        attempt_all = (
            placed[:, None] & tgt_ok & ~placed[tgt_safe] & ~failed[tgt_safe]
        ).reshape(-1)
        total = attempt_all.shape[0]
        (sel,) = jnp.nonzero(attempt_all, size=max_attempts, fill_value=total)
        live = sel < total
        safe = jnp.minimum(sel, total - 1)
        tgt = jnp.where(live, tgt_all[safe], g2)            # (P,)
        cell = (safe // 4).astype(jnp.int32)
        d = (safe % 4).astype(jnp.int32)

        # rotate each source quad left by its direction (src/board.rs:118-119)
        rot_ix = (d[:, None] + jnp.arange(4)[None, :]) % 4
        rot = jnp.take_along_axis(cell_quad[cell], rot_ix, axis=1)

        new_q, valid, pool_ovf = propose_expansions(
            saddles, knn, alive, rot, active, spacing_ratio
        )
        valid &= live
        pruned = pruned + jnp.sum(pool_ovf & live).astype(jnp.int32)
        # rotate back right by d before storing (src/board.rs:138-139)
        unrot_ix = (jnp.arange(4)[None, :] - d[:, None]) % 4
        quad = jnp.take_along_axis(new_q, unrot_ix, axis=1)

        accept = resolve_conflicts(tgt, quad, valid, n, g2)

        # apply accepted placements (targets now distinct)
        scatter_tgt = jnp.where(accept, tgt, g2)
        cell_quad = cell_quad.at[scatter_tgt].set(quad, mode="drop")
        placed = placed.at[scatter_tgt].set(True, mode="drop")
        # consumed saddles (src/board.rs:140-142 marks all four)
        used = jnp.where(accept[:, None], quad, n)
        active = active.at[used.reshape(-1)].set(False, mode="drop")
        # failure marks (reference inserts None, src/board.rs:148)
        fail_t = jnp.where(live & ~valid, tgt, g2)
        new_failed = failed.at[fail_t].set(True, mode="drop")
        # keep sweeping while anything happened: a placement, OR a fresh
        # failure mark (which unclogs the attempt window when the
        # frontier exceeded max_attempts — truncation is then a deferral,
        # not a silent drop)
        progressed = accept.any() | (new_failed != failed).any()
        return (
            cell_quad, placed, new_failed, active, progressed, it + 1,
            pruned,
        )

    def cond(state):
        return state[4] & (state[5] < max_sweeps)

    init = (
        cell_quad, placed, failed, active, seed_valid, jnp.int32(0),
        jnp.int32(0),
    )
    state = lax.while_loop(cond, sweep, init)
    cell_quad, placed, failed, active, _, _, pruned = state
    failed &= ~placed
    return BoardState(
        cell_quad=cell_quad,
        placed=placed,
        failed=failed,
        active=active,
        score=placed.sum().astype(jnp.int32),
        pruned=pruned,
    )


def grow_boards_joint(
    saddles,
    knn: jnp.ndarray,
    alive: jnp.ndarray,
    seed_quads: jnp.ndarray,
    seed_ok: jnp.ndarray,
    active_in: jnp.ndarray,
    spacing_ratio: float,
    grid_radius: int,
    loop_attempts: int = 256,
    max_sweeps: int = 160,
):
    """Grow MB candidate boards JOINTLY through one shared compacted
    frontier (Board::new semantics per board, src/board.rs:27-48).

    The vmapped per-board formulation paid (MB x max_attempts) dense
    proposal slots every sweep even though dead candidates (the vast
    majority on no-board passes) contribute zero real attempts — on
    this backend, where big XLA ops stream at a few GB/s, that width is
    the whole cost. Here every sweep compacts the LIVE (board, cell,
    dir) attempts of all boards into one proposal axis:

    * sweep 1 is hoisted at full width 4*MB (every candidate attempts
      exactly its center cell's four directions — never truncated);
    * the loop then runs at ``loop_attempts`` width, which covers the
      real frontiers (a growing 6x6 board carries ~40 live attempts);
      overflow defers attempts to the next sweep (failure-mark progress
      keeps the loop alive, so deferral is lossless as long as the
      generous ``max_sweeps`` safety bound — dynamic: quiesced loops
      exit early and never pay it — is not hit). Attempts still live
      when the bound fires ARE dropped work, so the final frontier is
      counted into the returned audit; routine in-flight deferral that
      later processes is NOT flagged (it is not capacity pressure).

    Boards stay fully independent: per-board claim keys in the conflict
    resolution, per-board active masks (flat (MB*N,) with per-proposal
    offsets into propose_expansions). With no loop-width overflow the
    per-board results are bit-identical to ``grow_board`` (pinned by
    tests/test_board_joint.py).

    Returns (BoardState with leading (MB,) axis and zeroed per-board
    pruned, audit_scalar) where audit_scalar = kNN-pool prunes summed
    over live proposals + loop-width truncation events.
    """
    g = 2 * grid_radius + 1
    g2 = g * g
    center = grid_radius * g + grid_radius
    n = saddles.valid.shape[0]
    mb = seed_quads.shape[0]

    tgt_np, ok_np = _neighbor_arrays(grid_radius)
    tgt_flat_np = tgt_np.reshape(-1)
    tgt_map_flat = jnp.asarray(tgt_flat_np)
    tgt_ok = jnp.asarray(ok_np)

    # flat state with one trailing garbage slot
    cell_quad = jnp.full((mb * g2 + 1, 4), -1, jnp.int32)
    cell_quad = cell_quad.at[
        jnp.arange(mb) * g2 + center
    ].set(seed_quads)
    placed = jnp.zeros(mb * g2 + 1, bool).at[
        jnp.arange(mb) * g2 + center
    ].set(seed_ok)
    failed = jnp.zeros(mb * g2 + 1, bool)
    # seed consumes quad[1:] only (src/board.rs:34-36)
    active = jnp.broadcast_to(active_in, (mb, n)).reshape(-1)
    active = jnp.concatenate([active, jnp.zeros(1, bool)])
    seed_used = jnp.where(
        seed_ok[:, None], jnp.arange(mb)[:, None] * n + seed_quads[:, 1:],
        mb * n,
    )
    active = active.at[seed_used.reshape(-1)].set(False)

    def process(state, b, cell, d, live):
        """One sweep's proposal batch: propose + conflicts + apply.
        (b, cell, d) in board-major / cell-major / dir-minor order —
        each board's internal priority order is exactly grow_board's."""
        cell_quad, placed, failed, active, _, it, audit = state
        tgt_local = jnp.where(live, tgt_map_flat[cell * 4 + d], g2)

        rot_ix = (d[:, None] + jnp.arange(4)[None, :]) % 4
        src = cell_quad[jnp.where(live, b * g2 + cell, mb * g2)]
        rot = jnp.take_along_axis(src, rot_ix, axis=1)
        # dead slots carry -1 quads; clamp for safe gathers (their
        # validity is masked off below)
        rot_safe = jnp.maximum(rot, 0)

        new_q, valid, pool_ovf = propose_expansions(
            saddles, knn, alive, rot_safe, active, spacing_ratio,
            act_off=b * n,
        )
        valid &= live & (rot >= 0).all(axis=1)
        audit = audit + jnp.sum(pool_ovf & live).astype(jnp.int32)
        unrot_ix = (jnp.arange(4)[None, :] - d[:, None]) % 4
        quad = jnp.take_along_axis(new_q, unrot_ix, axis=1)

        # per-board claim keys: boards never contend with each other
        accept = resolve_conflicts(
            jnp.where(tgt_local < g2, b * g2 + tgt_local, mb * g2),
            b[:, None] * n + quad,
            valid,
            mb * n,
            mb * g2,
        )

        scatter_tgt = jnp.where(accept, b * g2 + tgt_local, mb * g2)
        cell_quad = cell_quad.at[scatter_tgt].set(quad)
        placed = placed.at[scatter_tgt].set(True)
        used = jnp.where(accept[:, None], b[:, None] * n + quad, mb * n)
        active = active.at[used.reshape(-1)].set(False)
        fail_t = jnp.where(
            live & ~valid & (tgt_local < g2), b * g2 + tgt_local, mb * g2
        )
        new_failed = failed.at[fail_t].set(True)
        progressed = accept.any() | (new_failed != failed).any()
        return (
            cell_quad, placed, new_failed, active, progressed, it + 1,
            audit,
        )

    # -- sweep 1, hoisted at full width: all centers x 4 directions ----
    b1 = jnp.repeat(jnp.arange(mb, dtype=jnp.int32), 4)
    cell1 = jnp.full(4 * mb, center, jnp.int32)
    d1 = jnp.tile(jnp.arange(4, dtype=jnp.int32), mb)
    state = (
        cell_quad, placed, failed, active, seed_ok.any(), jnp.int32(1),
        jnp.int32(0),
    )
    state = process(state, b1, cell1, d1, seed_ok[b1])

    # -- remaining sweeps on the compacted live frontier ---------------
    tgt_safe_np = jnp.minimum(jnp.asarray(tgt_np), g2 - 1)

    def attempts(placed, failed):
        placed2 = placed[: mb * g2].reshape(mb, g2)
        failed2 = failed[: mb * g2].reshape(mb, g2)
        return (
            placed2[:, :, None]
            & tgt_ok[None]
            & ~placed2[:, tgt_safe_np]
            & ~failed2[:, tgt_safe_np]
        ).reshape(-1)

    def sweep(state):
        att = attempts(state[1], state[2])
        total = mb * g2 * 4
        (sel,) = jnp.nonzero(att, size=loop_attempts, fill_value=total)
        live = sel < total
        safe = jnp.minimum(sel, total - 1)
        b = (safe // (g2 * 4)).astype(jnp.int32)
        rem = safe % (g2 * 4)
        cell = (rem // 4).astype(jnp.int32)
        d = (rem % 4).astype(jnp.int32)
        return process(state, b, cell, d, live)

    def cond(state):
        return state[4] & (state[5] < max_sweeps)

    state = lax.while_loop(cond, sweep, state)
    cell_quad, placed, failed, active, _, _, audit = state
    # attempts still live when the sweep bound fired are DROPPED work
    # relative to the unbounded reference recursion — audit them. A
    # quiesced loop has an all-false mask here, so routine deferral
    # that eventually processed costs nothing.
    audit = audit + jnp.sum(attempts(placed, failed)).astype(jnp.int32)

    cell_quad = cell_quad[: mb * g2].reshape(mb, g2, 4)
    placed2 = placed[: mb * g2].reshape(mb, g2)
    failed2 = failed[: mb * g2].reshape(mb, g2) & ~placed2
    active2 = active[: mb * n].reshape(mb, n)
    boards = BoardState(
        cell_quad=cell_quad,
        placed=placed2,
        failed=failed2,
        active=active2,
        score=placed2.sum(axis=1).astype(jnp.int32),
        pruned=jnp.zeros(mb, jnp.int32),
    )
    return boards, audit


def fix_missing(saddles, board: BoardState, alive: jnp.ndarray, grid_radius: int) -> BoardState:
    """Repair holes whose opposite neighbors are both placed
    (try_fix_missing, src/board.rs:52-112)."""
    g = 2 * grid_radius + 1
    g2 = g * g
    present = board.placed | board.failed
    tgt_np, ok_np = _neighbor_arrays(grid_radius)
    tgt_map = jnp.asarray(tgt_np)
    tgt_ok = jnp.asarray(ok_np)

    def nb(d):
        return jnp.minimum(tgt_map[:, d], g2 - 1), tgt_ok[:, d]

    t_px, ok_px = nb(0)   # +x
    t_mx, ok_mx = nb(2)   # -x
    t_py, ok_py = nb(3)   # +y
    t_my, ok_my = nb(1)   # -y

    hole = board.failed
    h_present = ok_px & present[t_px] & ok_mx & present[t_mx]
    h_ok = h_present & board.placed[t_px] & board.placed[t_mx]
    v_present = ok_py & present[t_py] & ok_my & present[t_my]
    v_ok = v_present & board.placed[t_py] & board.placed[t_my]
    # reference elif: horizontal presence shadows the vertical branch
    use_h = hole & h_present & h_ok
    use_v = hole & ~h_present & v_present & v_ok
    fix = use_h | use_v

    # compact the fixable holes: real boards repair a handful of cells,
    # but the dense form paid a (G2, 4, N) distance volume + G2-wide
    # quad predicates for all 625 cells. cap=32 is far beyond any
    # physical board's interior hole count; a (pathological) overflow
    # drops the excess repairs — counted into the pruned audit channel
    # by the caller via the returned scalar.
    cap = 32
    (cells,) = jnp.nonzero(fix, size=cap, fill_value=g2)
    live = cells < g2
    safe = jnp.minimum(cells, g2 - 1)
    overflow = fix.sum().astype(jnp.int32) - live.sum().astype(jnp.int32)

    b0 = jnp.where(use_h[safe], t_px[safe], t_py[safe])
    b1 = jnp.where(use_h[safe], t_mx[safe], t_my[safe])
    q0 = board.cell_quad[b0]  # (cap, 4)
    q1 = board.cell_quad[b1]
    mid = (saddles.p[jnp.maximum(q0, 0)] + saddles.p[jnp.maximum(q1, 0)]) / 2.0

    # 1-NN over the round's alive saddles — reference queries the kd-tree
    # without the board-active gate (src/board.rs:88)
    d2 = jnp.sum(
        (saddles.p[None, None, :, :] - mid[:, :, None, :]) ** 2, axis=-1
    )
    d2 = jnp.where(alive[None, None, :], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # (cap, 4)

    good = live & is_valid_quad_idx(saddles, nearest)
    tgt_cells = jnp.where(good, safe, g2)
    cell_quad = board.cell_quad.at[tgt_cells].set(nearest, mode="drop")
    placed = board.placed.at[tgt_cells].set(True, mode="drop")
    failed = board.failed.at[tgt_cells].set(False, mode="drop")
    return board._replace(
        cell_quad=cell_quad,
        placed=placed,
        failed=failed,
    ), overflow

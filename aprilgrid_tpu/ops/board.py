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
):
    """Batched try_expand_one (src/board.rs:153-234).

    ``quads``: (P, 4) rotated source quads [s0, s1, s2, s3]. Returns
    (new_quads (P, 4), valid (P,)) — the first valid candidate combo per
    proposal, in reference nesting order. Candidate search is pruned to
    the k-NN list of the edge endpoint nearest each extrapolated target.
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
    # s2 — prune the N-wide search to those endpoints' k-NN lists
    pool = jnp.stack(
        [knn[quads[:, 1]], knn[quads[:, 1]], knn[quads[:, 2]], knn[quads[:, 2]]],
        axis=1,
    )  # (P, 4, K)
    pool_p = saddles.p[pool]  # (P, 4, K, 2)
    d2 = jnp.sum((pool_p - targets[:, :, None, :]) ** 2, axis=-1)
    # the reference tree holds the round's surviving saddles (board-
    # consumed ones included — those are gated by `active` afterwards)
    d2 = jnp.where(alive[pool], d2, jnp.inf)
    neg, slot = lax.top_k(-d2, 3)  # (P, 4, 3) nearest-first
    idx = jnp.take_along_axis(pool, slot, axis=-1)
    dist_sq = -neg
    ok = (
        jnp.isfinite(dist_sq)
        & (dist_sq <= radius_sq[..., None])
        & active[idx]
        & (theta_distance_degree(t[..., None], saddles.theta[idx]) < 5.0)
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
    endpoints = jnp.stack([p[:, 1], p[:, 1], p[:, 2], p[:, 2]], axis=1)
    d2_ep = jnp.sum((pool_p - endpoints[:, :, None, :]) ** 2, axis=-1)
    r_pool = jnp.sqrt(jnp.max(jnp.where(alive[pool], d2_ep, 0.0), axis=-1))
    d_et = jnp.sqrt(jnp.sum((targets - endpoints) ** 2, axis=-1))
    d3 = jnp.sqrt(jnp.minimum(dist_sq[..., 2], jnp.float32(1e30)))
    covered = (d_et + d3 <= r_pool) | (jnp.sum(alive) <= pool.shape[-1])
    pool_overflow = (~covered).any(axis=-1)  # (P,)

    # compact each 3-candidate list (reference iterates passing entries
    # in distance order, src/board.rs:197-232)
    order = jnp.argsort(~ok, axis=-1, stable=True)
    idx = jnp.take_along_axis(idx, order, axis=-1)
    ok = jnp.take_along_axis(ok, order, axis=-1)

    combos = jnp.asarray(_combo_index())  # (81, 4)
    corner = jnp.arange(4)
    cand = idx[:, corner[None, :], combos]        # (P, 81, 4)
    cand_ok = ok[:, corner[None, :], combos].all(-1)
    cand_ok &= is_valid_quad_idx(saddles, cand)

    first = jnp.argmax(cand_ok, axis=-1)          # (P,) first valid combo
    new_quads = jnp.take_along_axis(
        cand, first[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    return new_quads, cand_ok.any(axis=-1), pool_overflow


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

        # conflict resolution: a valid proposal is deferred when any
        # earlier valid proposal shares its target cell or a saddle
        same_tgt = tgt[:, None] == tgt[None, :]
        share = (quad[:, None, :, None] == quad[None, :, None, :]).any((-1, -2))
        p_idx = jnp.arange(tgt.shape[0])
        earlier = (p_idx[None, :] < p_idx[:, None]) & valid[None, :]
        blocked = (earlier & (same_tgt | share)).any(axis=1)
        accept = valid & ~blocked

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

    b0 = jnp.where(use_h, t_px, t_py)
    b1 = jnp.where(use_h, t_mx, t_my)
    q0 = board.cell_quad[b0]  # (G2, 4)
    q1 = board.cell_quad[b1]
    mid = (saddles.p[jnp.maximum(q0, 0)] + saddles.p[jnp.maximum(q1, 0)]) / 2.0

    # 1-NN over the round's alive saddles — reference queries the kd-tree
    # without the board-active gate (src/board.rs:88)
    d2 = jnp.sum(
        (saddles.p[None, None, :, :] - mid[:, :, None, :]) ** 2, axis=-1
    )
    d2 = jnp.where(alive[None, None, :], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # (G2, 4)

    good = fix & is_valid_quad_idx(saddles, nearest)
    cell_quad = jnp.where(good[:, None], nearest, board.cell_quad)
    placed = board.placed | good
    return board._replace(
        cell_quad=cell_quad,
        placed=placed,
        failed=board.failed & ~good,
    )

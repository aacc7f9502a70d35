"""Board growth: associate saddles into a Kalibr AprilGrid.

The reference grows a board from a seed quad by recursive depth-first
expansion over grid cells, extrapolating each quad edge outward by
(1 + spacing_ratio) and validating 3-nearest-neighbor candidate corners
(Board::try_expand / try_expand_one / find_closest_potential_saddle_idxs,
src/board.rs:114-234), then repairs interior holes from opposite
neighbors (try_fix_missing, src/board.rs:52-112).

Recursion is inherently sequential, so the TPU recast grows the whole
frontier in parallel: every (placed cell, direction) proposes an
expansion each sweep, conflicts (two proposals claiming the same target
cell or the same saddle) are resolved by proposal order, and sweeps
repeat inside a ``lax.while_loop`` until no placement happens. A 6x6
board settles in ~10-14 sweeps instead of ~150 sequential expansions.
The geometric predicates (edge extrapolation, radius gate, orientation
gate, quad validity, candidate ordering) match the reference exactly, so
on clean data the resulting board is identical; only the traversal order
differs. Boards for many seed quads grow concurrently via ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
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


def _neighbor_cells(grid_radius: int):
    """Static target-cell index map (G2, 4) plus in-grid mask."""
    g = 2 * grid_radius + 1
    g2 = g * g
    cells = jnp.arange(g2, dtype=jnp.int32)
    cx = cells % g
    cy = cells // g
    tgt = []
    ok = []
    for dx, dy in _DIRS:
        tx = cx + dx
        ty = cy + dy
        inside = (tx >= 0) & (tx < g) & (ty >= 0) & (ty < g)
        tgt.append(jnp.where(inside, ty * g + tx, g2))
        ok.append(inside)
    return jnp.stack(tgt, -1), jnp.stack(ok, -1)  # (G2, 4), (G2, 4)


def _closest_candidates(saddles, target, ref_theta, radius_sq, active):
    """3-NN of ``target`` gated by radius/active/orientation
    (src/board.rs:177-234). Leading dims broadcast.

    Returns (cand_idx (..., 3), cand_ok (..., 3)) in distance order.
    """
    d2 = jnp.sum((saddles.p - target[..., None, :]) ** 2, axis=-1)
    d2 = jnp.where(saddles.valid, d2, jnp.inf)
    neg, idx = lax.top_k(-d2, 3)
    dist_sq = -neg
    ok = (
        jnp.isfinite(dist_sq)
        & (dist_sq <= radius_sq[..., None])
        & jnp.take_along_axis(
            jnp.broadcast_to(active, d2.shape), idx, axis=-1
        )
        & (
            theta_distance_degree(ref_theta[..., None], saddles.theta[idx])
            < 5.0
        )
    )
    return idx, ok


def _propose(saddles, quad, active, spacing_ratio):
    """One try_expand_one (src/board.rs:153-176) for a rotated quad.

    ``quad`` is the rotated [s0, s1, s2, s3]; returns (new_quad (4,),
    valid ()) — the first valid combination in reference nesting order.
    """
    p = saddles.p[quad]       # (4, 2)
    t = saddles.theta[quad]   # (4,)
    ratio = 1.0 + spacing_ratio

    def side(i_a, i_b):
        va = p[i_a]
        vb = p[i_b]
        v = vb - va
        radius_sq = 0.5 * jnp.sum(v * v)
        new_a = va + v * ratio
        new_b = vb + v * ratio
        ia, oa = _closest_candidates(saddles, new_a, t[i_a], radius_sq, active)
        ib, ob = _closest_candidates(saddles, new_b, t[i_b], radius_sq, active)
        return ia, oa, ib, ob

    # find(s0, s1) -> candidates for new corners 0 and 1;
    # find(s3, s2) -> candidates for new corners 3 and 2 (src/board.rs:158-159)
    i0, o0, i1, o1 = side(0, 1)
    i3, o3, i2, o2 = side(3, 2)

    # compact each candidate list (reference keeps passing entries in
    # order, combos iterate compacted lists) — with <=3 entries, stable
    # ordering of passing entries is what matters.
    def compact(idx, ok):
        order = jnp.argsort(~ok, stable=True)  # passing first, stable
        return idx[order], ok[order]

    i0, o0 = compact(i0, o0)
    i1, o1 = compact(i1, o1)
    i2, o2 = compact(i2, o2)
    i3, o3 = compact(i3, o3)

    # 81 combos in nested order idx0 > idx1 > idx2 > idx3
    a = jnp.arange(3)
    c0 = jnp.repeat(a, 27)
    c1 = jnp.tile(jnp.repeat(a, 9), 3)
    c2 = jnp.tile(jnp.repeat(a, 3), 9)
    c3 = jnp.tile(a, 27)
    combo = jnp.stack([i0[c0], i1[c1], i2[c2], i3[c3]], -1)  # (81, 4)
    combo_ok = o0[c0] & o1[c1] & o2[c2] & o3[c3]
    combo_ok &= is_valid_quad_idx(saddles, combo)

    first = jnp.argmax(combo_ok)  # first valid combo
    return combo[first], combo_ok.any()


def grow_board(
    saddles,
    seed_quad: jnp.ndarray,
    seed_valid: jnp.ndarray,
    active_in: jnp.ndarray,
    spacing_ratio: float,
    grid_radius: int,
    max_sweeps: int = 24,
) -> BoardState:
    """Grow one board from a seed quad (Board::new, src/board.rs:27-48)."""
    g = 2 * grid_radius + 1
    g2 = g * g
    center = grid_radius * g + grid_radius
    n = saddles.valid.shape[0]

    tgt_map, tgt_ok = _neighbor_cells(grid_radius)

    cell_quad = jnp.full((g2, 4), -1, jnp.int32).at[center].set(seed_quad)
    placed = jnp.zeros(g2, bool).at[center].set(seed_valid)
    failed = jnp.zeros(g2, bool)
    # seed consumes quad[1:] only (src/board.rs:34-36)
    active = active_in & ~(
        jnp.zeros(n, bool).at[seed_quad[1:]].set(True)
    )
    active = jnp.where(seed_valid, active, active_in)

    max_attempts = 128

    def sweep(state):
        cell_quad, placed, failed, active, _, it = state

        # frontier attempts: placed cell x direction with unplaced target,
        # in cell-major / direction-minor priority order
        tgt_all = tgt_map.reshape(-1)  # (G2*4,)
        attempt_all = (
            placed[:, None]
            & tgt_ok
            & ~placed[jnp.minimum(tgt_map, g2 - 1)]
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

        new_q, valid = jax.vmap(
            lambda q: _propose(saddles, q, active, spacing_ratio)
        )(rot)
        valid &= live
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
        attempt = live

        # apply accepted placements (targets now distinct)
        scatter_tgt = jnp.where(accept, tgt, g2)
        cell_quad = cell_quad.at[scatter_tgt].set(quad, mode="drop")
        placed = placed.at[scatter_tgt].set(True, mode="drop")
        # consumed saddles (src/board.rs:140-142 marks all four)
        used = jnp.where(accept[:, None], quad, n)
        active = active.at[used.reshape(-1)].set(False, mode="drop")
        # failure marks (reference inserts None, src/board.rs:148)
        fail_t = jnp.where(attempt & ~valid, tgt, g2)
        failed = failed.at[fail_t].set(True, mode="drop")
        return cell_quad, placed, failed, active, accept.any(), it + 1

    def cond(state):
        return state[4] & (state[5] < max_sweeps)

    init = (cell_quad, placed, failed, active, seed_valid, jnp.int32(0))
    state = lax.while_loop(cond, sweep, init)
    cell_quad, placed, failed, active, _, _ = state
    failed &= ~placed
    return BoardState(
        cell_quad=cell_quad,
        placed=placed,
        failed=failed,
        active=active,
        score=placed.sum().astype(jnp.int32),
    )


def fix_missing(saddles, board: BoardState, grid_radius: int) -> BoardState:
    """Repair holes whose opposite neighbors are both placed
    (try_fix_missing, src/board.rs:52-112)."""
    g = 2 * grid_radius + 1
    g2 = g * g
    present = board.placed | board.failed
    tgt_map, tgt_ok = _neighbor_cells(grid_radius)

    def nb(d):
        t = jnp.minimum(tgt_map[:, d], g2 - 1)
        ok = tgt_ok[:, d]
        return t, ok

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

    # 1-NN over all (valid) saddles — reference queries the kd-tree
    # without the active gate (src/board.rs:88)
    d2 = jnp.sum(
        (saddles.p[None, None, :, :] - mid[:, :, None, :]) ** 2, axis=-1
    )
    d2 = jnp.where(saddles.valid[None, None, :], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # (G2, 4)

    good = fix & is_valid_quad_idx(saddles, nearest)
    cell_quad = jnp.where(good[:, None], nearest, board.cell_quad)
    placed = board.placed | good
    return board._replace(
        cell_quad=cell_quad,
        placed=placed,
        failed=board.failed & ~good,
    )

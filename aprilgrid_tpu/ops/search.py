"""Best-board search: seed selection + grouped parallel board growth.

The reference's try_find_best_board (src/detector.rs:588-639) histograms
saddle orientations, seeds from the largest bucket (popped back-to-front,
at most 30 seeds), grows a Board from every candidate quad of each seed,
keeps the first strictly-best score, and early-exits at score >= 36.

TPU recast: "first strictly-greater score" over an ordered candidate
stream equals "first maximum", so seeds are processed in small groups —
all candidate quads of a group grow concurrently in one ``vmap`` (their
sweeps run in lockstep inside a single ``lax.while_loop``) and the group
loop early-exits exactly like the reference seed loop. The common case
(first group contains a full-board quad) costs one group iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .board import BoardState, fix_missing, grow_boards_joint, knn_table
from .geometry import rust_round
from .quads import init_quads


class SearchResult(NamedTuple):
    board: BoardState
    found: jnp.ndarray  # () bool


def _seed_order(saddles, alive: jnp.ndarray, max_seeds: int):
    """Seeds = members of the largest integer-theta histogram bucket,
    consumed from the back (src/detector.rs:601-617).

    Returns (seed_idx (max_seeds,), seed_ok (max_seeds,)).
    """
    n = saddles.valid.shape[0]
    bucket = (rust_round(saddles.theta).astype(jnp.int32) + 90).clip(0, 180)
    counts = jnp.zeros(181, jnp.int32).at[jnp.where(alive, bucket, 181)].add(
        1, mode="drop"
    )
    best_bucket = jnp.argmax(counts)
    member = alive & (bucket == best_bucket)
    # descending index order: nonzero over the reversed mask
    (rev_idx,) = jnp.nonzero(member[::-1], size=max_seeds, fill_value=n)
    seed_ok = rev_idx < n
    seed_idx = jnp.where(seed_ok, n - 1 - rev_idx, 0)
    return seed_idx.astype(jnp.int32), seed_ok


def find_best_board(
    saddles,
    alive: jnp.ndarray,
    spacing_ratio: float,
    grid_radius: int,
    nn: int,
    max_quads: int,
    max_boards: int,
    seeds_per_group: int,
    max_attempts: int,
    max_seeds: int,
    early_exit_score: int,
    knn_pool: int = 64,
) -> SearchResult:
    """try_find_best_board (src/detector.rs:588-639) on fixed-capacity
    arrays. ``alive`` plays the role of the re-filtered refined list."""
    n = saddles.valid.shape[0]
    g2 = (2 * grid_radius + 1) ** 2

    seed_idx, seed_ok = _seed_order(saddles, alive, max_seeds)
    num_groups = -(-max_seeds // seeds_per_group)
    knn = knn_table(saddles, alive, knn_pool)

    def empty_board() -> BoardState:
        return BoardState(
            cell_quad=jnp.full((g2, 4), -1, jnp.int32),
            placed=jnp.zeros(g2, bool),
            failed=jnp.zeros(g2, bool),
            active=alive,
            score=jnp.int32(0),
            pruned=jnp.int32(0),
        )

    def group_body(state):
        gi, best, audit = state
        s_slots = gi * seeds_per_group + jnp.arange(seeds_per_group)
        s_ok = seed_ok[jnp.minimum(s_slots, max_seeds - 1)] & (
            s_slots < max_seeds
        )
        s_idx = seed_idx[jnp.minimum(s_slots, max_seeds - 1)]

        # candidate quads of all seeds in the group, seed-major order
        qs = jax.vmap(
            lambda s, ok: init_quads(
                saddles, alive & ok, jnp.minimum(s, n - 1), nn, max_quads
            )
        )(s_idx, s_ok)
        flat_q = qs.quads.reshape(-1, 4)
        flat_ok = (qs.valid & s_ok[:, None]).reshape(-1)
        total = flat_ok.shape[0]
        (sel,) = jnp.nonzero(flat_ok, size=max_boards, fill_value=total)
        b_ok = sel < total
        b_q = flat_q[jnp.minimum(sel, total - 1)]

        boards, grow_audit = grow_boards_joint(
            saddles, knn, alive, b_q, b_ok, alive, spacing_ratio,
            grid_radius, loop_attempts=max(256, max_attempts),
        )
        # density-audit counts accumulate over EVERY candidate grown,
        # not just the winner — an overflow in a LOSING board may be
        # exactly why it lost, and must still be surfaced. init_quads'
        # cheap-gate compaction overflow and the joint-frontier
        # truncation counter ride the same audit channel.
        audit = audit + grow_audit
        audit = audit + jnp.sum(jnp.where(s_ok, qs.overflow, 0))
        scores = jnp.where(b_ok, boards.score, 0)
        # The reference checks the early-exit score after each SEED's
        # candidate loop: once a seed's best board reaches it, later
        # seeds never displace the winner. With seeds_per_group > 1 the
        # group must honor that boundary — restrict the argmax to
        # candidates up to (and including) the first seed whose running
        # best crosses the threshold (src/detector.rs:622-630).
        seed_of = jnp.minimum(sel, total - 1) // max_quads
        cmax = lax.associative_scan(jnp.maximum, scores)
        reached = cmax >= early_exit_score
        s_star = seed_of[jnp.argmax(reached)]
        in_cut = jnp.where(reached.any(), seed_of <= s_star, True)
        j = jnp.argmax(jnp.where(in_cut, scores, -1))  # first max in cut
        cand = jax.tree.map(lambda x: x[j], boards)
        take = scores[j] > best.score
        best = jax.tree.map(
            lambda b, c: jnp.where(jnp.reshape(take, (1,) * b.ndim), c, b),
            best,
            cand,
        )
        return gi + 1, best, audit

    def group_cond(state):
        gi, best, _ = state
        more = (gi < num_groups) & seed_ok[
            jnp.minimum(gi * seeds_per_group, max_seeds - 1)
        ]
        return more & (best.score < early_exit_score)

    _, best, audit = lax.while_loop(
        group_cond, group_body, (jnp.int32(0), empty_board(), jnp.int32(0))
    )

    found = best.score > 0
    best, fm_overflow = fix_missing(saddles, best, alive, grid_radius)
    best = best._replace(pruned=(audit + fm_overflow).astype(jnp.int32))
    return SearchResult(board=best, found=found)

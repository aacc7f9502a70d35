"""Best-board search: seed selection + chunked parallel board growth.

The reference's try_find_best_board (src/detector.rs:588-639) histograms
saddle orientations, seeds from the largest bucket (popped back-to-front,
at most 30 seeds), grows a Board from every candidate quad of each seed,
keeps the first strictly-best score, and early-exits at score >= 36.

TPU recast: the seed loop is a ``lax.while_loop``; within a seed the
candidate quads grow in ``vmap``-ed chunks so the common case (first seed
quad reaches the full 36-tag board) costs one chunk of parallel growths.
"chunk argmax = first max" preserves the reference's first-strictly-best
tie-breaking across the in-order quad stream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .board import BoardState, fix_missing, grow_board
from .geometry import rust_round
from .quads import init_quads


class SearchResult(NamedTuple):
    board: BoardState
    found: jnp.ndarray  # () bool


def _seed_order(saddles, alive: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Seeds = members of the largest integer-theta histogram bucket,
    consumed from the back (src/detector.rs:601-617).

    Returns (seed_idx (N,), num_seeds ()) — seed_idx[i] is the i-th seed
    to process (descending saddle index within the winning bucket).
    """
    n = saddles.valid.shape[0]
    bucket = (rust_round(saddles.theta).astype(jnp.int32) + 90).clip(0, 180)
    onehot = (
        jax.nn.one_hot(bucket, 181, dtype=jnp.float32)
        * alive.astype(jnp.float32)[:, None]
    )
    counts = onehot.sum(axis=0)
    best_bucket = jnp.argmax(counts)
    member = alive & (bucket == best_bucket)
    # descending index order: nonzero over the reversed mask
    (rev_idx,) = jnp.nonzero(member[::-1], size=n, fill_value=n)
    seed_idx = jnp.where(rev_idx < n, n - 1 - rev_idx, n)
    return seed_idx.astype(jnp.int32), member.sum().astype(jnp.int32)


def find_best_board(
    saddles,
    alive: jnp.ndarray,
    spacing_ratio: float,
    grid_radius: int,
    nn: int,
    max_quads: int,
    quad_chunk: int,
    max_seeds: int,
    early_exit_score: int,
) -> SearchResult:
    """try_find_best_board (src/detector.rs:588-639) on fixed-capacity
    arrays. ``alive`` plays the role of the re-filtered refined list."""
    n = saddles.valid.shape[0]
    g2 = (2 * grid_radius + 1) ** 2

    seed_idx, num_seeds = _seed_order(saddles, alive)
    num_seeds = jnp.minimum(num_seeds, max_seeds)

    def empty_board() -> BoardState:
        return BoardState(
            cell_quad=jnp.full((g2, 4), -1, jnp.int32),
            placed=jnp.zeros(g2, bool),
            failed=jnp.zeros(g2, bool),
            active=alive,
            score=jnp.int32(0),
        )

    def grow_chunk(quads, quads_valid):
        return jax.vmap(
            lambda q, v: grow_board(
                saddles, q, v, alive, spacing_ratio, grid_radius
            )
        )(quads, quads_valid)

    def pick_better(best: BoardState, cand: BoardState, cand_score):
        take = cand_score > best.score
        return jax.tree.map(
            lambda b, c: jnp.where(
                jnp.reshape(take, (1,) * b.ndim), c, b
            ),
            best,
            cand,
        )

    def seed_body(state):
        si, best = state
        s0 = jnp.minimum(seed_idx[si], n - 1)
        qs = init_quads(saddles, alive, s0, nn, max_quads)

        def chunk_cond(cstate):
            ci, best_c = cstate
            start = ci * quad_chunk
            has_more = qs.valid[jnp.minimum(start, max_quads - 1)] & (
                start < max_quads
            )
            return has_more

        def chunk_body(cstate):
            ci, best_c = cstate
            start = ci * quad_chunk
            idxs = start + jnp.arange(quad_chunk)
            safe = jnp.minimum(idxs, max_quads - 1)
            cq = qs.quads[safe]
            cv = qs.valid[safe] & (idxs < max_quads)
            boards = grow_chunk(cq, cv)
            scores = jnp.where(cv, boards.score, 0)
            j = jnp.argmax(scores)  # first max in chunk order
            cand = jax.tree.map(lambda x: x[j], boards)
            best_c = pick_better(best_c, cand, scores[j])
            return ci + 1, best_c

        _, best = lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), best))
        return si + 1, best

    def seed_cond(state):
        si, best = state
        return (si < num_seeds) & (best.score < early_exit_score)

    _, best = lax.while_loop(seed_cond, seed_body, (jnp.int32(0), empty_board()))

    found = best.score > 0
    best = fix_missing(saddles, best, grid_radius)
    return SearchResult(board=best, found=found)

"""Joint-frontier board growth == per-board growth, bit for bit.

grow_boards_joint folds the board axis of a seed group into one shared
compacted frontier (dead candidates contribute zero proposal slots).
Boards stay independent — per-board conflict claim keys, per-board
active masks — so with no loop-width truncation every board's final
state must equal the vmapped per-board ``grow_board`` exactly: same
cell_quad, placed, failed, active and score. Checked on the real EuRoC
board scene (a full 36-cell growth) and on randomized synthetic scenes
(grids with jitter + clutter, no-board noise).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from aprilgrid_tpu.ops.board import (  # noqa: E402
    grow_board,
    grow_boards_joint,
    knn_table,
)
from aprilgrid_tpu.ops.quads import init_quads  # noqa: E402
from aprilgrid_tpu.ops.rochade import Saddles  # noqa: E402

SPACING = 0.3
RADIUS = 12


def _mk_saddles(p, th):
    n = p.shape[0]
    return Saddles(
        p=jnp.asarray(p, jnp.float32),
        k=jnp.zeros(n, jnp.float32),
        theta=jnp.asarray(th, jnp.float32),
        phi=jnp.zeros(n, jnp.float32),
        valid=jnp.ones(n, bool),
    )


def _compare(saddles, alive, seed_quads, seed_ok):
    knn = knn_table(saddles, alive, 64)
    want = jax.vmap(
        lambda q, v: grow_board(
            saddles, knn, alive, q, v, alive, SPACING, RADIUS,
            max_attempts=64,
        )
    )(seed_quads, seed_ok)
    got, _audit = grow_boards_joint(
        saddles, knn, alive, seed_quads, seed_ok, alive, SPACING, RADIUS,
        loop_attempts=256,
    )
    np.testing.assert_array_equal(np.asarray(got.placed), np.asarray(want.placed))
    np.testing.assert_array_equal(np.asarray(got.failed), np.asarray(want.failed))
    np.testing.assert_array_equal(np.asarray(got.score), np.asarray(want.score))
    np.testing.assert_array_equal(np.asarray(got.active), np.asarray(want.active))
    # cell_quad only compares where placed (unplaced cells are -1 in
    # both, but the joint garbage slot never leaks into real cells)
    pm = np.asarray(want.placed)[..., None]
    np.testing.assert_array_equal(
        np.where(pm, np.asarray(got.cell_quad), -1),
        np.where(pm, np.asarray(want.cell_quad), -1),
    )


def _candidates(saddles, alive, seed_idx, mb=32):
    qs = init_quads(saddles, alive, jnp.int32(seed_idx), 50, 32)
    (sel,) = jnp.nonzero(qs.valid, size=mb, fill_value=qs.valid.shape[0])
    ok = sel < qs.valid.shape[0]
    q = qs.quads[jnp.minimum(sel, qs.valid.shape[0] - 1)]
    return q, ok


def test_euroc_board_scene(data_dir):
    from aprilgrid_tpu.oracle import numpy_ref as R

    img = R.load_image(str(data_dir / "EuRoC.png"))
    ref = R.refined_saddle_points(img)
    n = 512
    p = np.zeros((n, 2), np.float32)
    th = np.zeros(n, np.float32)
    for i, s in enumerate(ref[:n]):
        p[i] = s.p
        th[i] = s.theta
    saddles = _mk_saddles(p, th)
    alive = jnp.asarray(np.arange(n) < len(ref[:n]))
    # seeds from a few distinct saddles — full boards AND dead quads
    for seed in (0, 17, 101):
        q, ok = _candidates(saddles, alive, seed)
        _compare(saddles, alive, q, ok)


@pytest.mark.parametrize("seed", range(6))
def test_randomized_scenes(seed):
    rng = np.random.default_rng(seed)
    n = 256
    if seed % 2 == 0:
        # jittered grid (board-like): 13x13 lattice + clutter
        g = rng.normal(0, 0.35, size=(13, 13, 2)).astype(np.float32)
        base = np.stack(
            np.meshgrid(np.arange(13) * 14.0, np.arange(13) * 14.0),
            axis=-1,
        ).astype(np.float32)
        pts = (base + g).reshape(-1, 2)[: n - 40]
        clutter = rng.uniform(0, 190, size=(n - pts.shape[0], 2)).astype(
            np.float32
        )
        p = np.concatenate([pts, clutter])
        th = np.where(
            rng.random(n) < 0.5, 10.0, 100.0
        ).astype(np.float32) + rng.normal(0, 1.5, n).astype(np.float32)
    else:
        # pure noise (no-board)
        p = rng.uniform(0, 400, size=(n, 2)).astype(np.float32)
        th = rng.uniform(-90, 90, size=n).astype(np.float32)
    saddles = _mk_saddles(p, th)
    alive = jnp.asarray(rng.random(n) < 0.9)
    q, ok = _candidates(saddles, alive, int(rng.integers(0, n)))
    _compare(saddles, alive, q, ok)

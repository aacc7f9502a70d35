"""Scatter-claim conflict resolution == the dense pairwise oracle.

grow_board's sweep defers a valid proposal when an earlier valid
proposal shares its target cell or one of its four saddles
(reference expansion order, src/board.rs:114-152). The production
formulation stamps scatter-min claims; the original (P, P, 4, 4)
pairwise matrix is kept as the oracle. They must agree bit-for-bit on
every input — including duplicate targets, saddle-sharing chains, and
dead-slot sentinels.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from aprilgrid_tpu.ops.board import (  # noqa: E402
    resolve_conflicts,
    resolve_conflicts_dense,
)


@pytest.mark.parametrize("seed", range(12))
def test_randomized_equivalence(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 200))
    g2 = int(rng.integers(4, 120))
    p = int(rng.integers(1, 96))
    # heavy collision pressure: draw from small ranges half the time
    sn = max(2, n // (8 if seed % 2 else 1))
    sg = max(2, g2 // (8 if seed % 3 else 1))
    quad = rng.integers(0, sn, size=(p, 4)).astype(np.int32)
    valid = rng.random(p) < 0.6
    tgt = rng.integers(0, sg, size=p).astype(np.int32)
    # dead-slot sentinel: invalid proposals may carry tgt == g2
    dead = rng.random(p) < 0.2
    valid = valid & ~dead
    tgt = np.where(dead, g2, tgt).astype(np.int32)

    got = np.asarray(
        resolve_conflicts(
            jnp.asarray(tgt), jnp.asarray(quad), jnp.asarray(valid), n, g2
        )
    )
    want = np.asarray(
        resolve_conflicts_dense(
            jnp.asarray(tgt), jnp.asarray(quad), jnp.asarray(valid)
        )
    )
    np.testing.assert_array_equal(got, want)


def test_chain_is_single_level():
    # blocking is by earlier VALID proposals, not earlier ACCEPTED ones:
    # 0 blocks 1 (same target), and 1 — though itself blocked — still
    # blocks 2 (shares a saddle with 2 but not with 0)
    tgt = jnp.asarray([5, 5, 6], jnp.int32)
    quad = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7], [7, 8, 9, 10]], jnp.int32)
    valid = jnp.asarray([True, True, True])
    got = np.asarray(resolve_conflicts(tgt, quad, valid, 16, 8))
    np.testing.assert_array_equal(got, [True, False, False])

"""Randomized equivalence: the round-5 two-phase init_quads (trig-free
gates -> compacted survivors -> exact is_valid_quad) against the
one-phase formulation it replaced (git 67976f2~1), kept verbatim here
as the oracle. Results must be identical whenever the survivor cap is
not hit — and the cap is asserted un-hit on these fields (it is sized
2x the worst golden-scene count)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from aprilgrid_tpu.ops.geometry import (
    cross,
    is_valid_quad,
    theta_distance_degree,
)
from aprilgrid_tpu.ops.quads import _pair_enum, init_quads
from aprilgrid_tpu.ops.rochade import Saddles


def _reference_init_quads(saddles, alive, s0_idx, nn, max_quads):
    n = saddles.valid.shape[0]
    k = min(nn, n)
    p0 = saddles.p[s0_idx]
    t0 = saddles.theta[s0_idx]
    d2 = jnp.sum((saddles.p - p0) ** 2, axis=-1)
    d2 = jnp.where(alive, d2, jnp.inf)
    neg_d, nn_idx = lax.top_k(-d2, k)
    nn_ok = jnp.isfinite(neg_d)
    td = theta_distance_degree(t0, saddles.theta[nn_idx])
    same = nn_ok & (td < 5.0)
    diff = nn_ok & (td > 80.0)
    pos0 = jnp.zeros(k, bool).at[0].set(True)
    same &= ~pos0
    diff &= ~pos0
    pa, pb = _pair_enum(k)
    pa = jnp.asarray(pa)
    pb = jnp.asarray(pb)
    s1_i = nn_idx[:, None]
    d0_i = nn_idx[pa][None, :]
    d1_i = nn_idx[pb][None, :]
    cand_ok = same[:, None] & diff[pa][None, :] & diff[pb][None, :]
    geom_ok = is_valid_quad(
        p0, t0,
        saddles.p[d0_i], saddles.theta[d0_i],
        saddles.p[s1_i],
        saddles.p[d1_i], saddles.theta[d1_i],
    )
    ok = cand_ok & geom_ok
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
    return flat_quads[safe], valid


@pytest.mark.parametrize("seed", [0, 1, 5, 9])
def test_init_quads_identical(seed):
    rng = np.random.default_rng(seed)
    n = 200
    base = (
        np.stack(np.meshgrid(np.arange(10), np.arange(10)), -1)
        .reshape(-1, 2)[: n // 2] * 18.0
        + rng.normal(0, 1.2, (n // 2, 2))
    ).astype(np.float32)
    rest = rng.uniform(0, 180, size=(n - n // 2, 2)).astype(np.float32)
    p = np.concatenate([base, rest])
    # checkerboard-ish thetas: two orthogonal populations + noise
    theta = np.where(
        rng.random(n) > 0.5, 10.0, -80.0
    ).astype(np.float32) + rng.normal(0, 1.5, n).astype(np.float32)
    saddles = Saddles(
        p=jnp.asarray(p),
        k=jnp.ones(n, jnp.float32),
        theta=jnp.asarray(theta),
        phi=jnp.full((n,), 45.0, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    alive = jnp.asarray(rng.random(n) > 0.05)
    for s0 in rng.integers(0, n // 2, size=4):
        got = init_quads(saddles, alive, jnp.int32(s0), 50, 32)
        ref_q, ref_v = _reference_init_quads(
            saddles, alive, jnp.int32(s0), 50, 32
        )
        assert int(got.overflow) == 0
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref_v))
        v = np.asarray(ref_v)
        np.testing.assert_array_equal(
            np.asarray(got.quads)[v], np.asarray(ref_q)[v]
        )


def test_set_cap_overflow_is_flagged():
    """The same/diff set compaction (round-5) truncates at 40/40 —
    1.3x above the worst set size measured over every saddle of every
    golden scene. A pathological orientation field that overflows the
    cap must raise the audit counter, never silently drop combos."""
    rng = np.random.default_rng(3)
    n = 120
    p = rng.uniform(0, 60, size=(n, 2)).astype(np.float32)
    theta = (10.0 + rng.normal(0, 0.5, n)).astype(np.float32)  # all "same"
    saddles = Saddles(
        p=jnp.asarray(p),
        k=jnp.ones(n, jnp.float32),
        theta=jnp.asarray(theta),
        phi=jnp.full((n,), 45.0, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    alive = jnp.ones(n, bool)
    got = init_quads(saddles, alive, jnp.int32(0), 50, 32)
    assert int(got.overflow) > 0

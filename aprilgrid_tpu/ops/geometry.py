"""Vectorized 2-D geometry predicates.

Array ports of the reference's scalar helpers (src/math_util.rs:5-33) and
of the quad validity gate (is_valid_quad, src/saddle.rs:17-67). All
functions broadcast over leading dimensions so one call evaluates
thousands of candidate quads at once on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def rust_round(x: jnp.ndarray) -> jnp.ndarray:
    """f32::round — half away from zero."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def theta_distance_degree(t0: jnp.ndarray, t1: jnp.ndarray) -> jnp.ndarray:
    """Line-orientation distance folded to [0, 90] (src/math_util.rs:15-23)."""
    d = t0 - t1 + 90.0
    d = jnp.where(d < 0.0, d + 180.0, d)
    d = jnp.where(d > 180.0, d - 180.0, d)
    return jnp.where(d > 90.0, d - 90.0, 90.0 - d)


def cross(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    return v0[..., 0] * v1[..., 1] - v0[..., 1] * v1[..., 0]


def dot(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    return v0[..., 0] * v1[..., 0] + v0[..., 1] * v1[..., 1]


def angle_degree(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Signed angle from v0 to v1, degrees (src/math_util.rs:31-33)."""
    return jnp.degrees(jnp.arctan2(cross(v0, v1), dot(v0, v1)))


def is_valid_quad(
    p_s0: jnp.ndarray,
    t_s0: jnp.ndarray,
    p_d0: jnp.ndarray,
    t_d0: jnp.ndarray,
    p_s1: jnp.ndarray,
    p_d1: jnp.ndarray,
    t_d1: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized is_valid_quad (src/saddle.rs:17-67).

    Positions are (..., 2); thetas are (...). Only s0/d0/d1 thetas enter
    the gates (s1's does not), matching the reference.
    """
    ok = theta_distance_degree(t_d0, t_d1) <= 5.0

    v01 = p_d0 - p_s0
    v03 = p_d1 - p_s0
    v02 = p_s1 - p_s0

    # white-block filter: diagonal vs s0's ridge direction in [60, 120] deg
    rad = jnp.radians(t_s0)
    v_theta = jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)
    ang = jnp.abs(angle_degree(v02, v_theta))
    ok &= (ang >= 60.0) & (ang <= 120.0)

    c0 = cross(v01, v02)
    c1 = cross(v02, v03)
    ok &= c0 * c1 >= 0.0

    v12 = p_s1 - p_d0
    v23 = p_d1 - p_s1
    c01 = cross(v01, v12)
    c12 = cross(v12, v23)
    ok &= c01 * c12 >= 0.0

    v30 = p_s0 - p_d1
    a0 = angle_degree(v01, v12)
    a1 = angle_degree(v12, v23)
    a2 = angle_degree(v23, v30)
    a3 = angle_degree(v30, v01)
    ok &= (jnp.abs(a0 - a2) <= 10.0) & (jnp.abs(a1 - a3) <= 10.0)

    ok &= (dot(v01, v02) >= 0.0) & (dot(v03, v02) >= 0.0)
    return ok


def is_valid_quad_idx(saddles, q: jnp.ndarray) -> jnp.ndarray:
    """is_valid_quad over index quads ``q`` (..., 4) into a Saddles SoA."""
    p = saddles.p[q]          # (..., 4, 2)
    t = saddles.theta[q]      # (..., 4)
    return is_valid_quad(
        p[..., 0, :], t[..., 0],
        p[..., 1, :], t[..., 1],
        p[..., 2, :],
        p[..., 3, :], t[..., 3],
    )

"""Tag bit decoding: affine sampling + 4-rotation hamming table search.

Reference pipeline: decode_positions (src/detector.rs:42-72) maps bit-cell
centers through a least-squares affine fitted to the quad
(tag_affine, src/image_util.rs:39-70); bit_code (src/detector.rs:74-122)
samples the u8 gray image, thresholds at mid-brightness and assembles the
code MSB-first; best_tag (src/detector.rs:142-169) scans the family table
at 4 rotations (rotate_bits, src/detector.rs:124-140) and accepts the
first rotation whose best hamming score beats the family threshold.

TPU recast, batched over all candidate quads at once:

* the affine solve collapses to one constant (6, 8) pseudo-inverse (the
  source points depend only on family constants) times the corner vector;
* bit sampling is one gather; thresholds/invalid-counts are reductions;
* the 4 rotations are precomputed bit permutations and the
  XOR-popcount table scan is an MXU matmul:
  ham(r, c) = sum(r) + sum(c) - 2 r.c.

Rust cast quirks are preserved: sample coordinates round half away from
zero and saturate negatives to 0 before the >= width/height bound check.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..families import FamilySpec
from .geometry import rust_round


class DecodedTags(NamedTuple):
    ids: jnp.ndarray      # (T,) int32 tag ids
    corners: jnp.ndarray  # (T, 4, 2) float32, canonical order
    valid: jnp.ndarray    # (T,) bool


@functools.lru_cache(maxsize=None)
def _affine_pinv(side_bits: int, margin: float) -> np.ndarray:
    """Constant pseudo-inverse of the 8x6 affine design matrix
    (tag_affine, src/image_util.rs:39-70)."""
    s = float(side_bits) - 1.0 + margin
    source = [(-margin, -margin), (-margin, s), (s, s), (s, -margin)]
    a = np.zeros((8, 6), dtype=np.float64)
    for p in range(4):
        a[2 * p, 0:3] = (source[p][0], source[p][1], 1.0)
        a[2 * p + 1, 3:6] = (source[p][0], source[p][1], 1.0)
    return np.linalg.pinv(a).astype(np.float32)  # (6, 8)


@functools.lru_cache(maxsize=None)
def _bit_grid(edge: int, border: int) -> np.ndarray:
    """Bit-cell centers in tag frame, x-major (src/detector.rs:60-71)."""
    pts = [
        (float(x), float(y))
        for x in range(border, border + edge)
        for y in range(border, border + edge)
    ]
    return np.array(pts, dtype=np.float32)  # (edge^2, 2)


@functools.lru_cache(maxsize=None)
def _rot_perms(edge: int) -> np.ndarray:
    """Permutations for 0..3 90-degree rotations over LSB-first bits."""
    from ..families import rotation_permutation

    n = edge * edge
    p1 = rotation_permutation(edge)
    perms = [np.arange(n, dtype=np.int32)]
    for _ in range(3):
        perms.append(perms[-1][p1])
    return np.stack(perms)  # (4, n)


def tag_homography(corners, side_bits: int, margin: float) -> np.ndarray:
    """Full 8-DoF DLT homography from the canonical tag frame to the
    image quad (reference: tag_homography, src/image_util.rs:5-37 —
    dead code there, the pipeline uses the affine; provided for API
    completeness). Returns the (3, 3) float32 H as the last right
    singular vector of the 8x9 DLT system, like the reference's
    `svd.V().col(8)`."""
    c = np.asarray(corners, np.float32).reshape(4, 2)
    s = float(side_bits) - 1.0 + margin
    source = [(-margin, -margin), (-margin, s), (s, s), (s, -margin)]
    a = np.zeros((8, 9), np.float32)
    for p in range(4):
        sx, sy = source[p]
        cx, cy = float(c[p, 0]), float(c[p, 1])
        a[2 * p, 0:3] = (sx, sy, 1.0)
        a[2 * p, 6:9] = (-cx * sx, -cx * sy, -cx)
        a[2 * p + 1, 3:6] = (sx, sy, 1.0)
        a[2 * p + 1, 6:9] = (-cy * sx, -cy * sy, -cy)
    _, _, vt = np.linalg.svd(a)
    return vt[-1].reshape(3, 3).astype(np.float32)


def decode_positions_px(
    corners,
    spec: FamilySpec,
    margin: float,
    width: int,
    height: int,
):
    """Public bit-cell sample positions for one quad — the standalone
    decode_positions the reference exposes and its demo calls per
    detected tag for the overlay (src/detector.rs:42-72,
    examples/demo.rs:83). Host-side NumPy; returns (edge^2, 2) float32
    or None when a rounded corner falls outside the image."""
    c = np.asarray(corners, np.float32).reshape(4, 2)
    rc = np.copysign(np.floor(np.abs(c) + 0.5), c)
    if (np.maximum(rc, 0.0)[:, 0] >= width).any() or (
        np.maximum(rc, 0.0)[:, 1] >= height
    ).any():
        return None
    pinv = _affine_pinv(spec.side_bits, margin)
    params = pinv @ c.reshape(8)
    grid = _bit_grid(spec.edge, spec.border)
    px = params[0] * grid[:, 0] + params[1] * grid[:, 1] + params[2]
    py = params[3] * grid[:, 0] + params[4] * grid[:, 1] + params[5]
    return np.stack([px, py], axis=-1)


def _decode_pre(
    luma8: jnp.ndarray,
    quad_pos: jnp.ndarray,   # (T, 4, 2) float32 corner positions
    quad_valid: jnp.ndarray,  # (T,) bool
    spec: FamilySpec,
    margin: float,
    valid_brightness_threshold: int,
    max_invalid_bit: int,
    min_contrast: int,
    true_shape: tuple[int, int] | None = None,
):
    """decode_positions + bit_code + rotation expansion for one frame;
    returns (rots (T, 4, nb) f32 0/1, gates (T, 3) bool)."""
    h, w = true_shape if true_shape is not None else luma8.shape

    # --- decode_positions: corner bound gate + affine bit centers
    rc = rust_round(quad_pos)
    rcx = jnp.maximum(rc[..., 0], 0.0)
    rcy = jnp.maximum(rc[..., 1], 0.0)
    corners_ok = ((rcx < w) & (rcy < h)).all(axis=-1) & quad_valid

    pinv = jnp.asarray(_affine_pinv(spec.side_bits, margin))
    b = quad_pos.reshape(-1, 8)  # (T, 8): x0,y0,x1,y1,... row order
    params = jnp.einsum("ph,th->tp", pinv, b, precision=lax.Precision.HIGHEST)
    grid = jnp.asarray(_bit_grid(spec.edge, spec.border))  # (nb, 2)
    px = params[:, None, 0] * grid[None, :, 0] + params[:, None, 1] * grid[None, :, 1] + params[:, None, 2]
    py = params[:, None, 3] * grid[None, :, 0] + params[:, None, 4] * grid[None, :, 1] + params[:, None, 5]

    # --- bit_code: sample, contrast, mid-threshold, invalid count
    sx = jnp.maximum(rust_round(px), 0.0)
    sy = jnp.maximum(rust_round(py), 0.0)
    sample_ok = ((sx < w) & (sy < h)).all(axis=-1)
    xi = jnp.clip(sx.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(sy.astype(jnp.int32), 0, h - 1)
    bright = luma8[yi, xi].astype(jnp.int32)  # (T, nb)

    min_b = bright.min(axis=-1)
    max_b = bright.max(axis=-1)
    contrast_ok = (max_b - min_b) >= min_contrast
    mid = (min_b + max_b + 1) // 2  # round((min+max)/2), non-negative
    bits_msb = bright > mid[:, None]  # (T, nb) position-order (MSB first)
    invalid = (jnp.abs(mid[:, None] - bright) < valid_brightness_threshold).sum(-1)
    bits_ok = invalid <= max_invalid_bit

    lsb = bits_msb[:, ::-1].astype(jnp.float32)  # LSB-first bit vector
    perms = jnp.asarray(_rot_perms(spec.edge))   # (4, nb)
    rots = lsb[:, perms]                         # (T, 4, nb)
    gates = jnp.stack([corners_ok, sample_ok, contrast_ok & bits_ok], -1)
    return rots, gates


def _decode_post(
    best_score: jnp.ndarray,  # (T, 4) min hamming per rotation
    best_idx: jnp.ndarray,    # (T, 4) FIRST argmin per rotation
    gates: jnp.ndarray,       # (T, 3) bool
    quad_pos: jnp.ndarray,
    spec: FamilySpec,
) -> DecodedTags:
    rot_ok = best_score < float(spec.hamming_distance)
    rotation = jnp.argmax(rot_ok, axis=-1)  # first accepted rotation
    tag_ok = rot_ok.any(axis=-1)
    ids = jnp.take_along_axis(best_idx, rotation[:, None], -1)[:, 0]

    # --- canonical corner order: rotate_left(rotation) then reverse
    j = jnp.arange(4)
    order = (3 - j[None, :] + rotation[:, None]) % 4  # (T, 4)
    corners = jnp.take_along_axis(quad_pos, order[..., None], axis=1)

    valid = gates.all(axis=-1) & tag_ok
    return DecodedTags(
        ids=jnp.where(valid, ids.astype(jnp.int32), -1),
        corners=corners,
        valid=valid,
    )


def decode_quads(
    luma8: jnp.ndarray,
    quad_pos: jnp.ndarray,   # (T, 4, 2) float32 corner positions
    quad_valid: jnp.ndarray,  # (T,) bool
    spec: FamilySpec,
    margin: float,
    valid_brightness_threshold: int,
    max_invalid_bit: int,
    min_contrast: int,
    true_shape: tuple[int, int] | None = None,
) -> DecodedTags:
    """try_decode_quad for every candidate quad (src/detector.rs:448-476).

    ``true_shape`` gives the real (h, w) when ``luma8`` is padded."""
    rots, gates = _decode_pre(
        luma8, quad_pos, quad_valid, spec, margin,
        valid_brightness_threshold, max_invalid_bit, min_contrast,
        true_shape,
    )
    # --- best_tag: 4 rotations x hamming scan over the code table
    codes = jnp.asarray(spec.code_bits.astype(np.float32))  # (C, nb)
    # default (bf16) MXU precision is exact here: operands are 0/1 bits
    # and dot-product sums are <= 36 < 2^8
    inner = jnp.einsum("trn,cn->trc", rots, codes)
    ham = rots.sum(-1)[..., None] + codes.sum(-1)[None, None, :] - 2.0 * inner
    best_idx = jnp.argmin(ham, axis=-1)  # (T, 4) first min
    best_score = jnp.take_along_axis(ham, best_idx[..., None], -1)[..., 0]
    return _decode_post(best_score, best_idx, gates, quad_pos, spec)


def decode_quads_batch(
    luma8: jnp.ndarray,      # (B, H, W) u8
    quad_pos: jnp.ndarray,   # (B, T, 4, 2)
    quad_valid: jnp.ndarray,  # (B, T) bool
    spec: FamilySpec,
    margin: float,
    valid_brightness_threshold: int,
    max_invalid_bit: int,
    min_contrast: int,
    true_shape: tuple[int, int] | None = None,
    use_pallas: bool = False,
    interpret: bool = False,
) -> DecodedTags:
    """Batched decode. With ``use_pallas`` the hamming table scan runs
    as a Pallas kernel that keeps the (B, T, 4, |family|) distance
    tensor in VMEM (the XLA einsum materializes it in HBM — 231 MB at
    default capacities, the bulk of the decode pass cost)."""
    import jax

    rots, gates = jax.vmap(
        lambda l, q, v: _decode_pre(
            l, q, v, spec, margin, valid_brightness_threshold,
            max_invalid_bit, min_contrast, true_shape,
        )
    )(luma8, quad_pos, quad_valid)
    bsz, t, _, nb = rots.shape
    codes = jnp.asarray(spec.code_bits.astype(np.float32))
    if use_pallas:
        from ..pallas.decode import hamming_scan

        mins, idxs = hamming_scan(
            rots.reshape(bsz, t * 4, nb), codes, interpret=interpret
        )
        best_score = mins.reshape(bsz, t, 4)
        best_idx = idxs.reshape(bsz, t, 4)
    else:
        inner = jnp.einsum("btrn,cn->btrc", rots, codes)
        ham = (
            rots.sum(-1)[..., None]
            + codes.sum(-1)[None, None, None, :]
            - 2.0 * inner
        )
        best_idx = jnp.argmin(ham, axis=-1)
        best_score = jnp.take_along_axis(ham, best_idx[..., None], -1)[..., 0]
    return jax.vmap(
        lambda s, i, g, q: _decode_post(s, i, g, q, spec)
    )(best_score, best_idx, gates, quad_pos)

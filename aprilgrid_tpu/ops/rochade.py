"""Batched ROCHADE subpixel saddle refinement.

The reference refines each cluster centroid with a per-corner scalar loop
(rochade_refine, src/detector.rs:194-361): smooth a 5x5 patch of the
blurred image with a cone kernel, fit a 6-parameter quadric, require a
saddle (negative Hessian det), solve grad=0 for the subpixel offset, and
gate on a <=1 px move. Here all corners refine at once:

* the quadric pseudo-inverse and cone kernel are trace constants
  (the reference rebuilds them per call, src/detector.rs:208-254 — a
  known inefficiency we hoist);
* 9x9 support patches for every candidate are one gather;
* the 5x5 cone smoothing is 25 shifted multiply-adds;
* the 6-parameter fits are one (K,25)x(25,6) matmul on the MXU.

Outputs are fixed-capacity saddle arrays with a validity mask, in cluster
order (matching reference saddle ordering).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .geometry import rust_round


class Saddles(NamedTuple):
    """SoA saddle set (reference struct: src/saddle.rs:3-9)."""

    p: jnp.ndarray       # (K, 2) float32 subpixel positions (x, y)
    k: jnp.ndarray       # (K,) saddle strength
    theta: jnp.ndarray   # (K,) ridge orientation, degrees
    phi: jnp.ndarray     # (K,) opening angle, degrees
    valid: jnp.ndarray   # (K,) bool


@functools.lru_cache(maxsize=None)
def _constants(half_patch: int) -> tuple[np.ndarray, np.ndarray]:
    """(pinv (6, n), cone (size, size)) — reference src/detector.rs:208-254."""
    size = 2 * half_patch + 1
    rows = []
    for r in range(size):
        for c in range(size):
            x = float(c - half_patch)
            y = float(r - half_patch)
            rows.append([x * x, x * y, y * y, x, y, 1.0])
    pinv = np.linalg.pinv(np.array(rows, dtype=np.float64)).astype(np.float32)
    gamma = float(half_patch)
    cone = np.zeros((size, size), dtype=np.float64)
    for i in range(size):
        for j in range(size):
            cone[i, j] = max(0.0, gamma + 1.0 - math.hypot(gamma - i, gamma - j))
    cone = (cone / cone.sum()).astype(np.float32)
    return pinv, cone


def rochade_refine(
    blur: jnp.ndarray,
    centers: jnp.ndarray,
    centers_valid: jnp.ndarray,
    half_patch: int = 2,
    move_threshold: float = 1.0,
    global_bounds: tuple | None = None,
) -> Saddles:
    """Refine all candidate corners at once (src/detector.rs:194-361).

    ``global_bounds=(true_h, row_offset)``: when ``blur`` is a
    row-sharded window of a taller image, the bounds gate must test the
    TRUE image rows (window row r = global row r + row_offset); output
    positions stay in window coordinates."""
    pinv_np, cone_np = _constants(half_patch)
    pinv = jnp.asarray(pinv_np)
    cone = jnp.asarray(cone_np)
    size = 2 * half_patch + 1
    hp2 = 2 * half_patch
    h, w = blur.shape

    rx = rust_round(centers[:, 0]).astype(jnp.int32)
    ry = rust_round(centers[:, 1]).astype(jnp.int32)
    true_h, row_off = (h, 0) if global_bounds is None else global_bounds
    gy = ry + row_off
    in_bounds = (
        (gy - hp2 >= 0) & (gy + hp2 < true_h) & (rx - hp2 >= 0) & (rx + hp2 < w)
    ) & centers_valid

    # gather the (2k+1)+(2k) = 9x9 support patch for each candidate
    sx = jnp.clip(rx - hp2, 0, w - 2 * hp2 - 1)
    sy = jnp.clip(ry - hp2, 0, h - 2 * hp2 - 1)
    off = jnp.arange(2 * hp2 + 1, dtype=jnp.int32)
    ys = sy[:, None, None] + off[None, :, None]
    xs = sx[:, None, None] + off[None, None, :]
    patch = blur[ys, xs]  # (K, 9, 9)
    return refine_patches(patch, rx, ry, in_bounds, half_patch, move_threshold)


def refine_patches(
    patch: jnp.ndarray,      # (K, 4*half_patch+1, 4*half_patch+1) blur values
    rx: jnp.ndarray,         # (K,) int32 rounded centers
    ry: jnp.ndarray,
    in_bounds: jnp.ndarray,  # (K,) bool validity incl. bounds gate
    half_patch: int = 2,
    move_threshold: float = 1.0,
) -> Saddles:
    """Quadric fit + gates on pre-gathered blur support patches — the
    shared back half of the plane-based refine above and the sparse
    raw-patch refine (``refine_at_raw``). Bit-identical math
    (src/detector.rs:194-361)."""
    pinv_np, cone_np = _constants(half_patch)
    pinv = jnp.asarray(pinv_np)
    cone = jnp.asarray(cone_np)
    size = 2 * half_patch + 1

    # cone smoothing: 'valid' correlation -> (K, 5, 5)
    smooth = jnp.zeros(patch.shape[:1] + (size, size), patch.dtype)
    for pr in range(size):
        for pc in range(size):
            smooth = smooth + cone[pr, pc] * patch[:, pr : pr + size, pc : pc + size]

    # quadric fit: params = pinv @ smooth_flat, batched on the MXU
    params = jnp.einsum(
        "kn,pn->kp",
        smooth.reshape(smooth.shape[0], size * size),
        pinv,
        precision=lax.Precision.HIGHEST,
    )  # (K, 6)
    a1, a2, a3, a4, a5 = (params[:, i] for i in range(5))

    d = (2.0 * a1) * (2.0 * a3) - a2 * a2
    safe_d = jnp.where(d == 0, 1.0, d)
    # grad=0 solve (reference find_xy, src/math_util.rs:5-12)
    x0 = (-2.0 * a3 * a4 + a2 * a5) / safe_d
    y0 = (-2.0 * a1 * a5 + a2 * a4) / safe_d

    c5 = (a1 + a3) / 2.0
    c4 = (a1 - a3) / 2.0
    c3 = a2 / 2.0
    kk = jnp.sqrt(c4 * c4 + c3 * c3)
    safe_kk = jnp.where(kk == 0, 1.0, kk)
    phi = jnp.degrees(jnp.arccos(jnp.clip(-c5 / safe_kk, -1.0, 1.0)) / 2.0)
    theta = jnp.degrees(jnp.arctan2(c3, c4) / 2.0)

    accept = (
        in_bounds
        & (d < 0.0)
        & (jnp.abs(x0) <= move_threshold)
        & (jnp.abs(y0) <= move_threshold)
        & (jnp.abs(c5) < kk)
    )
    p = jnp.stack([rx.astype(jnp.float32) + x0, ry.astype(jnp.float32) + y0], -1)
    return Saddles(p=p, k=kk, theta=theta, phi=phi, valid=accept)


def refine_at_raw(
    img: jnp.ndarray,        # (H, W) u8/u16 or (H, W, 3|4) u8 raw frame
    centers: jnp.ndarray,    # (K, 2) f32 full-res candidate positions
    centers_valid: jnp.ndarray,
    sigma: float = 1.5,
    half_patch: int = 2,
    move_threshold: float = 1.0,
) -> Saddles:
    """ROCHADE refine at sparse positions straight from the RAW frame.

    Used by the decimated ("turbo") detection mode: candidates found at
    half resolution are re-refined at FULL resolution without ever
    materializing the full-res blur plane — a 15x15 raw patch is gathered
    per candidate and the gray conversion (ops/gray.py) plus the 7-tap
    separable blur (src/image_util.rs:110-206) run in-register on the
    patches. Bit-identical to refining on ``gaussian_blur(to_luma(img))``:
    index CLAMPING at the gather reproduces the blur's edge-replicate
    border in both separable passes, and tap order/accumulation match
    ``ops.frontend.gaussian_blur`` exactly.
    """
    from .frontend import gaussian_kernel
    from .gray import _LUMA_B, _LUMA_G, _LUMA_R

    taps = gaussian_kernel(sigma)
    radius = (len(taps) - 1) // 2
    hp2 = 2 * half_patch
    size9 = 2 * hp2 + 1            # support patch for the cone smoothing
    p = size9 + 2 * radius         # raw patch side (15 for hp=2, sigma=1.5)
    h, w = img.shape[:2]

    rx = rust_round(centers[:, 0]).astype(jnp.int32)
    ry = rust_round(centers[:, 1]).astype(jnp.int32)
    in_bounds = (
        (ry - hp2 >= 0) & (ry + hp2 < h) & (rx - hp2 >= 0) & (rx + hp2 < w)
    ) & centers_valid

    # Patch extraction in two cheap stages (an element gather of the
    # (K, p, p) patches measured ~3 ms/frame on the TPU backend —
    # element gathers serialize):
    #   1. one (p+1)-wide row slice per (candidate, patch row) via
    #      vmapped dynamic_slice — XLA lowers this to a gather of
    #      contiguous slices (channels pre-flattened into the row so the
    #      slices stay contiguous and no tiny trailing-3 layout blows up);
    #   2. the p columns selected from the small window with a one-hot
    #      matmul (exact: single 1.0 per one-hot column).
    # Index clamping reproduces the blur's edge replication: the window
    # start c0 is clamped to [0, w-win], so local = global - c0 keeps
    # the image-edge clamp of the reference semantics.
    off = jnp.arange(p, dtype=jnp.int32) - hp2 - radius
    win = min(p + 1, w)
    channels = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h, w * channels) if img.ndim == 3 else img
    ys = jnp.clip(ry[:, None] + off[None, :], 0, h - 1)  # (K, p)
    c0 = jnp.clip(rx - hp2 - radius, 0, w - win)  # (K,)

    def slice_one(y, c):
        return lax.dynamic_slice(
            flat, (y, channels * c), (1, channels * win)
        )[0]

    rows = jax.vmap(jax.vmap(slice_one, in_axes=(0, None)), in_axes=(0, 0))(
        ys, c0
    )  # (K, p, channels*win)

    # gray conversion on the windows — same expressions as ops/gray.to_luma
    if img.ndim == 3:
        rgb = rows.reshape(rows.shape[0], p, win, channels)
        rgbf = rgb[..., :3].astype(jnp.float32) / 255.0
        lum = (
            _LUMA_R * rgbf[..., 0]
            + _LUMA_G * rgbf[..., 1]
            + _LUMA_B * rgbf[..., 2]
        )
    elif img.dtype == jnp.uint16:
        lum = rows.astype(jnp.float32) / 65535.0
    else:
        lum = rows.astype(jnp.float32) / 255.0

    xs = jnp.clip(rx[:, None] + off[None, :], 0, w - 1) - c0[:, None]  # (K, p)
    onehot = (
        jnp.arange(win, dtype=jnp.int32)[None, :, None] == xs[:, None, :]
    ).astype(jnp.float32)  # (K, win, p)
    luma = jnp.einsum("krw,kwj->krj", lum, onehot)  # (K, p, p)

    # separable blur on the patches, horizontal first (tap order matches
    # ops.frontend.gaussian_blur so results are bit-identical)
    temp = jnp.zeros(luma.shape[:1] + (p, size9), jnp.float32)
    for i, kw in enumerate(taps):
        temp = temp + luma[:, :, i : i + size9] * float(kw)
    blur9 = jnp.zeros(luma.shape[:1] + (size9, size9), jnp.float32)
    for i, kw in enumerate(taps):
        blur9 = blur9 + temp[:, i : i + size9, :] * float(kw)

    return refine_patches(blur9, rx, ry, in_bounds, half_patch, move_threshold)


def filter_and_compact(
    s: Saddles,
    max_saddles: int,
    k_ratio: float,
    min_phi: float,
    max_phi: float,
) -> Saddles:
    """Strength + opening-angle gates and compaction to capacity
    (src/detector.rs:432-445)."""
    max_k = jnp.max(jnp.where(s.valid, s.k, -jnp.inf))
    keep = (
        s.valid
        & (s.k >= max_k * k_ratio)
        & (s.phi >= min_phi)
        & (s.phi <= max_phi)
    )
    n = s.valid.shape[0]
    (idx,) = jnp.nonzero(keep, size=max_saddles, fill_value=n)
    valid = idx < n
    safe = jnp.minimum(idx, n - 1)
    return Saddles(
        p=jnp.where(valid[:, None], s.p[safe], 0.0),
        k=jnp.where(valid, s.k[safe], 0.0),
        theta=jnp.where(valid, s.theta[safe], 0.0),
        phi=jnp.where(valid, s.phi[safe], 0.0),
        valid=valid,
    )

"""Assembled jittable pipeline stages.

``saddle_frontend`` is the dense front half of detect()
(reference: TagDetector::refined_saddle_points, src/detector.rs:408-446):
gray -> blur -> Hessian response -> component centroids -> ROCHADE ->
strength/angle gates, producing a fixed-capacity saddle set. The back
half (board search + decode) lives in ops/board.py and ops/decode.py and
is assembled by ``detect_pipeline``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import Capacities, DetectorParams, PipelineConstants
from .families import FamilySpec
from .ops.cluster import cluster_centroids
from .ops.decode import decode_quads
from .ops.frontend import gaussian_blur, hessian_response
from .ops.gray import to_luma
from .ops.rochade import (
    Saddles,
    filter_and_compact,
    refine_at_raw,
    rochade_refine,
)
from .ops.search import find_best_board


def _frontend_tail(
    blur: jnp.ndarray,
    resp: jnp.ndarray,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
) -> Saddles:
    """cluster -> ROCHADE -> gates, per frame (vmappable)."""
    clusters = cluster_centroids(
        resp,
        consts.response_threshold_ratio,
        caps.max_clusters,
        caps.max_masked,
        caps.label_prop_rounds,
    )
    raw = rochade_refine(
        blur,
        clusters.centers,
        clusters.valid,
        consts.rochade_half_patch,
        consts.rochade_move_threshold,
    )
    return filter_and_compact(
        raw,
        caps.max_saddles,
        consts.saddle_k_ratio,
        params.min_saddle_angle,
        params.max_saddle_angle,
    )


def _decimate2(luma_f: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x2-mean downsample of an (H, W) f32 luma plane (odd
    trailing row/col trimmed). The decimated ("turbo") detection mode's
    half-resolution image — see ``_decimated_tail``."""
    h, w = luma_f.shape
    hh, ww = h // 2 * 2, w // 2 * 2
    x = luma_f[:hh, :ww].reshape(hh // 2, 2, ww // 2, 2)
    # pairwise association (cols first, then rows) on purpose: the Pallas
    # turbo front-end decimates with lane/sublane pair sums in exactly
    # this order, so both paths produce bit-identical half planes
    return (
        (x[:, 0, :, 0] + x[:, 0, :, 1]) + (x[:, 1, :, 0] + x[:, 1, :, 1])
    ) * 0.25


def _decimated_tail(
    img: jnp.ndarray,
    blur_h: jnp.ndarray,
    resp_h: jnp.ndarray,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
) -> Saddles:
    """Decimated ("turbo") back half, per frame: the full reference
    front-end runs at HALF resolution (cluster -> ROCHADE -> gates on
    ``blur_h``/``resp_h``), survivors are scaled back (half pixel (x, y)
    sits at full-res (2x+0.5, 2y+0.5) under the 2x2-mean decimation) and
    re-refined at FULL resolution straight from the raw frame
    (``refine_at_raw``), then re-gated. An approximate mode: tag recall
    at >= 1080p matches the exact pipeline on the golden scenes with
    corners within ~0.08 px (see tests/test_decimate.py), but it is NOT
    bit-parity — small/low-res frames lose recall, so the facade only
    enables it on >= 2 MP frames (and off by default)."""
    half_saddles = _frontend_tail(blur_h, resp_h, params, consts, caps)
    centers_full = half_saddles.p * 2.0 + 0.5
    refined = refine_at_raw(
        img,
        centers_full,
        half_saddles.valid,
        consts.blur_sigma,
        consts.rochade_half_patch,
        consts.rochade_move_threshold,
    )
    return filter_and_compact(
        refined,
        caps.max_saddles,
        consts.saddle_k_ratio,
        params.min_saddle_angle,
        params.max_saddle_angle,
    )


def saddle_frontend(
    img: jnp.ndarray,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
    use_pallas: bool = False,
    decimate: bool = False,
) -> tuple[Saddles, jnp.ndarray]:
    """Refined saddle points + u8 luma plane (for the bit sampler)."""
    luma_f, luma_u8 = to_luma(img)
    if decimate:
        luma_f = _decimate2(luma_f)
    if use_pallas:
        from .pallas.frontend import fused_frontend

        blur, resp = fused_frontend(luma_f, consts.blur_sigma)
    else:
        blur = gaussian_blur(luma_f, consts.blur_sigma)
        resp = hessian_response(blur)
    if decimate:
        saddles = _decimated_tail(img, blur, resp, params, consts, caps)
    else:
        saddles = _frontend_tail(blur, resp, params, consts, caps)
    return saddles, luma_u8


def _pallas_cluster_ok(h: int, w: int) -> bool:
    """Whether an (h, w) plane fits the Pallas cluster kernel's domain:
    the padded height must cover one sweep window, packed labels store
    the column in 16 bits, and the scan-order sort keys (row*w+col) must
    stay exact in f32 (< 2^24 — an 8K frame exceeds this and takes the
    XLA ops path instead; the TURBO mode clusters at half resolution,
    which brings 8K back inside the domain)."""
    return -(-h // 64) * 64 >= 184 and w < 2**16 and h * w < 2**24


def _warn_pallas_fallback(h: int, w: int, decimate: bool) -> None:
    """A frame that was ROUTED AROUND the Pallas cluster kernel (8K-class
    exact frames beyond the packed-label domain, or frames too short for
    one sweep window) silently lands on the XLA ops path, which is ~10x
    slower per byte on this backend. Surface that once per shape, like
    the capacity warnings in detector.py."""
    import warnings

    mode = "turbo half-res" if decimate else "exact"
    warnings.warn(
        f"{h}x{w} frame ({mode}) is outside the Pallas cluster kernel's "
        "domain (packed labels need w < 2^16 and h*w < 2^24; the padded "
        "height must cover one 184-row sweep window) — falling back to "
        "the XLA ops path, ~10x slower per byte on this backend. For "
        "8K-class frames the turbo mode (decimate=True) clusters at "
        "half resolution, which is back inside the domain.",
        RuntimeWarning,
        stacklevel=3,
    )


def _turbo_nms_env() -> str:
    """Turbo extraction-kernel policy from env ``AG_TURBO_NMS``:
    ``"0"`` forces the CCL fixpoint + root drain, ``"1"`` (or any other
    truthy value) forces the clustering-free NMS kernel (pallas/nms.py),
    ``"auto"`` (the default) makes a STATIC, deterministic choice in
    the hybrid facade: NMS iff the turbo fast path supports it
    (``turbo_fast_path_ok``) AND the host has more than one core, else
    the drain. Rationale: every front-end data statistic is
    near-identical between the scenes whose round-4 hardware winners
    differed (blobs 1242/1236, peaks 507/502, gated saddles 462/471 —
    tools/probe_nms.py), so the winner tracks HOST/DEVICE overlap, not
    kernel speed — a host property, keyed like AG_SEARCH_ASYNC: 1-core
    hosts are host-search-bound and hide that time behind the slower
    drain; multi-core hosts are device-bound and want the cheaper
    scene-invariant NMS kernel. A round-4 online timing probe was
    retired because it made corner coordinates depend on relay timing
    noise (round-4 advisor finding). Both variants meet the same
    recall/corner contract on the golden scenes (tests/test_nms.py,
    tests/test_decimate.py)."""
    import os

    v = os.environ.get("AG_TURBO_NMS", "auto")
    if v in ("0", ""):
        return "0"
    return v if v == "auto" else "1"


def normalize_raw_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    """Map the reference's full DynamicImage input contract
    (src/detector.rs:409,507 accept ANY variant) onto the three raw
    modes the Mosaic front kernels convert in-kernel (u8 gray, u16
    gray, u8 RGB[A]):

    * (B, H, W, 1) and (B, H, W, 2) — Luma(+alpha): channel 0 (the
      image crate drops alpha without premultiplying);
    * (B, H, W, 3|4) u16 — RGB(A)16: the crate's integer luma in the
      u16 source domain (alpha dropped). The kernels then derive
      luma8 bit-exactly (same u16->u8 component scale) while the f32
      front-end plane becomes luma16/65535 instead of the float
      Rec.709 sum — a <= 1.6e-5 luma quantization whose corner effect
      is far below the 0.1 px budget (tests/test_input_modes.py);
    * (B, H, W[, 3|4]) f32 — Luma32F/Rgb32F: float luma quantized to
      u16 (round), same <= 1.6e-5 quantization note.

    The XLA ops paths skip this and use ops/gray.py::to_luma, which is
    exact for every mode."""
    if imgs.ndim == 4 and imgs.shape[3] in (1, 2):
        imgs = imgs[..., 0]
    if imgs.ndim == 4 and imgs.shape[3] in (3, 4):
        if imgs.dtype == jnp.uint16:
            rgbi = imgs[..., :3].astype(jnp.int32)
            luma16 = (
                2126 * rgbi[..., 0] + 7152 * rgbi[..., 1] + 722 * rgbi[..., 2]
            ) // 10000
            imgs = luma16.astype(jnp.uint16)
        elif imgs.dtype in (jnp.float32, jnp.float64):
            rgbf = imgs[..., :3].astype(jnp.float32)
            imgs = (
                0.2126 * rgbf[..., 0]
                + 0.7152 * rgbf[..., 1]
                + 0.0722 * rgbf[..., 2]
            )
    if imgs.ndim == 3 and imgs.dtype in (jnp.float32, jnp.float64):
        imgs = jnp.floor(
            jnp.clip(imgs.astype(jnp.float32), 0.0, 1.0) * 65535.0 + 0.5
        ).astype(jnp.uint16)
    return imgs


def turbo_fast_path_ok(h: int, w: int) -> bool:
    """Whether an (h, w) FULL-RESOLUTION frame takes the fused Pallas
    turbo fast path (half-res cluster kernel + full-res sparse refine;
    see ``_pallas_decimated_frontend_batch``'s gate). Outside this
    domain the turbo mode falls back to the XLA ops path and the
    drain/NMS extraction choice does not exist."""
    return _pallas_cluster_ok(h // 2, w // 2) and w < 2**16


def _resolve_nms(nms: bool | None) -> bool:
    """Resolve an explicit extraction choice (facade chooser / caller)
    against the env policy. ``None`` means "no explicit choice": env
    "1" forces NMS, everything else (incl. "auto" — callers without a
    chooser, e.g. the whole-program xla mode) takes the drain, whose
    counters/recall behavior is the long-measured default."""
    if nms is not None:
        return bool(nms)
    return _turbo_nms_env() == "1"


def _nms_merge() -> int:
    """Geodesic peak-merge sweep count for the NMS extraction kernel
    (``AG_NMS_MERGE``, 0-8): collapses same-blob duplicate peaks (the
    measured ~1.7x candidate inflation) onto the scan-first one.
    Default 0 — the hardware A/B measured m8 SLOWER than m0 (turbo
    b128: iphone 261.7 -> 233.1 fps, two_boards 368.5 -> 358.0; the 32
    masked roll/select passes out-cost the ~130 saved peaks'
    downstream refine/search work — docs/ROADMAP.md round-4). Recall
    holds at every setting (tests/test_nms.py pins m0/m4/m8)."""
    import os

    return max(0, min(8, int(os.environ.get("AG_NMS_MERGE", "0"))))


def _front_tile_h() -> int:
    """Grid-step height of the front kernels — exact AND turbo — (64 or
    128; env ``AG_TILEH``). 128 halves the per-step fixed costs (DMA
    setup, matmul chunk loops) at the price of rounding the raw pad up
    to 128-row tiles (1080p: 1088 -> 1152 rows, ~6% more dense work;
    4K's 2176 is already a multiple — pure win there). Default stays 64
    until the hardware A/B (docs/ROADMAP.md round-4 ledger #1)."""
    import os

    v = int(os.environ.get("AG_TILEH", "64"))
    assert v in (64, 128), v
    return v


def saddle_frontend_batch(
    imgs: jnp.ndarray,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
    use_pallas: bool = False,
    with_counters: bool = False,
    decimate: bool = False,
    nms: bool | None = None,
):
    """Batched front-end. The Pallas kernels handle the batch dimension
    in their grids (pallas_call cannot be vmapped); everything else vmaps.

    Pallas path: fused stencil kernel (blur + Hessian, padded planes),
    then the fused clustering + ROCHADE kernel — no whole-image
    intermediate beyond the two planes ever hits HBM.

    ``with_counters`` appends a (B, 3) f32 capacity-counter array to the
    return: [candidate-buffer overflow flag, oversized clusters dropped
    at the member-scan cap, saddle slots full flag]. Non-zero entries
    mean the fixed-capacity pipeline MAY have diverged from the
    reference on that frame; the facade surfaces them as warnings.
    The XLA ops path has no candidate buffer or blob-size cap, so its
    first two counters are always 0.
    """
    import jax

    if use_pallas:
        # exotic DynamicImage layouts (LumaA, RGB16, f32) fold onto the
        # kernels' native raw modes; the XLA paths below handle them
        # exactly via to_luma instead
        imgs = normalize_raw_batch(imgs)
    h, w = imgs.shape[1], imgs.shape[2]
    if decimate and use_pallas:
        if turbo_fast_path_ok(h, w):
            # (w < 2**16: sparse-refine label/coord domain at FULL res)
            return _pallas_decimated_frontend_batch(
                imgs, params, consts, caps, with_counters, nms=nms
            )
        if h * w >= 2**24:  # large frame leaving the fast path: warn
            _warn_pallas_fallback(h, w, decimate)
    # the Pallas cluster kernel needs the padded height to cover one
    # _WIN-row window; smaller frames take the XLA path below silently
    # (their XLA planes are cheap and the kernel genuinely can't run),
    # and frames beyond the packed-label domain (8K-class) fall back to
    # the XLA ops path WITH a warning instead of tripping the kernel's
    # assertions
    if use_pallas and not decimate and not _pallas_cluster_ok(h, w) and (
        w >= 2**16 or h * w >= 2**24
    ):
        _warn_pallas_fallback(h, w, decimate)
    if use_pallas and not decimate and _pallas_cluster_ok(h, w):
        from .pallas.cluster import (
            cluster_rochade_raw,
            saddles_from_candidates,
        )
        from .pallas.frontend import front_kernel, pad_raw

        if imgs.ndim == 4 and imgs.shape[3] == 4:
            imgs = imgs[..., :3]  # alpha is ignored (ops/gray.py semantics)

        # fully fused Pallas path: the padded RAW frames feed BOTH
        # kernels — the min-pass computes luma8 + the response tile-min
        # (no blur plane write), and the cluster kernel recomputes
        # gray+blur in-window. Neither the f32 luma nor the f32 blur
        # plane ever exists in HBM (~2.5x less DMA than the unfused
        # pair); luma8 stays padded (decode gates on the true size)
        tile_h = _front_tile_h()
        raw_p, th_, tw_, channels, u16 = pad_raw(imgs, tile_h=tile_h)
        luma_u8, tile_min = front_kernel(
            raw_p, consts.blur_sigma, emit_blur=False, pre_padded=True,
            true_shape=(h, w), channels=channels, u16=u16, tile_h=tile_h,
        )
        # threshold = ratio * global response minimum (the only cross-
        # window dependency; src/detector.rs:414-418) — window skipping
        # itself happens inside the cluster kernel
        thr = (
            jnp.min(tile_min, axis=(1, 2, 3))
            * consts.response_threshold_ratio
        )
        fields, counts = cluster_rochade_raw(
            raw_p,
            thr,
            h,
            w,
            channels=channels,
            u16=u16,
            sigma=consts.blur_sigma,
            hp2=2 * consts.rochade_half_patch,
            move_thr=consts.rochade_move_threshold,
        )
        raw = jax.vmap(saddles_from_candidates)(fields)
        saddles = jax.vmap(
            lambda s: filter_and_compact(
                s,
                caps.max_saddles,
                consts.saddle_k_ratio,
                params.min_saddle_angle,
                params.max_saddle_angle,
            )
        )(raw)
        if with_counters:
            from .pallas.cluster import _CAPF

            counters = jnp.stack(
                [
                    (counts[:, 0] >= _CAPF).astype(jnp.float32),
                    counts[:, 1],
                    jax.vmap(lambda s: jnp.all(s.valid))(saddles).astype(
                        jnp.float32
                    ),
                ],
                axis=1,
            )
            return saddles, luma_u8, counters
        return saddles, luma_u8
    luma_f, luma_u8 = jax.vmap(to_luma)(imgs)
    if decimate:
        luma_f = jax.vmap(_decimate2)(luma_f)
    if use_pallas:
        from .pallas.frontend import fused_frontend

        blur, resp = fused_frontend(luma_f, consts.blur_sigma)
    else:
        blur = jax.vmap(lambda x: gaussian_blur(x, consts.blur_sigma))(luma_f)
        resp = jax.vmap(hessian_response)(blur)
    if decimate:
        saddles = jax.vmap(
            lambda im, b, r: _decimated_tail(im, b, r, params, consts, caps)
        )(imgs, blur, resp)
    else:
        saddles = jax.vmap(
            lambda b, r: _frontend_tail(b, r, params, consts, caps)
        )(blur, resp)
    if with_counters:
        zeros = jnp.zeros(imgs.shape[0], jnp.float32)
        counters = jnp.stack(
            [
                zeros,
                zeros,
                jax.vmap(lambda s: jnp.all(s.valid))(saddles).astype(
                    jnp.float32
                ),
            ],
            axis=1,
        )
        return saddles, luma_u8, counters
    return saddles, luma_u8


def _pallas_decimated_frontend_batch(
    imgs: jnp.ndarray,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
    with_counters: bool,
    nms: bool | None = None,
    interpret: bool = False,
):
    """Decimated ("turbo") front-end on the Pallas kernels: the front
    kernel emits full-res luma8 plus a HALF-resolution f32 luma plane
    (2x2 mean, computed in-window) already laid out in pad_raw format
    with the response tile-min evaluated at half resolution; the
    production cluster+ROCHADE kernel then runs unchanged on the half
    plane (f32 luma input mode), and survivors are re-refined at full
    resolution from the raw frames (``refine_at_raw``). Semantics =
    ``_decimated_tail`` (see tests/test_decimate.py)."""
    import jax

    from .pallas.cluster import (
        cluster_rochade_raw,
        saddles_from_candidates,
    )
    from .pallas.frontend import front_kernel_decimate, pad_raw

    h, w = imgs.shape[1], imgs.shape[2]
    if imgs.ndim == 4 and imgs.shape[3] == 4:
        imgs = imgs[..., :3]  # alpha is ignored (ops/gray.py semantics)
    tile_h = _front_tile_h()
    raw_p, th_, tw_, channels, u16 = pad_raw(imgs, tile_h=tile_h)
    luma_u8, half_p, tile_min = front_kernel_decimate(
        raw_p, consts.blur_sigma, pre_padded=True, true_shape=(h, w),
        channels=channels, u16=u16, tile_h=tile_h, interpret=interpret,
    )
    thr = jnp.min(tile_min, axis=(1, 2, 3)) * consts.response_threshold_ratio
    if _resolve_nms(nms):
        # clustering-free extraction: dense NMS + per-cell selection
        # matmuls instead of the label fixpoint + serial root drain
        # (both resolution-invariant and the turbo throughput floor).
        # Recall/corner contract pinned by tests/test_decimate.py.
        from .pallas.cluster import _CAPF as _capf
        from .pallas.nms import cells_to_fields, nms_extract_raw

        cells = nms_extract_raw(
            half_p,
            thr,
            h // 2,
            w // 2,
            channels=1,
            u16=False,
            luma_f32=True,
            win=160,
            sigma=consts.blur_sigma,
            hp2=2 * consts.rochade_half_patch,
            move_thr=consts.rochade_move_threshold,
            interpret=interpret,
            merge=_nms_merge(),
        )
        fields, n_peaks = jax.vmap(
            lambda c: cells_to_fields(c, _capf)
        )(cells)
        # counters in the drain kernel's layout: [appended (== capf
        # flags overflow), dropped past capacity]
        counts = jnp.stack(
            [
                jnp.minimum(n_peaks, float(_capf)),
                jnp.maximum(n_peaks - float(_capf), 0.0),
            ],
            axis=1,
        )
    else:
        fields, counts = cluster_rochade_raw(
            half_p,
            thr,
            h // 2,
            w // 2,
            channels=1,
            u16=False,
            luma_f32=True,
            # turbo is already approximate: skip blobs provably far from
            # any accept-gate pixel before the (per-root serial,
            # resolution-invariant) drain loop — ~2x fewer loop trips,
            # recall on the golden scenes pinned by tests/test_decimate.py
            prefilter=True,
            # half-res blobs are half as tall: 24 rows of blob headroom
            # instead of 48 — the dense passes scale with window rows
            win=160,
            sigma=consts.blur_sigma,
            hp2=2 * consts.rochade_half_patch,
            move_thr=consts.rochade_move_threshold,
            interpret=interpret,
        )
    raw = jax.vmap(saddles_from_candidates)(fields)
    half_saddles = jax.vmap(
        lambda s: filter_and_compact(
            s,
            caps.max_saddles,
            consts.saddle_k_ratio,
            params.min_saddle_angle,
            params.max_saddle_angle,
        )
    )(raw)
    if channels == 1 or w >= 384:
        # per-candidate DMA refine kernel (XLA refine_at_raw is
        # gather-bound on the TPU backend: ~3 ms/frame measured)
        from .pallas.refine import sparse_refine_raw

        refined = sparse_refine_raw(
            raw_p,
            half_saddles.p * 2.0 + 0.5,
            half_saddles.valid,
            h,
            w,
            channels=channels,
            u16=u16,
            sigma=consts.blur_sigma,
            hp2=2 * consts.rochade_half_patch,
            move_thr=consts.rochade_move_threshold,
            interpret=interpret,
        )
    else:
        refined = jax.vmap(
            lambda im, s: refine_at_raw(
                im,
                s.p * 2.0 + 0.5,
                s.valid,
                consts.blur_sigma,
                consts.rochade_half_patch,
                consts.rochade_move_threshold,
            )
        )(imgs, half_saddles)
    saddles = jax.vmap(
        lambda s: filter_and_compact(
            s,
            caps.max_saddles,
            consts.saddle_k_ratio,
            params.min_saddle_angle,
            params.max_saddle_angle,
        )
    )(refined)
    if with_counters:
        from .pallas.cluster import _CAPF

        counters = jnp.stack(
            [
                (counts[:, 0] >= _CAPF).astype(jnp.float32),
                counts[:, 1],
                jax.vmap(lambda s: jnp.all(s.valid))(saddles).astype(
                    jnp.float32
                ),
            ],
            axis=1,
        )
        return saddles, luma_u8, counters
    return saddles, luma_u8


class DetectResult(NamedTuple):
    """Fixed-capacity detection output; host unpacks to {id: corners}."""

    ids: jnp.ndarray      # (P * G2,) int32, -1 where invalid
    corners: jnp.ndarray  # (P * G2, 4, 2) float32
    valid: jnp.ndarray    # (P * G2,) bool
    # (2,) f32 capacity audit [saddle slots full, kNN-pool prunes] —
    # non-zero means the fixed-capacity pipeline MAY diverge from the
    # reference on this frame; the facade warns (None on legacy paths)
    flags: jnp.ndarray | None = None


def detect_tail(
    saddles: Saddles,
    luma8: jnp.ndarray,
    spec: FamilySpec,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
    true_shape: tuple[int, int] | None = None,
    slots_full=None,
) -> DetectResult:
    """``max_num_of_boards`` rounds of board search + decode, removing
    the saddles of successfully decoded tags between rounds
    (reference src/detector.rs:510-538). Per frame (vmappable).

    ``slots_full``: optional scalar from the front-end (saddle capacity
    audit) folded into the result's ``flags``."""
    n = saddles.valid.shape[0]
    alive = saddles.valid

    pruned = jnp.float32(0.0)
    all_ids = []
    all_corners = []
    all_valid = []
    for _ in range(params.max_num_of_boards):
        res = find_best_board(
            saddles,
            alive,
            params.tag_spacing_ratio,
            caps.grid_radius,
            consts.quad_nn,
            caps.max_quads,
            caps.max_boards,
            caps.seeds_per_group,
            caps.max_attempts,
            consts.max_seeds,
            consts.early_exit_score,
            caps.knn_pool,
        )
        tag_valid = res.board.placed & res.found          # (G2,)
        # compact the placed cells to the decode capacity before
        # decoding (round-5: the grid holds G2 = (2R+1)^2 = 625 cells
        # but a real board places <= ~54 — decoding at G2 paid 5-12x
        # the bit-sampling gathers and hamming matmuls for padding).
        # Same max_tags-derived capacity policy as the hybrid dcap;
        # overflow rides the pruned audit channel.
        g2 = tag_valid.shape[0]
        dcap = min(g2, 2 * caps.max_tags)
        (sel,) = jnp.nonzero(tag_valid, size=dcap, fill_value=g2)
        live = sel < g2
        quad_idx = res.board.cell_quad[jnp.minimum(sel, g2 - 1)]  # (dcap, 4)
        pruned = pruned + (
            tag_valid.sum() - live.sum()
        ).astype(jnp.float32)
        quad_pos = saddles.p[jnp.maximum(quad_idx, 0)]    # (dcap, 4, 2)
        decoded = decode_quads(
            luma8,
            quad_pos,
            live,
            spec,
            consts.decode_margin,
            consts.valid_brightness_threshold,
            consts.max_invalid_bit,
            consts.min_contrast,
            true_shape=true_shape,
        )
        all_ids.append(decoded.ids)
        all_corners.append(decoded.corners)
        all_valid.append(decoded.valid)
        pruned = pruned + res.board.pruned.astype(jnp.float32)
        # only successfully decoded quads release their saddles
        # (src/detector.rs:517-536)
        used = jnp.where(decoded.valid[:, None], quad_idx, n)
        alive = alive.at[used.reshape(-1)].set(False, mode="drop")

    return DetectResult(
        ids=jnp.concatenate(all_ids),
        corners=jnp.concatenate(all_corners),
        valid=jnp.concatenate(all_valid),
        flags=jnp.stack(
            [
                jnp.float32(0.0) if slots_full is None
                else slots_full.astype(jnp.float32),
                pruned,
            ]
        ),
    )


def detect_pipeline(
    img: jnp.ndarray,
    spec: FamilySpec,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
    use_pallas: bool = False,
    decimate: bool = False,
) -> DetectResult:
    """Full detect() (reference src/detector.rs:505-540) for one image."""
    saddles, luma8 = saddle_frontend(
        img, params, consts, caps, use_pallas, decimate
    )
    return detect_tail(
        saddles, luma8, spec, params, consts, caps,
        slots_full=jnp.all(saddles.valid),
    )


def detect_pipeline_batch(
    imgs: jnp.ndarray,
    spec: FamilySpec,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
    use_pallas: bool = False,
    decimate: bool = False,
) -> DetectResult:
    """Batched full detect() (BASELINE.json config 2: vmap over frames)."""
    import jax

    hw = (imgs.shape[1], imgs.shape[2])
    saddles, luma8 = saddle_frontend_batch(
        imgs, params, consts, caps, use_pallas, decimate=decimate
    )
    return jax.vmap(
        lambda s, l8: detect_tail(
            s, l8, spec, params, consts, caps, hw,
            slots_full=jnp.all(s.valid),
        )
    )(saddles, luma8)

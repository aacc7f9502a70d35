"""Assembled jittable pipeline stages.

``saddle_frontend`` is the dense front half of detect()
(reference: TagDetector::refined_saddle_points, src/detector.rs:408-446):
gray -> blur -> Hessian response -> component centroids -> ROCHADE ->
strength/angle gates, producing a fixed-capacity saddle set. The back
half (board search + decode) lives in ops/board.py and ops/decode.py and
is assembled by ``detect_pipeline``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import Capacities, DetectorParams, PipelineConstants
from .ops.cluster import cluster_centroids
from .ops.frontend import gaussian_blur, hessian_response
from .ops.gray import to_luma
from .ops.rochade import Saddles, filter_and_compact, rochade_refine


def saddle_frontend(
    img: jnp.ndarray,
    params: DetectorParams,
    consts: PipelineConstants,
    caps: Capacities,
) -> tuple[Saddles, jnp.ndarray]:
    """Refined saddle points + u8 luma plane (for the bit sampler)."""
    luma_f, luma_u8 = to_luma(img)
    blur = gaussian_blur(luma_f, consts.blur_sigma)
    resp = hessian_response(blur)
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
    saddles = filter_and_compact(
        raw,
        caps.max_saddles,
        consts.saddle_k_ratio,
        params.min_saddle_angle,
        params.max_saddle_angle,
    )
    return saddles, luma_u8

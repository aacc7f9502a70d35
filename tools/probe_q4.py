"""Probe: quarter-res cascade for 4K turbo (VERDICT r3 item 5).

At 4K the turbo half plane is still ~2 MP of cluster-kernel work. This
probe validates, in NumPy, a 4x-decimated front-end with a TWO-STAGE
re-refine (quarter -> half -> full, each stage a plain ROCHADE fit on
the next-finer blur plane, reusing the existing half->full mapping
(x, y) -> (2x+0.5, 2y+0.5) at both hops), then the oracle's board
search + decode. Recall contract: same tag IDs as the oracle's EXACT
pipeline and corners within the turbo budget on 4K-class scenes.

Also reports the quarter-plane blob count vs the half plane's — the
cluster kernel's root-drain cost scales with it (the fixpoint/sweep
work scales with plane area: 4x less at quarter res).

Usage: python tools/probe_q4.py  (pure host: no TPU / relay needed)
"""

import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from aprilgrid_tpu.config import DEFAULT_PARAMS  # noqa: E402
from aprilgrid_tpu.oracle import numpy_ref as orc  # noqa: E402


def decimate2(plane):
    h, w = plane.shape
    hh, ww = h // 2 * 2, w // 2 * 2
    x = plane[:hh, :ww].reshape(hh // 2, 2, ww // 2, 2)
    return (
        (x[:, 0, :, 0] + x[:, 0, :, 1]) + (x[:, 1, :, 0] + x[:, 1, :, 1])
    ) * np.float32(0.25)


def kphi_gate(saddles, params):
    if not saddles:
        return []
    mk = max(s.k for s in saddles) / 10.0
    return [
        s for s in saddles
        if s.k >= mk
        and params.min_saddle_angle <= s.phi <= params.max_saddle_angle
    ]


def cascade_refined(img, params, stats):
    """Quarter-res detect + quarter->half->full two-stage re-refine."""
    luma = orc.to_luma32f(img)
    half = decimate2(luma)
    quarter = decimate2(half)

    blur_q = orc.gaussian_blur_f32(quarter, 1.5)
    resp_q = orc.hessian_response(blur_q)
    thr = float(resp_q.min()) * 0.05
    centers_q = orc.saddle_cluster_centers(resp_q, thr)
    stats["quarter_blobs"] = len(centers_q)
    saddles_q = kphi_gate(orc.rochade_refine(blur_q, centers_q, 2), params)
    stats["quarter_gated"] = len(saddles_q)
    if not saddles_q:
        return []

    blur_h = orc.gaussian_blur_f32(half, 1.5)
    pts_h = [(2.0 * s.p[0] + 0.5, 2.0 * s.p[1] + 0.5) for s in saddles_q]
    saddles_h = kphi_gate(orc.rochade_refine(blur_h, pts_h, 2), params)
    stats["half_gated"] = len(saddles_h)
    if not saddles_h:
        return []

    blur_f = orc.gaussian_blur_f32(luma, 1.5)
    pts_f = [(2.0 * s.p[0] + 0.5, 2.0 * s.p[1] + 0.5) for s in saddles_h]
    refined = kphi_gate(orc.rochade_refine(blur_f, pts_f, 2), params)
    stats["full_gated"] = len(refined)

    # comparison point: the current turbo half plane's blob count
    resp_h = orc.hessian_response(blur_h)
    thr_h = float(resp_h.min()) * 0.05
    stats["half_blobs"] = len(orc.saddle_cluster_centers(resp_h, thr_h))
    return refined


def detect_from_refined(img, refined, params, family="t36h11"):
    det = orc.TagDetector(family, params)
    detected = {}
    gray8 = orc.to_luma8(img)
    for _ in range(params.max_num_of_boards):
        board_tags = orc.try_find_best_board(refined)
        if board_tags is None:
            continue
        to_remove = set()
        for quad_indexes in board_tags:
            quad_points = [refined[i].p for i in quad_indexes]
            res = det._try_decode_quad(gray8, quad_points)
            if res is not None:
                tag_id, corners = res
                detected[tag_id] = corners
                to_remove.update(quad_indexes)
        refined = [s for i, s in enumerate(refined) if i not in to_remove]
    return detected


def scene_4k(name):
    base = orc.load_image(f"/root/repo/tests/data/{name}.png")
    h, w = base.shape[:2]
    frame = np.full((2160, 3840) + base.shape[2:], 128, base.dtype)
    y0, x0 = (2160 - h) // 2, (3840 - w) // 2
    frame[y0:y0 + h, x0:x0 + w] = base
    return frame


def main():
    params = DEFAULT_PARAMS
    scenes = sys.argv[1:] or ["two_boards", "iphone"]
    for name in scenes:
        img = scene_4k(name)
        ref = orc.TagDetector("t36h11", params).detect(img)
        stats: dict = {}
        refined = cascade_refined(img, params, stats)
        got = detect_from_refined(img, refined, params)
        ids_ok = set(got) == set(ref)
        err = 0.0
        if ids_ok and got:
            err = max(
                float(np.abs(np.asarray(got[t]) - np.asarray(ref[t])).max())
                for t in ref
            )
        print(
            f"4K[{name}]: tags {len(got)}/{len(ref)} ids_ok={ids_ok} "
            f"max_corner_err={err:.4f}px  {stats}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Probe: clustering-free NMS saddle extraction for the turbo mode.

Round-3 verdict item 1: the turbo half-res cluster kernel is floored by
the CCL label fixpoint (~15-39 sweeps/window) plus the per-root serial
drain (~0.65 us x ~1-2k blobs, resolution-invariant). The blob
centroid's only job is picking WHERE to read the dense ROCHADE record
(pallas/cluster.py make_records), so this probe validates replacing
{fixpoint + centroid + drain} with a fully dense, loop-free scheme:

  candidate pixels = mask (resp < thr) & record accept gate (okf)
  peak = candidate whose response is the window minimum within a
         Chebyshev radius R (NMS; strongest saddle wins), ties broken
         by scan order via a second masked position min-filter — the
         exact two-pass formulation the Pallas kernel would use
  one candidate per peak: corner = peak + record (x0, y0) offset,
  k/theta/phi from the record planes at the peak

With R >= 7, any 8x8 cell holds at most ONE surviving peak by
construction, so the kernel can emit candidates with two small
selection matmuls per record plane (MXU, no serial loop at all).

Validated here in NumPy on the >= 2 MP golden scenes (turbo's domain):
  (a) end-to-end: final tag IDs + corners (after the full-res re-refine
      and the oracle's board search + decode) vs the oracle's EXACT
      pipeline — the tests/test_decimate.py contract;
  (b) kernel-shaping stats: peaks per 8x8 cell, per-blob peak counts,
      min pairwise peak distance, candidate counts vs the drain path.

Usage: python tools/probe_nms.py [R ...]   (default R = 3 5 7)
"""

import math
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, "/root/repo")

from aprilgrid_tpu.config import DEFAULT_PARAMS  # noqa: E402
from aprilgrid_tpu.oracle import numpy_ref as orc  # noqa: E402


def dense_records(blur_h):
    """Vectorized ROCHADE record planes (oracle rochade_refine semantics
    evaluated at every pixel; pallas/cluster.py make_records twin)."""
    pinv = orc._rochade_pinv(2)  # (6, 25)
    cone = orc._cone_kernel(2)  # (5, 5)
    smooth = ndimage.correlate(
        blur_h.astype(np.float64), cone, mode="constant"
    )
    a = [
        ndimage.correlate(smooth, pinv[j].reshape(5, 5), mode="constant")
        for j in range(5)
    ]
    a1, a2, a3, a4, a5 = a
    dqf = (2.0 * a1) * (2.0 * a3) - a2 * a2
    safe = np.where(dqf == 0.0, 1.0, dqf)
    x0 = (-2.0 * a3 * a4 + a2 * a5) / safe
    y0 = (-2.0 * a1 * a5 + a2 * a4) / safe
    c5 = (a1 + a3) * 0.5
    c4 = (a1 - a3) * 0.5
    c3 = a2 * 0.5
    kk = np.hypot(c4, c3)
    okf = (dqf < 0.0) & (np.abs(x0) <= 1.0) & (np.abs(y0) <= 1.0) & (
        np.abs(c5) < kk
    )
    return x0, y0, c3, c4, c5, kk, okf


def merge_peaks(peaks, relay, sweeps):
    """Geodesic peak merge (round-4: pays down the ~1.7x multi-peak
    candidate inflation the NMS A/B measured). Propagate the scan-order
    minimum PEAK position over the RESPONSE mask (``relay``; the blob
    connectivity domain — NOT the candidate set, whose okf record gate
    is false on most interior blob pixels and would block the path
    between same-blob peaks) for ``sweeps`` 4-neighbor steps; a peak
    survives only if its own position wins at its pixel. Two peaks
    merge iff connected by a mask path of length <= sweeps — separate
    blobs can never merge (propagation cannot cross mask gaps), so this
    only collapses same-blob duplicates. Deterministic; the kernel twin
    uses identical math."""
    h, w = peaks.shape
    big = np.int64(2**62)
    pos = (np.arange(h)[:, None] * (2**16) + np.arange(w)[None, :]).astype(
        np.int64
    )
    key = np.where(peaks, pos, big)
    for _ in range(sweeps):
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            sh = np.full_like(key, big)
            src_y = slice(max(dy, 0), h + min(dy, 0))
            dst_y = slice(max(-dy, 0), h + min(-dy, 0))
            src_x = slice(max(dx, 0), w + min(dx, 0))
            dst_x = slice(max(-dx, 0), w + min(-dx, 0))
            sh[dst_y, dst_x] = key[src_y, src_x]
            key = np.where(relay & (sh < key), sh, key)
    return peaks & (key == pos)


def nms_peaks(resp, cand, radius):
    """Two-pass NMS exactly as the kernel would do it: (1) plateau =
    candidate achieving the masked response min of its own (2R+1)^2
    window; (2) among plateau pixels, scan-order position breaks ties
    (a second masked min-filter). No two peaks within Chebyshev R."""
    big = np.float32(np.inf)
    masked = np.where(cand, resp, big)
    size = 2 * radius + 1
    winmin = ndimage.minimum_filter(masked, size=size, mode="constant", cval=big)
    plateau = cand & (masked == winmin)
    h, w = resp.shape
    pos = (np.arange(h)[:, None] * (2**16) + np.arange(w)[None, :]).astype(
        np.int64
    )
    posm = np.where(plateau, pos, np.int64(2**62))
    posmin = ndimage.minimum_filter(
        posm, size=size, mode="constant", cval=np.int64(2**62)
    )
    return plateau & (pos == posmin)


def saddles_from_peaks(peaks, x0, y0, c3, c4, c5, kk):
    ys, xs = np.nonzero(peaks)
    out = []
    for y, x in zip(ys, xs):
        k = float(kk[y, x])
        phi = math.degrees(math.acos(-float(c5[y, x]) / k) / 2.0)
        theta = math.degrees(math.atan2(float(c3[y, x]), float(c4[y, x])) / 2.0)
        out.append(
            orc.Saddle(
                p=(x + float(x0[y, x]), y + float(y0[y, x])),
                k=k,
                theta=theta,
                phi=phi,
            )
        )
    return out


def kphi_gate(saddles, params):
    if not saddles:
        return []
    mk = max(s.k for s in saddles) / 10.0
    return [
        s
        for s in saddles
        if s.k >= mk
        and params.min_saddle_angle <= s.phi <= params.max_saddle_angle
    ]


def detect_from_refined(img, refined, params, family="t36h11"):
    """Oracle detect() downstream (board search + decode) from a given
    refined saddle list."""
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


def turbo_nms_detect(img, radius, params, stats):
    luma = orc.to_luma32f(img)
    h, w = luma.shape
    hh, ww = h // 2 * 2, w // 2 * 2
    x = luma[:hh, :ww].reshape(hh // 2, 2, ww // 2, 2)
    half = (
        (x[:, 0, :, 0] + x[:, 0, :, 1]) + (x[:, 1, :, 0] + x[:, 1, :, 1])
    ) * np.float32(0.25)
    blur_h = orc.gaussian_blur_f32(half, 1.5)
    resp_h = orc.hessian_response(blur_h)
    thr = float(resp_h.min()) * 0.05
    mask = resp_h < thr
    x0, y0, c3, c4, c5, kk, okf = dense_records(blur_h)
    hp, wp = resp_h.shape
    margin = np.zeros_like(mask)
    margin[4 : hp - 4, 4 : wp - 4] = True
    cand = mask & okf & margin
    peaks = nms_peaks(resp_h, cand, radius)
    if stats.get("merge_sweeps"):
        stats["peaks_premerge"] = int(peaks.sum())
        # relay domain matches the kernel's valid_px-gated mask (the
        # 1-px global border is excluded there because the windowed
        # response at edge rows/cols is roll-wrapped garbage)
        inner = np.zeros_like(mask)
        inner[1:-1, 1:-1] = True
        peaks = merge_peaks(peaks, mask & inner, stats["merge_sweeps"])

    # --- stats -----------------------------------------------------
    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)
    labels, n = ndimage.label(mask, structure=structure)
    # current turbo drain: blob centroid rounded, record okf there
    centers = orc.saddle_cluster_centers(resp_h, thr)
    acc_blobs = 0
    acc_label_set = set()
    for i, (cx, cy) in enumerate(centers):
        rx, ry = int(orc.rust_round(cx)), int(orc.rust_round(cy))
        if 4 <= ry < hp - 4 and 4 <= rx < wp - 4 and okf[ry, rx]:
            acc_blobs += 1
            acc_label_set.add(i + 1)
    # drain-path equivalent counts after the k/phi gate (host-search and
    # sparse-refine cost both scale with this, not with raw peak count)
    drain_saddles = []
    for cx, cy in centers:
        rx, ry = int(orc.rust_round(cx)), int(orc.rust_round(cy))
        if 4 <= ry < hp - 4 and 4 <= rx < wp - 4 and okf[ry, rx]:
            k = float(kk[ry, rx])
            phi = math.degrees(math.acos(-float(c5[ry, rx]) / k) / 2.0)
            theta = math.degrees(
                math.atan2(float(c3[ry, rx]), float(c4[ry, rx])) / 2.0
            )
            drain_saddles.append(
                orc.Saddle(
                    p=(rx + float(x0[ry, rx]), ry + float(y0[ry, rx])),
                    k=k,
                    theta=theta,
                    phi=phi,
                )
            )
    stats["drain_half_gated"] = len(kphi_gate(drain_saddles, DEFAULT_PARAMS))
    peak_labels = labels[peaks]
    n_peaks = int(peaks.sum())
    blobs_with_peak = set(peak_labels[peak_labels > 0].tolist())
    missed = acc_label_set - blobs_with_peak
    multi = 0
    if n_peaks:
        cnt = np.bincount(peak_labels[peak_labels > 0], minlength=n + 1)
        multi = int((cnt >= 2).sum())
    # peaks per 8x8 cell
    ys, xs = np.nonzero(peaks)
    cells = (ys // 8) * ((wp + 7) // 8) + (xs // 8)
    cellmax = int(np.bincount(cells).max()) if n_peaks else 0
    # min pairwise Chebyshev distance between peaks
    mind = None
    if n_peaks > 1:
        pts = np.stack([ys, xs], 1)
        mind = int(
            min(
                np.abs(pts[i] - np.delete(pts, i, 0)).max(1).min()
                for i in range(min(n_peaks, 4000))
            )
        )
    stats.update(
        blobs=n,
        acc_blobs=acc_blobs,
        peaks=n_peaks,
        missed_acc_blobs=len(missed),
        blobs_multi_peak=multi,
        max_peaks_per_8x8_cell=cellmax,
        min_peak_chebyshev=mind,
    )

    # --- end-to-end ------------------------------------------------
    saddles_h = saddles_from_peaks(peaks, x0, y0, c3, c4, c5, kk)
    survivors = kphi_gate(saddles_h, params)
    stats["half_gated"] = len(survivors)
    if not survivors:
        return {}
    blur_f = orc.gaussian_blur_f32(luma, 1.5)
    pts = [(2.0 * s.p[0] + 0.5, 2.0 * s.p[1] + 0.5) for s in survivors]
    refined = orc.rochade_refine(blur_f, pts, 2)
    refined = kphi_gate(refined, params)
    stats["full_gated"] = len(refined)
    if not refined:
        return {}
    return detect_from_refined(img, refined, params)


def main():
    # usage: probe_nms.py [R ...] [mK ...]  (mK = merge with K sweeps,
    # at R=3: e.g. "probe_nms.py 3 m4 m6 m8")
    radii: list[tuple[int, int]] = []  # (radius, merge_sweeps)
    for a in sys.argv[1:]:
        if a.startswith("m"):
            radii.append((3, int(a[1:])))
        else:
            radii.append((int(a), 0))
    radii = radii or [(3, 0), (5, 0), (7, 0)]
    params = DEFAULT_PARAMS
    for name in ("iphone", "two_boards"):
        img = orc.load_image(f"/root/repo/tests/data/{name}.png")
        ref = orc.TagDetector("t36h11", params).detect(img)
        for radius, msweeps in radii:
            stats: dict = {"merge_sweeps": msweeps}
            got = turbo_nms_detect(img, radius, params, stats)
            ids_ok = set(got) == set(ref)
            err = 0.0
            if ids_ok and got:
                err = max(
                    np.abs(np.asarray(got[t]) - np.asarray(ref[t])).max()
                    for t in ref
                )
            print(
                f"{name} R={radius} m{msweeps}: tags {len(got)}/{len(ref)} "
                f"ids_ok={ids_ok} max_corner_err={err:.4f}px  {stats}",
                flush=True,
            )


if __name__ == "__main__":
    main()

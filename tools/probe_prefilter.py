"""Keep-rate analysis of the turbo blob pre-filter (pallas/cluster.py
``prefilter=True``): for each golden scene, at HALF resolution (the
decimated turbo plane), what fraction of response blobs contain a seed
(an accept-gate pixel dilated by 2 px, label-blind) and would therefore
enter the per-root drain loop?

Pure NumPy/scipy — runs with the relay down. The drain loop is the
kernel's dominant serial cost (~0.65 us/blob, resolution-invariant), so
the keep rate directly predicts the prefilter's win.
"""

import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aprilgrid_tpu.oracle.numpy_ref import (  # noqa: E402
    _cone_kernel,
    _rochade_pinv,
    gaussian_blur_f32,
    hessian_response,
    load_image,
    to_luma32f,
)

IMAGES = ["EuRoC", "TUM_VI", "right", "r45", "top", "iphone", "two_boards"]
STRUCT = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def dense_ok_plane(blur: np.ndarray, move_thr: float = 1.0) -> np.ndarray:
    """The kernel's dense accept-gate plane: 25-tap cone smooth, 5
    separable quadric-fit coefficients, subpixel solve + gates."""
    cone = _cone_kernel(2)
    pinv = _rochade_pinv(2)  # (6, 25)
    h, w = blur.shape
    smooth = ndimage.correlate(
        blur.astype(np.float64), cone, mode="nearest"
    )
    a = np.zeros((5, h, w))
    for j in range(5):
        a[j] = ndimage.correlate(
            smooth, pinv[j].reshape(5, 5), mode="nearest"
        )
    a1, a2, a3, a4, a5 = a
    d = (2.0 * a1) * (2.0 * a3) - a2 * a2
    safe = np.where(d == 0.0, 1.0, d)
    x0 = (-2.0 * a3 * a4 + a2 * a5) / safe
    y0 = (-2.0 * a1 * a5 + a2 * a4) / safe
    c5 = (a1 + a3) * 0.5
    c4 = (a1 - a3) * 0.5
    c3 = a2 * 0.5
    kk = np.sqrt(c4 * c4 + c3 * c3)
    return (
        (d < 0.0)
        & (np.abs(x0) <= move_thr)
        & (np.abs(y0) <= move_thr)
        & (np.abs(c5) < kk)
    )


def analyze(name: str, decimate: bool):
    img = load_image(f"tests/data/{name}.png")
    luma = to_luma32f(img)
    if decimate:
        h2, w2 = luma.shape[0] // 2, luma.shape[1] // 2
        luma = (
            luma[: 2 * h2 : 2, : 2 * w2 : 2]
            + luma[1 : 2 * h2 : 2, : 2 * w2 : 2]
            + luma[: 2 * h2 : 2, 1 : 2 * w2 : 2]
            + luma[1 : 2 * h2 : 2, 1 : 2 * w2 : 2]
        ) * 0.25
    blur = gaussian_blur_f32(luma, 1.5)
    resp = hessian_response(blur)
    thr = resp.min() * 0.05
    mask = resp < thr
    labels, n = ndimage.label(mask, structure=STRUCT)
    ok = dense_ok_plane(blur) & mask
    # label-blind 2-px Chebyshev dilation (the kernel's separable max)
    okd = ndimage.maximum_filter(ok.astype(np.uint8), size=5) > 0
    seeded = np.unique(labels[mask & okd])
    seeded = seeded[seeded > 0]
    # ground truth: blobs whose rounded centroid passes the ok gate
    ys, xs = np.nonzero(mask)
    lab = labels[ys, xs]
    sx = np.bincount(lab, weights=xs, minlength=n + 1)
    sy = np.bincount(lab, weights=ys, minlength=n + 1)
    cnt = np.bincount(lab, minlength=n + 1)
    acc = []
    h, w = blur.shape
    for i in range(1, n + 1):
        cx = int(np.floor(sx[i] / cnt[i] + 0.5))
        cy = int(np.floor(sy[i] / cnt[i] + 0.5))
        if 0 <= cy < h and 0 <= cx < w and ok[cy, cx]:
            acc.append(i)
    missed = sorted(set(acc) - set(seeded.tolist()))
    print(
        f"{name:12s} {'half' if decimate else 'full'}: blobs {n:5d}  "
        f"seeded {len(seeded):5d} ({100.0 * len(seeded) / max(n, 1):5.1f}%)  "
        f"accepted {len(acc):4d}  missed-by-prefilter {len(missed)}"
    )
    return n, len(seeded), len(acc), len(missed)


if __name__ == "__main__":
    for dec in (True, False):
        tot = np.zeros(4, dtype=np.int64)
        for nm in IMAGES:
            tot += np.array(analyze(nm, dec))
        print(
            f"{'HALF' if dec else 'FULL'} total: blobs {tot[0]} seeded "
            f"{tot[1]} ({100.0 * tot[1] / tot[0]:.1f}%) accepted {tot[2]} "
            f"missed {tot[3]}"
        )

"""Input adapters — the kornia-adapter equivalent.

The reference feature-gates a kornia image adapter
(detect_kornia, src/detector.rs:478-503: u8 1- or 3-channel images are
wrapped and dispatched to detect). The TPU-native equivalents accept the
Python array ecosystem instead:

* :func:`to_detector_input` — numpy arrays, torch tensors (HW, HWC or
  CHW), and any ``__dlpack__`` producer, normalized to the detector's
  expected (H, W[, 3]) u8/u16 layout;
* :meth:`TagDetector.detect` already takes the result directly.
"""

from __future__ import annotations

import numpy as np


def to_detector_input(img) -> np.ndarray:
    """Normalize an array-like image to the detector's accepted layouts:
    (H, W) gray, (H, W, 2) gray+alpha, or (H, W, 3|4) RGB(A), each in
    uint8/uint16/float32 — the reference's full DynamicImage contract
    (src/detector.rs:409,507 convert ANY variant; the kornia adapter
    at :478-503 was narrower and panicked beyond u8 1/3-channel).

    Accepts numpy arrays, torch tensors (CPU or CUDA via .cpu()), and any
    object implementing ``__dlpack__``. Channel-first layouts (C in
    1..4 leading, with a trailing dim that is not a channel count) are
    transposed; 1-channel axes are squeezed. float64 narrows to
    float32. Raises for other layouts/dtypes.
    """
    if "torch" in type(img).__module__:
        img = img.detach().cpu().numpy()
    elif not isinstance(img, np.ndarray) and hasattr(img, "__dlpack__"):
        img = np.from_dlpack(img)
    img = np.asarray(img)

    if img.ndim == 3:
        if img.shape[0] in (1, 2, 3, 4) and img.shape[2] not in (1, 2, 3, 4):
            img = np.moveaxis(img, 0, 2)  # CHW -> HWC
        if img.shape[2] == 1:
            img = img[..., 0]
    if img.ndim not in (2, 3) or (
        img.ndim == 3 and img.shape[2] not in (2, 3, 4)
    ):
        raise ValueError(f"unsupported image layout {img.shape}")
    if img.dtype == np.float64:
        img = img.astype(np.float32)
    if img.dtype not in (np.uint8, np.uint16, np.float32):
        raise TypeError(
            f"only u8/u16/f32 images supported, got {img.dtype}"
        )
    return np.ascontiguousarray(img)


def detect_adapted(detector, img) -> dict[int, list[tuple[float, float]]]:
    """detect() over any supported array-like (detect_kornia equivalent)."""
    return detector.detect(to_detector_input(img))

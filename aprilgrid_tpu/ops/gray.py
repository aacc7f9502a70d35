"""Grayscale conversion with image-crate semantics, on device.

The reference converts the input twice (src/detector.rs:409,507):
``to_luma32f`` feeds the saddle front-end and ``to_luma8`` feeds the bit
sampler. Both conversions are reproduced here exactly — including the
image crate's Rec.709 float path for f32 luma and its integer fixed-point
path for u8 luma — so bit thresholds downstream agree with the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.709 luma coefficients (image crate's SRGB_LUMA).
_LUMA_R, _LUMA_G, _LUMA_B = 0.2126, 0.7152, 0.0722


def to_luma(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(luma_f32 in [0,1], luma_u8 as int32)`` for any supported input.

    Supported inputs: (H, W) uint8, (H, W) uint16, (H, W, 3|4) uint8.
    """
    if img.ndim == 2:
        if img.dtype == jnp.uint8:
            return img.astype(jnp.float32) / 255.0, img
        if img.dtype == jnp.uint16:
            v = img.astype(jnp.int32)
            # u16 -> u8 with rounding scale 255/65535 in integer arithmetic.
            u8 = ((v * 255 + 32767) // 65535).astype(jnp.uint8)
            return img.astype(jnp.float32) / 65535.0, u8
        raise TypeError(f"unsupported gray dtype {img.dtype}")
    if img.ndim == 3 and img.shape[2] in (3, 4) and img.dtype == jnp.uint8:
        rgbf = img[..., :3].astype(jnp.float32) / 255.0
        luma_f = (
            _LUMA_R * rgbf[..., 0] + _LUMA_G * rgbf[..., 1] + _LUMA_B * rgbf[..., 2]
        )
        rgbi = img[..., :3].astype(jnp.int32)
        luma_u8 = (
            (2126 * rgbi[..., 0] + 7152 * rgbi[..., 1] + 722 * rgbi[..., 2])
            // 10000
        ).astype(jnp.uint8)
        return luma_f, luma_u8
    raise TypeError(f"unsupported image shape/dtype {img.shape} {img.dtype}")

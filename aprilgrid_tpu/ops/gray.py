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


def _scale_u16_to_u8(v: jnp.ndarray) -> jnp.ndarray:
    """Image-crate u16 -> u8 component conversion (rounding 255/65535)."""
    return ((v * 255 + 32767) // 65535).astype(jnp.uint8)


def to_luma(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(luma_f32 in [0,1], luma_u8 as int32)`` for any supported input.

    Covers the reference's full DynamicImage contract
    (src/detector.rs:409,507 accept ANY variant): (H, W) u8/u16/f32
    gray, (H, W, 2) u8/u16 gray+alpha (alpha dropped — image-crate
    FromColor semantics, no premultiply), (H, W, 3|4) u8/u16/f32
    RGB(A). Semantics mirror oracle/numpy_ref.to_luma32f/to_luma8."""
    if img.ndim == 3 and img.shape[2] == 2:
        return to_luma(img[..., 0])  # LumaA: alpha is dropped
    if img.ndim == 2:
        if img.dtype == jnp.uint8:
            return img.astype(jnp.float32) / 255.0, img
        if img.dtype == jnp.uint16:
            v = img.astype(jnp.int32)
            # u16 -> u8 with rounding scale 255/65535 in integer arithmetic.
            return img.astype(jnp.float32) / 65535.0, _scale_u16_to_u8(v)
        if img.dtype in (jnp.float32, jnp.float64):
            f = img.astype(jnp.float32)
            # f32::round is half away from zero (not banker's rounding)
            u8 = jnp.floor(jnp.clip(f, 0.0, 1.0) * 255.0 + 0.5).astype(
                jnp.uint8
            )
            return f, u8
        raise TypeError(f"unsupported gray dtype {img.dtype}")
    if img.ndim == 3 and img.shape[2] in (3, 4):
        if img.dtype == jnp.uint8:
            rgbf = img[..., :3].astype(jnp.float32) / 255.0
            luma_f = (
                _LUMA_R * rgbf[..., 0]
                + _LUMA_G * rgbf[..., 1]
                + _LUMA_B * rgbf[..., 2]
            )
            rgbi = img[..., :3].astype(jnp.int32)
            luma_u8 = (
                (2126 * rgbi[..., 0] + 7152 * rgbi[..., 1] + 722 * rgbi[..., 2])
                // 10000
            ).astype(jnp.uint8)
            return luma_f, luma_u8
        if img.dtype == jnp.uint16:
            rgbf = img[..., :3].astype(jnp.float32) / 65535.0
            luma_f = (
                _LUMA_R * rgbf[..., 0]
                + _LUMA_G * rgbf[..., 1]
                + _LUMA_B * rgbf[..., 2]
            )
            # integer luma in the u16 source domain, then component
            # scale to u8 (oracle to_luma8 twin; fits int32: the
            # weighted sum is <= 10000 * 65535 < 2^31)
            rgbi = img[..., :3].astype(jnp.int32)
            luma16 = (
                2126 * rgbi[..., 0] + 7152 * rgbi[..., 1] + 722 * rgbi[..., 2]
            ) // 10000
            return luma_f, _scale_u16_to_u8(luma16)
        if img.dtype in (jnp.float32, jnp.float64):
            rgbf = img[..., :3].astype(jnp.float32)
            luma_f = (
                _LUMA_R * rgbf[..., 0]
                + _LUMA_G * rgbf[..., 1]
                + _LUMA_B * rgbf[..., 2]
            )
            u8 = jnp.floor(jnp.clip(luma_f, 0.0, 1.0) * 255.0 + 0.5).astype(
                jnp.uint8
            )
            return luma_f, u8
        raise TypeError(f"unsupported rgb dtype {img.dtype}")
    raise TypeError(f"unsupported image shape/dtype {img.shape} {img.dtype}")

"""Dense front-end: separable Gaussian blur + Hessian saddle response.

These are the whole-image hot loops of the reference
(gaussian_blur_f32 src/image_util.rs:110-206, hessian_response
src/image_util.rs:72-109). Here they are expressed as shift-and-accumulate
tensor ops that XLA fuses into a handful of VPU kernels; a fused Pallas
tile kernel lives in ``aprilgrid_tpu.pallas.frontend`` for the
performance path.

Semantics preserved exactly:

* blur kernel radius = ceil(2*sigma), normalized, borders clamped
  (edge-replicate) in both passes, horizontal first; accumulation order
  matches the reference tap order so CPU results are bit-identical;
* Hessian response computed on the interior only, borders left 0.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def gaussian_kernel(sigma: float) -> np.ndarray:
    radius = int(math.ceil(sigma * 2.0))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x * x) / np.float32(2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Separable blur with clamped borders (src/image_util.rs:110-206)."""
    k = gaussian_kernel(sigma)
    radius = (len(k) - 1) // 2
    h, w = img.shape
    padded = jnp.pad(img, ((0, 0), (radius, radius)), mode="edge")
    temp = jnp.zeros_like(img)
    for i, kw in enumerate(k):
        temp = temp + padded[:, i : i + w] * kw
    padded = jnp.pad(temp, ((radius, radius), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i, kw in enumerate(k):
        out = out + padded[i : i + h, :] * kw
    return out


def hessian_response(img: jnp.ndarray) -> jnp.ndarray:
    """det(Hessian) 3x3 stencil; borders 0 (src/image_util.rs:72-109)."""
    v = img
    lxx = v[1:-1, :-2] - 2.0 * v[1:-1, 1:-1] + v[1:-1, 2:]
    lyy = v[:-2, 1:-1] - 2.0 * v[1:-1, 1:-1] + v[2:, 1:-1]
    lxy = (v[:-2, 2:] - v[:-2, :-2] + v[2:, :-2] - v[2:, 2:]) * 0.25
    resp = lxx * lyy - lxy * lxy
    return jnp.pad(resp, ((1, 1), (1, 1)))

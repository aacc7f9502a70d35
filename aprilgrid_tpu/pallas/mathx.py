"""Transcendental helpers for Mosaic kernels.

The Pallas TPU lowering has no acos/atan/atan2 primitives; these are
float32-accurate implementations (Cephes-style argument reduction +
minimax polynomial, ~1 ulp) used inside kernels. Outside kernels use
jnp.arctan2/arccos directly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PI = float(np.pi)
_PI_2 = float(np.pi / 2)
_PI_4 = float(np.pi / 4)
_TAN_3PI_8 = 2.414213562373095
_TAN_PI_8 = 0.4142135623730950


def atan(x: jnp.ndarray) -> jnp.ndarray:
    """float32 atan via Cephes atanf reduction + 4-term polynomial."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)

    big = ax > _TAN_3PI_8
    mid = (~big) & (ax > _TAN_PI_8)

    safe_ax = jnp.where(ax == 0, 1.0, ax)
    x_big = -1.0 / safe_ax
    x_mid = (ax - 1.0) / (ax + 1.0)
    xr = jnp.where(big, x_big, jnp.where(mid, x_mid, ax))
    bias = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))

    z = xr * xr
    poly = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * xr + xr
    return sign * (bias + poly)


def atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """float32 atan2 with standard quadrant handling."""
    safe_x = jnp.where(x == 0, 1.0, x)
    base = atan(y / safe_x)
    res = jnp.where(
        x > 0,
        base,
        jnp.where(
            x < 0,
            jnp.where(y >= 0, base + _PI, base - _PI),
            jnp.where(y > 0, _PI_2, jnp.where(y < 0, -_PI_2, 0.0)),
        ),
    )
    return res


def acos(z: jnp.ndarray) -> jnp.ndarray:
    """float32 acos via atan2(sqrt(1 - z^2), z)."""
    z = jnp.clip(z, -1.0, 1.0)
    return atan2(jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)), z)

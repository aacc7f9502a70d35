"""Multi-camera streaming detection (BASELINE.json config 5).

A calibration rig streams N synchronized cameras; each camera's frames
batch along time. On a multi-chip slice the camera axis shards across
chips (one camera's stream never leaves its chip — zero collective
traffic); within a chip, frames batch through the same fused pipeline.
The reference has no analogue (single-threaded, one image at a time).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..detector import TagDetector


class MultiCameraDetector:
    """Per-camera sharded batched detection.

    Parameters
    ----------
    detector:
        The underlying :class:`TagDetector` (its family/params/capacities
        apply to every camera).
    mesh:
        Optional device mesh with a ``camera`` axis; when omitted, all
        cameras run on the default device.
    """

    def __init__(self, detector: TagDetector, mesh: Mesh | None = None):
        self.detector = detector
        self.mesh = mesh
        if mesh is not None and "camera" not in mesh.axis_names:
            raise ValueError("mesh must define a 'camera' axis")

    def detect(self, frames: np.ndarray) -> list[list[dict]]:
        """``frames``: (num_cameras, time, H, W[, C]) synchronized streams.

        Returns per-camera lists of {tag_id: corners} detections.
        """
        frames = jnp.asarray(frames)
        n_cam, n_t = frames.shape[:2]
        flat = frames.reshape((n_cam * n_t,) + frames.shape[2:])
        if self.mesh is not None:
            spec = P("camera", *([None] * (flat.ndim - 1)))
            flat = jax.device_put(flat, NamedSharding(self.mesh, spec))
        results = self.detector.detect_batch(flat)
        return [results[c * n_t : (c + 1) * n_t] for c in range(n_cam)]

"""aprilgrid_tpu — a TPU-native AprilGrid fiducial detector.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``powei-lin/aprilgrid-rs``: Kalibr-style 6x6 AprilGrid detection for camera
calibration. The whole detect() path — grayscale, Gaussian blur, Hessian
saddle response, connected-component clustering, ROCHADE subpixel
refinement, quad search, board growth, and tag bit decoding — runs as one
shape-static jitted program on TPU, batched over frames with ``vmap`` and
sharded over chips with ``shard_map``.

Public API (mirrors the reference's surface, reference src/lib.rs:1-8):

* :class:`TagDetector` — the detector facade (``detect``,
  ``refined_saddle_points``, ``detect_batch``).
* :class:`DetectorParams` — tuning knobs.
* :class:`TagFamily` — supported tag families.
"""

from .config import Capacities, DetectorParams, PipelineConstants
from .families import FamilySpec, TagFamily, get_family

__version__ = "0.3.0"

__all__ = [
    "Capacities",
    "DetectorParams",
    "FamilySpec",
    "PipelineConstants",
    "TagDetector",
    "TagFamily",
    "get_family",
]


def __getattr__(name):
    # Lazy import: keep `import aprilgrid_tpu` light (no jax import) for
    # tools that only need families/config.
    if name == "TagDetector":
        from .detector import TagDetector

        return TagDetector
    raise AttributeError(name)

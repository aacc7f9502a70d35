"""Profiling and tracing utilities.

The reference ships no tracing framework — only a cargo `profiling`
profile and diol microbenches (SURVEY.md section 5). The TPU-native
equivalents here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace;
* :class:`StageTimer` — wall-clock stage timing with explicit device
  synchronization (device dispatch is async; naive timing lies);
* :func:`detect_stage_report` — per-stage breakdown of the hybrid
  detect pipeline on a given batch.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aprilgrid_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(tree) -> None:
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    # some platforms under-report readiness; a tiny host read is definitive
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "shape")]
    if leaves:
        np.asarray(jax.tree.leaves(tree)[0]).reshape(-1)[:1]


@dataclass
class StageTimer:
    """Accumulates named stage wall times with device sync."""

    stages: dict = field(default_factory=dict)
    _t0: float = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, name: str, result=None):
        if result is not None:
            _sync(result)
        dt = time.perf_counter() - self._t0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self._t0 = time.perf_counter()
        return result

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{'stage':<28}{'ms':>10}{'%':>7}"]
        for k, v in self.stages.items():
            lines.append(f"{k:<28}{v * 1e3:>10.2f}{100 * v / total:>6.1f}%")
        lines.append(f"{'total':<28}{total * 1e3:>10.2f}")
        return "\n".join(lines)


def detect_stage_report(detector, imgs: np.ndarray, reps: int = 3) -> str:
    """Time each hybrid-pipeline stage over a batch (post-warmup)."""
    import jax.numpy as jnp

    from .. import native

    imgs_d = jnp.asarray(imgs)
    detector.detect_batch(imgs_d)  # warm every jit

    t = StageTimer()
    for _ in range(reps):
        t.start()
        saddles, luma8 = detector._frontend_batch_fn(imgs_d)
        t.stop("frontend (device)", saddles)
        sp = np.asarray(saddles.p)
        th = np.asarray(saddles.theta)
        alive = np.ascontiguousarray(np.asarray(saddles.valid), np.uint8)
        t.stop("saddle download")
        cap = (2 * detector.caps.grid_radius + 1) ** 2
        quads, counts = native.find_board_batch(
            np.ascontiguousarray(sp[..., 0]),
            np.ascontiguousarray(sp[..., 1]),
            th,
            alive,
            cap=cap,
        )
        t.stop("board search (native)")
        dcap = min(cap, 4 * detector.caps.max_tags)
        quads = quads[:, :dcap]
        qv = np.arange(dcap)[None, :] < counts[:, None]
        qp = np.take_along_axis(
            sp, np.maximum(quads, 0).reshape(imgs.shape[0], -1, 1), axis=1
        ).reshape(imgs.shape[0], dcap, 4, 2)
        dec = detector._decode_batch_fn(luma8, jnp.asarray(qp), jnp.asarray(qv))
        t.stop("decode (device)", dec)
    out = t.report()
    return out

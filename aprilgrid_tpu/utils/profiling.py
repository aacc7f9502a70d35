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
    """Time each hybrid-pipeline stage over a batch (post-warmup),
    mirroring TagDetector._detect_hybrid: fused front-end, one packed
    saddle download, then per board pass native search -> one packed
    quad upload -> device decode -> one packed result download."""
    import jax.numpy as jnp

    from .. import native

    imgs_d = jnp.asarray(imgs)
    detector.detect_batch(imgs_d)  # warm every jit
    hw = (int(imgs.shape[1]), int(imgs.shape[2]))
    cap = (2 * detector.caps.grid_radius + 1) ** 2
    dcap = min(cap, 2 * detector.caps.max_tags)
    b = imgs.shape[0]

    t = StageTimer()
    for _ in range(reps):
        t.start()
        packed, luma8 = detector._frontend_packed_fn(imgs_d)
        t.stop("frontend (device)", packed)
        pk = np.asarray(packed)
        sp = np.ascontiguousarray(pk[..., 0:2])
        th = np.ascontiguousarray(pk[..., 2])
        alive = np.ascontiguousarray(pk[..., 3] > 0.5).astype(np.uint8)
        t.stop("saddle download")
        for p in range(detector.params.max_num_of_boards):
            quads, counts = native.find_board_batch(
                np.ascontiguousarray(sp[..., 0]),
                np.ascontiguousarray(sp[..., 1]),
                th,
                alive,
                spacing_ratio=detector.params.tag_spacing_ratio,
                max_seeds=detector.consts.max_seeds,
                early_exit_score=detector.consts.early_exit_score,
                cap=cap,
            )
            t.stop(f"board search pass {p + 1} (host)")
            quads = np.ascontiguousarray(quads[:, :dcap])
            qarr = np.concatenate(
                [quads.reshape(b, dcap * 4), counts[:, None]], axis=1
            ).astype(np.int32)
            dec = detector._decode_packed_fn(
                packed, luma8, jnp.asarray(qarr), hw=hw, dcap=dcap
            )
            t.stop(f"decode pass {p + 1} (upload+device)", dec)
            arr = np.asarray(dec)
            t.stop(f"result download pass {p + 1}")
            valid = arr[..., 1] > 0.5
            fi, fj = np.nonzero(valid)
            alive[np.repeat(fi, 4), quads[fi, fj].reshape(-1)] = 0
            t.stop(f"collect pass {p + 1} (host)")
    return t.report()

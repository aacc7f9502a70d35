"""Inter-chip pipeline parallelism for the hybrid detector.

SURVEY.md section 2c (PP row): "stage-pipelined detect: front-end
(Pallas stencils) on one set of cores, decode/gather on another". This
module places the two device stages of the hybrid runtime on DIFFERENT
chips and streams micro-batches through them GPipe-style:

    chip A:  front-end(k+2)   (gray/blur/cluster/ROCHADE kernels)
    host:    board search(k+1) (native C++ on the tiny saddle arrays)
    chip B:  decode(k)         (affine sampling + MXU hamming)

Micro-batch k's packed saddle array and luma plane move A -> B over the
interconnect (``jax.device_put`` between committed devices lowers to a
direct device-to-device copy — ICI on a real slice) while chip A is
already busy with micro-batch k+1, so the transfer rides under compute.

When is this worth it over pure DP (``parallel.sharding``)? DP has zero
cross-chip traffic and scales embarrassingly, so it is the default; PP
helps when per-chip HBM is the constraint (the front-end's padded
planes + the decode tables can live on different chips) or when the two
stages' compiled programs thrash one chip's instruction/VMEM budget.
The reference has no analogue of either (single-threaded CPU,
SURVEY.md section 2c).
"""

from __future__ import annotations

from collections import deque

import numpy as np

import jax
import jax.numpy as jnp


class PipelineParallelDetector:
    """Two-stage (front-end chip, decode chip) pipelined detector.

    Parameters
    ----------
    detector:
        A hybrid-mode :class:`~aprilgrid_tpu.detector.TagDetector`; its
        jitted stages are reused unchanged (XLA places each call on the
        chip its inputs are committed to).
    devices:
        Two jax devices ``(front_chip, decode_chip)``; defaults to the
        first two available. With one device the pipeline degrades to
        the plain hybrid flow (still correct).
    depth:
        Micro-batches in flight per stage (2 covers the A->B hop).
    """

    def __init__(self, detector, devices=None, depth: int = 2):
        if detector.mode != "hybrid":
            raise ValueError("pipeline parallelism drives the hybrid mode")
        devs = list(devices) if devices is not None else jax.devices()
        if len(devs) < 2:
            devs = devs * 2
        self.det = detector
        self.dev_front, self.dev_decode = devs[0], devs[1]
        self.depth = max(1, int(depth))

    def detect_batches(self, batches):
        """Stream an iterable of (B, H, W[, C]) frame micro-batches;
        yields one ``list[{tag_id: corners}]`` per micro-batch, in
        order. Stage placement as in the module docstring."""
        det = self.det
        it = iter(batches)
        # stage queues: front -> (search+decode) -> collect
        fronts: deque = deque()
        decodes: deque = deque()

        def start_front():
            try:
                arr = next(it)
            except StopIteration:
                return False
            imgs = jax.device_put(np.asarray(arr), self.dev_front)
            pk, luma8 = det._frontend_packed_fn(imgs)
            # ship the (small) packed saddles + luma to the decode chip
            # right away — the copy overlaps chip A's next micro-batch
            pk_b = jax.device_put(pk, self.dev_decode)
            l8_b = jax.device_put(luma8, self.dev_decode)
            from ..detector import _copy_to_host_async

            _copy_to_host_async(pk)
            fronts.append((pk, pk_b, l8_b, int(imgs.shape[1]),
                           int(imgs.shape[2])))
            return True

        def start_decode():
            if not fronts:
                return False
            pk, pk_b, l8_b, h, w = fronts.popleft()
            arrs = _search_passes(det, pk, pk_b, l8_b, (h, w))
            decodes.append(arrs)
            return True

        for _ in range(self.depth):
            start_front()
        while fronts or decodes:
            # keep chip A fed before draining the tail stages
            start_decode()
            start_front()
            if decodes:
                yield _collect(det, decodes.popleft())


def _search_passes(det, pk, pk_b, l8_b, hw):
    """Host board passes + chip-B decode dispatches for one micro-batch.
    Returns [(quads, dec_device_array), ...] per pass, dispatch-only
    (no blocking downloads here — collection happens a stage later)."""
    from .. import native
    from ..detector import _copy_to_host_async, _warn_counters

    cap = (2 * det.caps.grid_radius + 1) ** 2
    dcap = min(cap, 2 * det.caps.max_tags)
    pkh = np.asarray(pk)
    _warn_counters(pkh[:, -1, :3])
    det_pk = pkh[:, :-1]  # strip the counter row (see _frontend_packed_fn)
    sp = np.ascontiguousarray(det_pk[..., 0:2])
    theta = np.ascontiguousarray(det_pk[..., 2])
    alive = np.ascontiguousarray(det_pk[..., 3] > 0.5).astype(np.uint8)
    b = det_pk.shape[0]

    out = []
    changed = np.ones(b, bool)
    for p in range(det.params.max_num_of_boards):
        srch_alive = alive if p == 0 else alive * changed[:, None].astype(
            np.uint8
        )
        quads, counts = native.find_board_batch(
            np.ascontiguousarray(sp[..., 0]),
            np.ascontiguousarray(sp[..., 1]),
            theta,
            srch_alive,
            spacing_ratio=det.params.tag_spacing_ratio,
            max_seeds=det.consts.max_seeds,
            early_exit_score=det.consts.early_exit_score,
            cap=cap,
        )
        quads = np.ascontiguousarray(quads[:, :dcap])
        qarr = np.concatenate(
            [quads.reshape(b, dcap * 4), counts[:, None]], axis=1
        ).astype(np.int32)
        dec = det._decode_packed_fn(
            pk_b, l8_b, jax.device_put(qarr, pk_b.devices().pop()),
            hw=hw, dcap=dcap,
        )
        _copy_to_host_async(dec)
        arr = np.asarray(dec)
        valid = arr[..., 1] > 0.5
        fi, fj = np.nonzero(valid)
        alive[np.repeat(fi, 4), quads[fi, fj].reshape(-1)] = 0
        changed = np.zeros(b, bool)
        changed[np.unique(fi)] = True
        out.append((quads, arr))
    return out


def _collect(det, passes):
    b = passes[0][1].shape[0]
    results = [{} for _ in range(b)]
    for quads, arr in passes:
        valid = arr[..., 1] > 0.5
        fi, fj = np.nonzero(valid)
        ids = arr[fi, fj, 0].astype(np.int64)
        corners = arr[fi, fj, 2:].reshape(-1, 4, 2).tolist()
        for i, tag_id, cs in zip(fi.tolist(), ids.tolist(), corners):
            results[i][int(tag_id)] = [tuple(c) for c in cs]
    return results

"""Sparse full-resolution ROCHADE refine as a Pallas kernel.

The turbo ("decimate") mode re-refines the half-resolution survivors at
FULL resolution straight from the raw frame (reference refine semantics:
src/detector.rs:194-361 applied to gaussian_blur(to_luma(img))). Doing
that in XLA is gather-bound: an element gather of the (K, 15, 15)
patches measured ~3 ms/frame on the TPU backend, row-gather + one-hot
variants OOM or regress (unaligned slice gathers lower to scalar code).

Here each accepted candidate costs one aligned (24-row) raw-window DMA
(double-buffered behind the previous candidate's compute) plus dense
in-register math:

1. DMA a (24, 256-col) window of the padded raw plane around the
   candidate (RGB: 384 cols so the 128-lane alignment can also respect
   the channel interleave period, lcm(3, 128)*3 = 384 lanes per step);
2. gray conversion (pallas/frontend.py semantics) + the 7-tap separable
   blur on a lane-guarded stage — guards replicate window edges, which
   equals the reference's image-edge clamp exactly when the window abuts
   the image border (the only case they are read);
3. the ROCHADE record (cone smoothing, rank-1 separable quadric
   stencils, accept gates — the exact op sequence of
   pallas/cluster.py's dense record) evaluated on an aligned (16, 256)
   sub-window, and the record at the rounded candidate picked with a
   one-hot reduce;
4. the result written to the candidate's own output slot (slot-aligned:
   no reordering, so validity masks compose downstream).

Only the valid prefix (filter_and_compact compacts valid-first) is
processed: ~350-450 candidates/frame on the bundled 1080p scenes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.frontend import gaussian_kernel
from ..ops.geometry import rust_round
from ..ops.rochade import Saddles, _constants
from .cluster import _pinv_rank1

_ROWS = 24  # window rows: patch needs ry±7 plus 8-alignment slack


def _kernel(
    mats_ref, rx_ref, ry_ref, cnt_ref, raw_hbm, out_ref,
    slab, lscr, bscr, sem, *,
    taps, h, w, wp, channels, u16, hp2, move_thr, kcap,
):
    bi = pl.program_id(0)
    radius = (len(taps) - 1) // 2
    # DMA geometry (lanes): gray/u16 move (24, 256) raw lanes; RGB moves
    # (24, 1152) interleaved lanes (384 cols — starts must be multiples
    # of lcm(3, 128) channels to keep lane 0 on channel 0)
    if channels == 3:
        dma_lanes = 1152
        win_cols = 384
    else:
        dma_lanes = 256
        win_cols = 256
    sw = 128 + win_cols + 128  # staged width (guard cols on both sides)
    hp16 = raw_hbm.shape[1]

    out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    size = hp2 + 1  # 5
    _, cone_np = _constants(hp2 // 2)  # quadric fits use the rank-1 factors

    def win_start(i):
        # clamp candidate coords defensively (invalid slots are masked
        # downstream; their addresses must merely be in range)
        ryc = jnp.clip(ry_ref[0, 0, i], 0, h - 1)
        rxc = jnp.clip(rx_ref[0, 0, i], 0, w - 1)
        pr8 = pl.multiple_of(
            jnp.clip(((ryc + 1) // 8) * 8, 0, hp16 - _ROWS), 8
        )
        if channels == 3:
            cb = pl.multiple_of(
                jnp.clip(((3 * rxc - 384) // 384) * 384, 0, 3 * wp - dma_lanes),
                128,
            )
            wx = rxc - cb // 3
        else:
            cb = pl.multiple_of(
                jnp.clip(((rxc - 64) // 128) * 128, 0, wp - dma_lanes), 128
            )
            wx = rxc - cb
        return ryc, rxc, pr8, cb, wx

    def start_dma(i, slot):
        _, _, pr8, cb, _ = win_start(i)
        pltpu.make_async_copy(
            raw_hbm.at[bi, pl.ds(pr8, _ROWS), pl.ds(cb, dma_lanes)],
            slab.at[slot],
            sem.at[slot],
        ).start()

    cnt = cnt_ref[0, 0, 0]

    @pl.when(cnt > 0)
    def _():
        start_dma(0, 0)

    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, 256), 0)
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (16, 256), 1)

    def body(i, carry):
        slot = i % 2
        ryc, rxc, pr8, cb, wx = win_start(i)

        @pl.when(i + 1 < cnt)
        def _():
            start_dma(i + 1, 1 - slot)

        pltpu.make_async_copy(
            raw_hbm.at[bi, pl.ds(pr8, _ROWS), pl.ds(cb, dma_lanes)],
            slab.at[slot],
            sem.at[slot],
        ).wait()

        x = slab[slot].astype(jnp.int32).astype(jnp.float32)
        if channels == 3:
            lf_chunks = []
            for c in range(0, win_cols, 128):
                lf_chunks.append(
                    jnp.dot(
                        x[:, 3 * c : 3 * (c + 128)],
                        mats_ref[:, 0:128],
                        preferred_element_type=jnp.float32,
                    )
                )
            lf = jnp.concatenate(lf_chunks, axis=1)  # (24, 384)
        elif u16:
            lf = x / 65535.0
        else:
            lf = x / 255.0

        # guard-staged blur: guards replicate the window edge columns;
        # they are only READ when the window abuts the image edge (wx
        # stays >= 64 cols from the guard otherwise), where replication
        # IS the reference clamp (padded lanes >= w replicate col w-1
        # via pad_raw already)
        lscr[:, 128 : 128 + win_cols] = lf
        lscr[:, 0:128] = jnp.repeat(lf[:, 0:1], 128, axis=1)
        lscr[:, 128 + win_cols : sw] = jnp.repeat(
            lf[:, win_cols - 1 : win_cols], 128, axis=1
        )
        y = lscr[:, :]
        temp = jnp.zeros_like(y)
        for k, kw in enumerate(taps):
            temp = temp + pltpu.roll(y, (radius - k) % sw, 1) * kw
        blur = jnp.zeros_like(y)
        for k, kw in enumerate(taps):
            blur = blur + pltpu.roll(temp, (radius - k) % _ROWS, 0) * kw
        bscr[:, :] = blur

        # aligned (16, 256) sub-window around the candidate; margins of
        # >= 4 rows/cols around (wyr, wxr) are guaranteed by the clips
        wy = ryc + 8 - pr8                      # in [7, 15]
        wxs = wx + 128                          # staged column
        lr8 = pl.multiple_of(jnp.clip(((wy - 4) // 8) * 8, 0, 8), 8)
        cb2 = pl.multiple_of(
            jnp.clip(((wxs - 64) // 128) * 128, 0, sw - 256), 128
        )
        bsub = bscr[pl.ds(lr8, 16), pl.ds(cb2, 256)]
        wyr = wy - lr8
        wxr = wxs - cb2

        # dense ROCHADE record (same op sequence as pallas/cluster.py)
        def stencil(src, weights):
            acc = jnp.zeros_like(src)
            for dr in range(size):
                sh_r = (16 - dr + 2) % 16
                t = pltpu.roll(src, sh_r, 0) if sh_r else src
                for dc in range(size):
                    wgt = float(weights[dr, dc])
                    if wgt == 0.0:
                        continue
                    sh_c = (256 - dc + 2) % 256
                    u = pltpu.roll(t, sh_c, 1) if sh_c else t
                    acc = acc + wgt * u
            return acc

        def stencil_1d(src, wv, axis):
            dim = 16 if axis == 0 else 256
            acc = jnp.zeros_like(src)
            for d in range(size):
                sh = (dim - d + 2) % dim
                t = pltpu.roll(src, sh, axis) if sh else src
                wgt = float(wv[d])
                if wgt != 0.0:
                    acc = acc + wgt * t
            return acc

        smooth = stencil(bsub, cone_np)
        vcache: dict = {}
        aplane = []
        for j in range(5):
            cvec, rvec = _pinv_rank1(hp2)[j]
            key = tuple(np.round(cvec, 12))
            if key not in vcache:
                vcache[key] = stencil_1d(smooth, cvec, 0)
            aplane.append(stencil_1d(vcache[key], rvec, 1))
        a1, a2, a3, a4, a5 = aplane
        dqf = (2.0 * a1) * (2.0 * a3) - a2 * a2
        safe_d = jnp.where(dqf == 0.0, 1.0, dqf)
        x0 = (-2.0 * a3 * a4 + a2 * a5) / safe_d
        y0 = (-2.0 * a1 * a5 + a2 * a4) / safe_d
        c5p = (a1 + a3) * 0.5
        c4p = (a1 - a3) * 0.5
        c3p = a2 * 0.5
        kkp = jnp.sqrt(c4p * c4p + c3p * c3p)
        okf = (
            (dqf < 0.0)
            & (jnp.abs(x0) <= move_thr)
            & (jnp.abs(y0) <= move_thr)
            & (jnp.abs(c5p) < kkp)
        )

        onehot = ((iota16 == wyr) & (iota256 == wxr)).astype(jnp.float32)
        vals = jnp.concatenate(
            [
                (jnp.sum(onehot * x0) + rxc.astype(jnp.float32)).reshape(1, 1),
                (jnp.sum(onehot * y0) + ryc.astype(jnp.float32)).reshape(1, 1),
                jnp.float32(0.0).reshape(1, 1),      # k derived downstream
                jnp.sum(onehot * c3p).reshape(1, 1),
                jnp.sum(onehot * c4p).reshape(1, 1),
                jnp.sum(onehot * c5p).reshape(1, 1),
                jnp.sum(onehot * okf.astype(jnp.float32)).reshape(1, 1),
                jnp.float32(1.0).reshape(1, 1),       # slot processed
            ],
            axis=1,
        )
        out_ref[0, pl.ds(i, 1), :] = vals
        return carry

    lax.fori_loop(0, jnp.minimum(cnt, kcap), body, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "channels", "u16", "sigma", "hp2", "move_thr", "interpret",
    ),
)
def sparse_refine_raw(
    raw_p: jnp.ndarray,       # pad_raw() output (B, Hp+16, Wp*C)
    centers: jnp.ndarray,     # (B, K, 2) f32 full-res candidate positions
    valid: jnp.ndarray,       # (B, K) bool, VALID-PREFIX compacted
    h: int,
    w: int,
    channels: int = 1,
    u16: bool = False,
    sigma: float = 1.5,
    hp2: int = 4,
    move_thr: float = 1.0,
    interpret: bool = False,
) -> Saddles:
    """Slot-aligned sparse ROCHADE refine from the padded raw plane.

    Returns ``Saddles`` whose row i refines ``centers[:, i]``; invalid
    or rejected slots have ``valid=False``. Semantics match
    ``ops.rochade.refine_at_raw`` (XLA) up to the established kernel
    numerics (MXU luma for RGB, rank-1 quadric stencils)."""
    b, kcap = centers.shape[:2]
    wp = raw_p.shape[2] // channels
    taps = tuple(float(v) for v in gaussian_kernel(sigma))
    assert len(taps) == 7, "kernel tuned for sigma<=1.5 (radius 3)"
    assert w >= 384 or channels == 1, "RGB window needs w >= 384"
    assert wp >= 256, "window DMA needs a padded width >= 256"

    rx = rust_round(centers[..., 0]).astype(jnp.int32)
    ry = rust_round(centers[..., 1]).astype(jnp.int32)
    in_bounds = (
        (ry - hp2 >= 0) & (ry + hp2 < h) & (rx - hp2 >= 0) & (rx + hp2 < w)
    ) & valid
    cnt = jnp.sum(valid, axis=1).astype(jnp.int32)

    from .frontend import _deinterleave_chunk

    mf, _ = _deinterleave_chunk(128)
    mats = jnp.asarray(mf)  # (384, 128)

    if channels == 3:
        sw = 128 + 384 + 128
        dma_lanes = 1152
    else:
        sw = 128 + 256 + 128
        dma_lanes = 256

    fields = pl.pallas_call(
        functools.partial(
            _kernel, taps=taps, h=h, w=w, wp=wp, channels=channels,
            u16=u16, hp2=hp2, move_thr=move_thr, kcap=kcap,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # (B, 1, K) with (1, 1, K) blocks: the last two block dims
            # must equal the array dims for SMEM blocks
            pl.BlockSpec((1, 1, kcap), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, kcap), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, kcap, 8), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, kcap, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS, dma_lanes), raw_p.dtype),
            pltpu.VMEM((_ROWS, sw), jnp.float32),
            pltpu.VMEM((_ROWS, sw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mats, rx[:, None, :], ry[:, None, :], cnt.reshape(b, 1, 1), raw_p)

    # angles + gates in one cheap XLA pass over the compacted rows
    c3, c4, c5 = fields[..., 3], fields[..., 4], fields[..., 5]
    k = jnp.sqrt(c4 * c4 + c3 * c3)
    safe_k = jnp.where(k == 0, 1.0, k)
    theta = jnp.degrees(jnp.arctan2(c3, c4) / 2.0)
    phi = jnp.degrees(jnp.arccos(jnp.clip(-c5 / safe_k, -1.0, 1.0)) / 2.0)
    ok = (fields[..., 6] > 0.5) & (fields[..., 7] > 0.5) & in_bounds
    return Saddles(
        p=fields[..., 0:2], k=k, theta=theta, phi=phi, valid=ok
    )

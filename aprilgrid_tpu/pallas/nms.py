"""Clustering-free saddle extraction for the TURBO mode (dense NMS).

The turbo half-res cluster kernel (pallas/cluster.py) was floored by two
resolution-invariant costs: the connected-component label fixpoint
(~28-39 sweeps/window) and the per-root SERIAL drain (~0.65 us x ~1-2k
blobs — a scalar latency chain the in-order core cannot hide). The blob
centroid those produce has exactly ONE job: picking where to read the
dense per-pixel ROCHADE record. This kernel replaces {fixpoint +
centroid + drain} with a fully dense, loop-free scheme validated
end-to-end against the NumPy oracle in tools/probe_nms.py (all >= 2 MP
golden scenes: identical tag IDs, corners within 0.08 px, 0-1 of ~390
drain-accepted blobs missed):

1. candidate = response mask & the dense record accept gate & a 4-px
   global-border margin (the same in_b gate the drain applied at the
   rounded centroid, applied at the pixel);
2. peak = candidate achieving the masked-response minimum of its own
   (2R+1)^2 Chebyshev window (strongest saddle wins), ties broken by
   scan-order position via a second masked min-filter over the plateau
   pixels. Both filters are separable log-tree roll/min passes.
3. With R = 3 the NMS guarantees no two peaks within Chebyshev
   distance 3, so every aligned 4x4 cell holds AT MOST ONE peak — the
   whole extraction becomes two small selection matmuls per record
   plane (MXU): cell[i, j] = sum over cell (peak ? plane : 0)
   = (P @ masked_plane @ S)[i, j], with P/S static 0/1 selection
   matrices. No serial loop, no gather, no append cursor.

The dense per-cell record array is compacted to the standard
fixed-capacity candidate layout by ONE XLA argsort per frame
(`cells_to_fields`), feeding the existing `saddles_from_candidates`.

APPROXIMATE by design (like the turbo mode itself): multi-peak blobs
emit one candidate per peak (~1.7x the drain's survivor count before the
k/phi gates), and blob-centroid semantics are replaced by local-extremum
semantics. Tag recall and corner agreement on >= 2 MP scenes are pinned
directly against the oracle by tests/test_decimate.py; the exact-parity
path never takes this kernel. Reference cluster semantics this
approximates: /root/reference/src/image_util.rs:208-236.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster import (
    _BAND,
    _blur_from_raw,
    _record_planes,
    _window_start,  # noqa: F401  (re-exported for the drain-geometry twin)
)


def _win_start(ti, hp, win, top):
    """Window start with a parameterized top context margin (the drain
    kernel's _window_start pins top=8; merge mode needs 16)."""
    return pl.multiple_of(jnp.clip(ti * _BAND - top, 0, hp - win), 8)

_R = 3          # NMS Chebyshev radius (probe: R=3 loses 0-1 accepted
                # blobs on the golden scenes; R=5/7 lose 25-46 while
                # still passing end-to-end — keep the safest)
_CELL = 4       # cell edge; ≤1 peak per aligned 4x4 cell at R=3 (two
                # peaks are > R apart, a 4x4 cell spans Chebyshev 3)
_WIN_T = 160    # turbo sweep-window rows (pallas/cluster.py win=160)

_BIGF = 3.0e38   # masked-out response sentinel (f32-representable)
_BIGI = 2**30    # masked-out packed-position sentinel (int32)


def _minfilt(x, radius, axis, dim, combine=jnp.minimum):
    """Separable sliding-window min over [i-radius, i+radius] along
    ``axis`` via two log-tree directional passes (forward covers
    [i, i+radius], backward [i-radius, i]; their pointwise min is the
    full window). Roll wrap-around delivers only +BIG sentinels at the
    window edges because callers mask edge rows/cols out of the
    candidate set first."""
    fwd = x
    span = 1
    while span <= radius:
        step = min(span, radius + 1 - span)
        fwd = combine(fwd, pltpu.roll(fwd, dim - step, axis))
        span += step
    bwd = x
    span = 1
    while span <= radius:
        step = min(span, radius + 1 - span)
        bwd = combine(bwd, pltpu.roll(bwd, step, axis))
        span += step
    return combine(fwd, bwd)


def _nms_kernel(
    *refs, h, w, hp2, move_thr, taps, channels, u16, gh, luma_f32, win,
    w8, merge,
):
    (mats_ref, thr_ref, roff_ref, src_hbm, out_ref, blur_w, lscr,
     sem) = refs
    rows = win + 16
    hp = src_hbm.shape[1] - 16
    if gh is None:
        gh = h
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    # merge mode claims a 16-row TOP margin (vs the drain kernel's 8):
    # kills flow strictly forward in scan order (pos-min propagation),
    # and a key's vertical travel is <= 1 row per sweep, so every
    # kill of a band peak originates <= merge rows above it — with
    # merge <= 8 all sources and relay paths sit inside the window and
    # the windowed merge EQUALS the global one (see merge block below).
    top = 16 if merge else 8
    row0 = _win_start(ti, hp, win, top)

    # double-buffered raw-slab DMA (same protocol as pallas/cluster.py)
    slot = (bi * nt + ti) % 2

    @pl.when(jnp.logical_and(bi == 0, ti == 0))
    def _():
        pltpu.make_async_copy(
            src_hbm.at[0, pl.ds(row0, rows), :], blur_w.at[0], sem.at[0]
        ).start()

    last_t = ti == nt - 1
    nbi = jnp.where(last_t, bi + 1, bi)
    nti = jnp.where(last_t, 0, ti + 1)
    nrow0 = _win_start(nti, hp, win, top)

    @pl.when(nbi < nb)
    def _():
        pltpu.make_async_copy(
            src_hbm.at[nbi, pl.ds(nrow0, rows), :],
            blur_w.at[1 - slot],
            sem.at[1 - slot],
        ).start()

    pltpu.make_async_copy(
        src_hbm.at[bi, pl.ds(row0, rows), :], blur_w.at[slot], sem.at[slot]
    ).wait()

    blur = _blur_from_raw(
        mats_ref, blur_w[slot], lscr, taps=taps, channels=channels,
        u16=u16, w=w, luma_f32=luma_f32, win=win,
    )
    wp = blur.shape[1]
    thr = thr_ref[bi, 0]
    roff = roff_ref[bi, 0]

    rloc = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 0)
    cloc = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 1)
    grow = row0 + rloc
    grow_g = grow + roff  # global image row (== grow single-chip)

    # Hessian response (identical math to pallas/cluster.py::_compute)
    left = pltpu.roll(blur, 1, 1)
    right = pltpu.roll(blur, wp - 1, 1)
    up = pltpu.roll(blur, 1, 0)
    down = pltpu.roll(blur, win - 1, 0)
    ul = pltpu.roll(up, 1, 1)
    ur = pltpu.roll(up, wp - 1, 1)
    dl = pltpu.roll(down, 1, 1)
    dr = pltpu.roll(down, wp - 1, 1)
    lxx = left - 2.0 * blur + right
    lyy = up - 2.0 * blur + down
    lxy = (ur - ul + dl - dr) * 0.25
    resp = lxx * lyy - lxy * lxy

    valid_px = (
        (rloc > 0) & (rloc < win - 1)
        & (grow_g > 0) & (grow_g < gh - 1)
        & (cloc > 0) & (cloc < w - 1)
    )
    mask = valid_px & (resp < thr)

    band_lo = ti * _BAND
    off = band_lo - row0  # 8-aligned; 0 / 8 / larger on the last window

    @pl.when(jnp.any(mask))
    def _window_body():
        # dense ROCHADE record (shared with the exact kernel)
        x0, y0, c3p, c4p, c5p, okf = _record_planes(
            blur, win, wp, hp2, move_thr
        )
        # candidate gate: response mask + record accept + the 4-px
        # global-border margin the drain applied at the rounded centroid
        # (applied at the pixel — probe-validated). The margin also
        # guarantees record validity: every candidate within R of a band
        # row sits at window rows [4, win-5], inside the stencils'
        # support, and is seen IDENTICALLY by both windows sharing it
        # (NMS decisions agree across window overlaps).
        inb = (
            (grow_g >= hp2) & (grow_g < gh - hp2)
            & (cloc >= hp2) & (cloc < w - hp2)
        )
        cand = mask & okf & inb

        # pass 1: strongest-response NMS (min over the Chebyshev window)
        masked = jnp.where(cand, resp, _BIGF)
        winmin = _minfilt(_minfilt(masked, _R, 1, wp), _R, 0, win)
        plateau = cand & (masked == winmin)
        # pass 2: scan-order tie-break among plateau pixels
        pos = (grow_g << 16) | cloc
        posm = jnp.where(plateau, pos, _BIGI)
        posmin = _minfilt(_minfilt(posm, _R, 1, wp), _R, 0, win)
        peaks = plateau & (pos == posmin)

        if merge:
            # geodesic peak merge (round 4): propagate the scan-order
            # MINIMUM peak position over the response mask (the blob
            # connectivity domain) for `merge` 4-neighbor sweeps; a
            # peak survives only if its own position wins at its pixel.
            # Same-blob duplicate peaks (the measured ~1.7x candidate
            # inflation) collapse onto the scan-first one; separate
            # blobs can never merge (propagation cannot cross mask
            # gaps). Kills flow strictly FORWARD in scan order (only a
            # smaller pos kills) and vertical key travel is <= 1 row
            # per sweep, so with the 16-row top margin every kill
            # source and relay path of a band peak is in-window with a
            # fully-decided NMS verdict: the windowed result equals the
            # global merge (NumPy twin: tools/probe_nms.py merge_peaks,
            # identical sweep/direction order). Sources are restricted
            # to rows whose NMS verdict has full context (R + record
            # support = 7 rows), except at the true image top/bottom
            # where the window edge IS the global edge.
            rel_lo = jnp.where(row0 == 0, 0, 7)
            rel_hi = jnp.where(row0 + win >= hp, win - 1, win - 8)
            reliable = (rloc >= rel_lo) & (rloc <= rel_hi)
            key = jnp.where(peaks & reliable, pos, _BIGI)
            # direction order matches the NumPy twin exactly (passes
            # chain within a sweep): from +x, -x, +y, -y
            for _ in range(merge):
                for axis, amt in (
                    (1, wp - 1), (1, 1), (0, win - 1), (0, 1),
                ):
                    nk = pltpu.roll(key, amt, axis)
                    key = jnp.where(mask & (nk < key), nk, key)
            peaks = peaks & (key == pos)

        # this window emits only its own band's peaks
        peaks = peaks & (grow >= band_lo) & (grow < band_lo + _BAND)

        # per-cell extraction: <= 1 peak per aligned 4x4 cell (R=3), so
        # a per-cell SUM of (peak ? plane : 0) is a point-read of the
        # record at the peak. Both the segmented sum AND the pack into
        # the (band/4, wp/4) cell grid are one pair of small selection
        # matmuls per plane: cell = P @ plane @ S with
        # P[i, r] = [r == off + 4i + {0..3}], S[c, j] = [c == 4j + {0..3}].
        ci16 = jax.lax.broadcasted_iota(jnp.int32, (_BAND // _CELL, win), 0)
        rr16 = jax.lax.broadcasted_iota(jnp.int32, (_BAND // _CELL, win), 1)
        d = rr16 - off
        pmat = ((d >> 2) == ci16) & (d >= 0) & (d < _BAND)
        pmat = pmat.astype(jnp.float32)
        cs = jax.lax.broadcasted_iota(jnp.int32, (wp, w8), 0)
        js = jax.lax.broadcasted_iota(jnp.int32, (wp, w8), 1)
        smat = ((cs >> 2) == js).astype(jnp.float32)

        planes = (
            jnp.where(peaks, cloc.astype(jnp.float32) + x0, 0.0),
            jnp.where(peaks, grow_g.astype(jnp.float32) + y0, 0.0),
            jnp.where(peaks, c3p, 0.0),
            jnp.where(peaks, c4p, 0.0),
            jnp.where(peaks, c5p, 0.0),
            # scan-order sort key (doubles as the presence bit: >= 1
            # where a peak landed, 0 elsewhere), exact in f32
            # (h*w < 2^24 asserted)
            jnp.where(
                peaks,
                (grow_g * w + cloc).astype(jnp.float32) + 1.0,
                0.0,
            ),
        )
        # precision=HIGHEST: the MXU's default single-pass bf16 matmul
        # would TRUNCATE the planes (labels up to 2^21, subpixel coords)
        # — interpret mode hides this. With 0/1 selection operands the
        # 3-pass product is exact: hi(v)*1 + lo(v)*1 + 0 = v.
        for p, plane in enumerate(planes):
            rowsum = jnp.dot(
                pmat, plane,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[0, p] = jnp.dot(
                rowsum, smat,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    @pl.when(jnp.logical_not(jnp.any(mask)))
    def _empty_window():
        for p in range(6):
            out_ref[0, p] = jnp.zeros((_BAND // _CELL, w8), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "channels", "u16", "sigma", "hp2", "move_thr",
        "interpret", "global_h", "luma_f32", "win", "merge",
    ),
)
def nms_extract_raw(
    raw_p: jnp.ndarray,  # pad_raw() output: (B, Hp+16, Wp*C) u8/u16/f32
    thr: jnp.ndarray,    # (B,) f32
    h: int,
    w: int,
    channels: int = 1,
    u16: bool = False,
    sigma: float = 1.5,
    hp2: int = 4,
    move_thr: float = 1.0,
    interpret: bool = False,
    row_off: jnp.ndarray | None = None,
    global_h: int | None = None,
    luma_f32: bool = True,
    win: int = _WIN_T,
    merge: int = 0,
):
    """Dense per-cell candidate records: (B, 6, tiles*32, Wp/4) f32 with
    plane order [x, y, c3, c4, c5, label+1] (label+1 >= 1 doubles as the
    presence bit). Compact with `cells_to_fields`. Gray conversion +
    blur are recomputed in-window from the padded raw input
    (bit-identical to pallas/cluster.py); ``row_off``/``global_h``
    follow cluster_rochade_raw's row-sharding contract (y and the sort
    label are emitted in GLOBAL coordinates)."""
    from ..ops.frontend import gaussian_kernel
    from .frontend import _deinterleave_chunk

    b = raw_p.shape[0]
    hp = raw_p.shape[1] - 16
    wp = raw_p.shape[2] // channels
    taps = tuple(float(v) for v in gaussian_kernel(sigma))
    assert len(taps) == 7, "kernel tuned for sigma<=1.5 (radius 3)"
    assert hp >= win and hp % 8 == 0
    assert win % 8 == 0 and wp % 128 == 0
    assert h * w < 2**24, (
        f"{h}x{w} scan-order labels exceed f32's exact-integer range"
    )
    # merge kill sources reach <= merge rows above a band peak; the
    # 16-row top margin plus the 7-row reliability inset bounds it
    assert 0 <= merge <= 8, merge
    tiles = -(-h // _BAND)
    w8 = wp // _CELL
    mf, _ = _deinterleave_chunk(128)
    mats = jnp.asarray(mf)
    if row_off is None:
        row_off = jnp.zeros((b,), jnp.int32)

    cells = pl.pallas_call(
        functools.partial(
            _nms_kernel, h=h, w=w, hp2=hp2, move_thr=move_thr,
            taps=taps, channels=channels, u16=u16, gh=global_h,
            luma_f32=luma_f32, win=win, w8=w8, merge=merge,
        ),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 6, _BAND // _CELL, w8),
            lambda bi, ti: (bi, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 6, tiles * (_BAND // _CELL), w8), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win + 16, wp * channels), raw_p.dtype),
            pltpu.VMEM((win + 16, wp + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mats, thr.reshape(b, 1), row_off.astype(jnp.int32).reshape(b, 1),
      raw_p)
    return cells


def cells_to_fields(cells: jnp.ndarray, capf: int = 1024):
    """Per-frame dense cell records -> the fixed-capacity candidate
    layout of pallas/cluster.py ([x, y, k=0, c3, c4, c5, ok, label+1],
    (capf, 8)) + the number of peaks found (for the overflow counters).
    A fixed-size ``nonzero`` (one cumsum, no sort) compacts the occupied
    cells; `saddles_from_candidates`'s label sort then restores exact
    scan order within the capacity. vmap over the batch axis."""
    flat = cells.reshape(6, -1)
    valid = flat[5] > 0.5
    n = jnp.sum(valid.astype(jnp.float32))
    (idx,) = jnp.nonzero(valid, size=capf, fill_value=flat.shape[1] - 1)
    take = flat[:, idx]  # (6, capf)
    okcol = (take[5] > 0.5).astype(jnp.float32)
    fields = jnp.stack(
        [
            take[0],
            take[1],
            jnp.zeros_like(okcol),
            take[2],
            take[3],
            take[4],
            okcol,
            take[5],
        ],
        axis=1,
    )
    return fields, n

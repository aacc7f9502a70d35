"""Fused Pallas kernel: clustering + ROCHADE, straight from the blur plane.

Replaces the XLA label-propagation path (ops/cluster.py + ops/rochade.py)
whose ~150 whole-image ops dominate device time, and avoids ever
materializing the Hessian-response plane: the blur plane is swept in
overlapping ``_WIN``-row windows with ``_BAND``-row assignment bands
and the response is recomputed in-window (the 3x3 stencil is free next
to the DMA). A saddle response blob is tiny (<=~30 px, SURVEY.md), so
each cluster is wholly contained in the window whose band holds its
top-most (minimum linear index) pixel. Per window, entirely in VMEM:

1. Hessian response (bit-identical to the frontend kernel's) and the
   threshold mask; windows with no masked pixel skip everything below;
2. min-index label relaxation to a fixpoint; roots extracted in
   ascending-region-minimum order by a serial two-root region DRAIN
   over loop-carried registers. Scan order is restored downstream by
   one XLA sort on the stored labels. (A vectorized per-chunk matmul
   extraction was probed and deleted in round 4: 31-38 % slower on
   hardware AND not bit-identical under Mosaic lowering — 464 vs 465
   candidates on two_boards; see docs/ROADMAP.md round-3 session-7);
3. the ROCHADE quadric fit (reference src/detector.rs:194-361) evaluated
   densely — cone smoothing (25 taps) then the 5 fit coefficients as
   SEPARABLE rank-1 stencils (shared 5-tap vertical + 5-tap horizontal
   passes) — and, still densely, the WHOLE candidate record per pixel:
   refined position (x, y), quadric coefficients (c3, c4, c5) and the
   accept-gate bit (d < 0, |move| <= thr, |c5| < k), using the exact
   f32 op sequence of src/detector.rs:330-356. The per-root loop then
   only scans members for the centroid and reads the precomputed record
   at the rounded centroid — the scalar subpixel solve, gate math and
   4/5 of the coefficient picks never run per root, and rejected roots
   (~78 % of blobs on the bundled scenes) skip the record read's
   reduction tail and the append entirely. Accepted candidates
   append-compact into a per-frame buffer with [accepted, dropped]
   counters.

One blur-window read per tile (~1.44x one image plane of HBM traffic
total). Clusters spanning more than ~40 rows are dropped and COUNTED
(the XLA path has no cap).

Input must be padded (width a multiple of 128, height a multiple of 8
and >= _WIN) with edge-replicated padding —
`pallas.frontend.front_kernel` produces exactly this.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.rochade import Saddles, _constants

_BAND = 128     # rows assigned per tile (2 frontend tiles per window:
                # halves the window-overlap re-read and fixed costs)
_WIN = 184      # window rows = 8 top context + band + 48 blob headroom
_TOP = 8        # rows of context above the band (8-aligned DMA starts)
_CAPF = 1024    # accepted-candidate capacity PER FRAME (append-compacted)
_MAX_ROOTS = 8192  # per-window extraction guard (pathological scenes)
_SUB = 48       # member-scan row window per cluster: root row lands in
                # [0, 7] after 8-alignment, so 48 rows cover blobs up to
                # 39 rows tall (observed max 29; taller blobs hit the
                # surfaced drop counter). A 40-row window was measured
                # only ~2 ms faster at b64 — not worth the margin
_SUBW = 256     # member-scan lane window per cluster (>= max blob width)
_SUBF = 24      # FAST member-scan rows: root row lands in [0, 7] after
                # 8-alignment, so 24 rows cover blobs up to 16 rows tall
                # (98-100 % of the bundled scenes); taller blobs defer to
                # a post-drain 48-row re-scan via the tall list
_TALLCAP = 256  # per-window tall-root list capacity (overflow counts as
                # drops — surfaced, not silent; typical occupancy is 0-2)


@functools.lru_cache(maxsize=None)
def _pinv_rank1(hp2: int):
    """Rank-1 (vertical, horizontal) factors of the 5 quadric-fit
    stencils — exact: each pinv row over the product grid is separable
    (singular values beyond the first are ~1e-17)."""
    import numpy as _np

    pinv, _ = _constants(hp2 // 2)
    size = hp2 + 1
    out = []
    for j in range(5):
        m = pinv[j].reshape(size, size).astype(_np.float64)
        u, s, vt = _np.linalg.svd(m)
        assert s[1] < 1e-10 * max(s[0], 1e-30), "pinv stencil not rank-1"
        c = u[:, 0] * _np.sqrt(s[0])
        r = vt[0] * _np.sqrt(s[0])
        # sign-normalize the vertical factor so equal factors share
        k = _np.argmax(_np.abs(c))
        if c[k] < 0:
            c, r = -c, -r
        out.append((c.astype(_np.float64), r.astype(_np.float64)))
    return out


def _window_start(ti, hp, win):
    return pl.multiple_of(jnp.clip(ti * _BAND - _TOP, 0, hp - win), 8)


def _stencil_2d(src, weights, win, wp):
    """acc[r, c] = sum_{dr, dc} weights[dr, dc] * src[r+dr-2, c+dc-2]
    (roll-based; window-edge rows wrap — consumers gate them out)."""
    size = weights.shape[0]
    acc = jnp.zeros_like(src)
    for dr in range(size):
        sh_r = (win - dr + 2) % win
        t = pltpu.roll(src, sh_r, 0) if sh_r else src
        for dc in range(size):
            wgt = float(weights[dr, dc])
            if wgt == 0.0:
                continue
            sh_c = (wp - dc + 2) % wp
            u = pltpu.roll(t, sh_c, 1) if sh_c else t
            acc = acc + wgt * u
    return acc


def _stencil_1d(src, w, axis, win, wp):
    size = len(w)
    dim = win if axis == 0 else wp
    acc = jnp.zeros_like(src)
    for d in range(size):
        sh = (dim - d + 2) % dim
        t = pltpu.roll(src, sh, axis) if sh else src
        wgt = float(w[d])
        if wgt != 0.0:
            acc = acc + wgt * t
    return acc


def _record_planes(blur, win, wp, hp2, move_thr):
    """Dense ROCHADE candidate record (reference src/detector.rs:330-356):
    per-pixel refined offsets (x0, y0), quadric coefficients (c3, c4, c5)
    and the accept-gate bit, from the in-window blur plane. The exact f32
    op sequence of the reference scalar chain (plain divides, sqrt'd
    |c5| < k gate). Window-edge rows carry roll-wraparound garbage —
    every consumer gates on interior rows. Each quadric-fit stencil is
    EXACTLY rank-1, so the 25-tap pass factors into one 5-tap vertical +
    one 5-tap horizontal pass; shared vertical factors are cached."""
    pinv_np, cone_np = _constants(hp2 // 2)
    smooth = _stencil_2d(blur, cone_np, win, wp)
    vcache: dict = {}
    aplane = []
    for j in range(5):
        cvec, rvec = _pinv_rank1(hp2)[j]
        key = tuple(np.round(cvec, 12))
        if key not in vcache:
            vcache[key] = _stencil_1d(smooth, cvec, 0, win, wp)
        aplane.append(_stencil_1d(vcache[key], rvec, 1, win, wp))
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
    return x0, y0, c3p, c4p, c5p, okf


def _blur_from_raw(mats_ref, slab, lscr, *, taps, channels, u16, w,
                   luma_f32=False, win=_WIN):
    """Raw slab (_WIN+16 rows of padded u8/u16, channels in lanes) ->
    blurred window (_WIN, wp) f32 — the same gray conversion + 7-tap
    separable blur as pallas/frontend.py (bit-identical tap order), so
    the f32 blur plane never round-trips HBM. Slab rows [0, _WIN+16)
    hold luma rows [row0-8, row0+_WIN+8); blur rows [3, _WIN+13) are
    valid, and the returned window slice [8, _WIN+8) is fully interior."""
    from .frontend import _roll

    radius = (len(taps) - 1) // 2
    wp = lscr.shape[1] - 256
    if luma_f32:
        # turbo mode: the slab already holds f32 luma (the decimated
        # half plane from front_kernel_decimate) — no conversion
        lf = slab[:]
    elif channels == 3:
        # convert u8->f32 PER COLUMN CHUNK: a whole-slab f32 copy of the
        # interleaved RGB rows is ~9 MB at 4K and blew the scoped VMEM
        # budget (the per-chunk live set is ~300 KB)
        lf_chunks = []
        col = 0
        while col < wp:
            cw = min(128, wp - col)
            mf = mats_ref[0 : 3 * cw, 0:cw]
            xs = (
                slab[:, 3 * col : 3 * (col + cw)]
                .astype(jnp.int32)
                .astype(jnp.float32)
            )
            lf_chunks.append(
                jnp.dot(xs, mf, preferred_element_type=jnp.float32)
            )
            col += cw
        lf = jnp.concatenate(lf_chunks, axis=1)
    elif u16:
        lf = slab[:].astype(jnp.int32).astype(jnp.float32) / 65535.0
    else:
        lf = slab[:].astype(jnp.int32).astype(jnp.float32) / 255.0
    # lane-guarded staging so horizontal rolls never wrap valid data
    # into view; guards replicate the clamped-border columns
    lscr[:, 128 : 128 + wp] = lf
    lscr[:, 0:128] = jnp.repeat(lf[:, 0:1], 128, axis=1)
    lscr[:, 128 + wp : 256 + wp] = jnp.repeat(lf[:, w - 1 : w], 128, axis=1)
    y = lscr[:, :]
    temp = jnp.zeros_like(y)
    for k, kw in enumerate(taps):
        temp = temp + _roll(y, radius - k, 1) * kw
    blur = jnp.zeros_like(y)
    for k, kw in enumerate(taps):
        blur = blur + _roll(temp, radius - k, 0) * kw
    return blur[8 : 8 + win, 128 : 128 + wp]


def _kernel(
    *refs,
    h, w, hp2, move_thr, capf, from_raw=False, taps=None, channels=1,
    u16=False, gh=None, luma_f32=False, prefilter=False, win=_WIN,
):
    # win: sweep-window rows (= _TOP context + _BAND band + blob
    # headroom). The turbo path shrinks it to 160 — half-res blobs are
    # half as tall, and the dense passes (fixpoint, stencils, hessian)
    # scale with window rows.
    # gh: the GLOBAL image height when this kernel processes a
    # row-sharded window of a taller frame (parallel/sharding.py); the
    # local window's global row offset arrives per frame via roff_ref.
    # Border/bounds gates then test global rows while all addressing
    # stays local. gh=None (single-chip) means local == global.
    if from_raw:
        (mats_ref, thr_ref, roff_ref, src_hbm, out_ref, cnt_ref, blur_w,
         lscr, lab_ref, fbuf, rem_ref, rm2_ref, rm3_ref, cur_ref,
         tall_ref, sem) = refs
        rows = win + 16  # raw slab: 8 luma-context rows above + below
        hp = src_hbm.shape[1] - 16
    else:
        (thr_ref, src_hbm, out_ref, cnt_ref, blur_w, lab_ref,
         fbuf, rem_ref, rm2_ref, rm3_ref, cur_ref, tall_ref, sem) = refs
        mats_ref = None
        lscr = None
        roff_ref = None
        rows = win
        hp = src_hbm.shape[1]
    if gh is None:
        gh = h
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    row0 = _window_start(ti, hp, win)

    # double-buffered window DMA: slot parity follows the GLOBAL step
    # (bi*nt + ti) so it stays consistent across batch boundaries when the
    # per-frame tile count is odd. In raw mode the slab holds RAW pixels
    # (u8/u16, channels in lanes) starting at padded row row0 — i.e.
    # luma rows [row0-8, row0+_WIN+8) — instead of the f32 blur plane.
    slot = (bi * nt + ti) % 2

    @pl.when(jnp.logical_and(bi == 0, ti == 0))
    def _():
        pltpu.make_async_copy(
            src_hbm.at[0, pl.ds(row0, rows), :], blur_w.at[0], sem.at[0]
        ).start()

    last_t = ti == nt - 1
    nbi = jnp.where(last_t, bi + 1, bi)
    nti = jnp.where(last_t, 0, ti + 1)
    nrow0 = _window_start(nti, hp, win)

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

    if from_raw:
        blur = _blur_from_raw(
            mats_ref, blur_w[slot], lscr, taps=taps, channels=channels,
            u16=u16, w=w, luma_f32=luma_f32, win=win,
        )
    else:
        blur = blur_w[slot]

    # the output block is revisited by every tile of the frame: clear it
    # and the append cursor once, at the frame's first tile
    @pl.when(ti == 0)
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)
        cur_ref[0] = jnp.int32(0)
        cur_ref[1] = jnp.int32(0)

    roff = jnp.int32(0) if roff_ref is None else roff_ref[bi, 0]
    _compute(
        thr_ref, out_ref, blur, lab_ref, fbuf, rem_ref,
        rm2_ref, rm3_ref, cur_ref, tall_ref,
        bi=bi, ti=ti, row0=row0, h=h, w=w, hp2=hp2, move_thr=move_thr,
        capf=capf, roff=roff, gh=gh, prefilter=prefilter, win=win,
    )

    # per-frame counters: [0] accepted (== capf => possible overflow),
    # [1] clusters dropped because they touched the member-scan window
    # border (the data-dependent blob-size cap — surfaced, not silent)
    @pl.when(ti == nt - 1)
    def _():
        base = jnp.zeros(cnt_ref.shape[1:], jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, cnt_ref.shape[1:], 1)
        base = jnp.where(lane == 0, cur_ref[0].astype(jnp.float32), base)
        base = jnp.where(lane == 1, cur_ref[1].astype(jnp.float32), base)
        cnt_ref[0] = base


def _compute(
    thr_ref, out_ref, blur, lab_ref, fbuf, rem_ref, rm2_ref, rm3_ref,
    cur_ref, tall_ref,
    *, bi, ti, row0, h, w, hp2, move_thr, capf, roff=None, gh=None,
    prefilter=False, win=_WIN,
):
    if roff is None:
        roff = jnp.int32(0)
    if gh is None:
        gh = h
    thr = thr_ref[bi, 0]
    wp = blur.shape[1]

    rloc = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 0)
    cloc = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 1)
    grow = row0 + rloc

    # --- Hessian response in-window (identical math to the frontend
    # kernel, src/image_util.rs:72-109); window edge rows/cols and the
    # reference's zero borders are masked out below
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

    grow_g = grow + roff  # global row (== grow when single-chip)
    valid_px = (
        (rloc > 0) & (rloc < win - 1)            # window interior rows
        & (grow_g > 0) & (grow_g < gh - 1)       # reference zero borders
        & (cloc > 0) & (cloc < w - 1)
    )
    mask = valid_px & (resp < thr)

    # windows with no below-threshold pixel hold no clusters: skip the
    # label fixpoint, the fit stencils and the extraction loop entirely
    # (finer and cheaper than the former XLA tile-min cover pre-pass —
    # the window's response is already in registers here)
    @pl.when(jnp.any(mask))
    def _window_body():
        _compute_clusters(
            mask, grow, rloc, cloc, blur, out_ref, lab_ref, fbuf,
            rem_ref, rm2_ref, rm3_ref, cur_ref, tall_ref,
            ti=ti, row0=row0, h=h, w=w, hp2=hp2, move_thr=move_thr,
            capf=capf, roff=roff, gh=gh, prefilter=prefilter, win=win,
        )


def _compute_clusters(
    mask, grow, rloc, cloc, blur, out_ref, lab_ref, fbuf, rem_ref,
    rm2_ref, rm3_ref, cur_ref, tall_ref,
    *, ti, row0, h, w, hp2, move_thr, capf, roff=None, gh=None,
    prefilter=False, win=_WIN,
):
    if roff is None:
        roff = jnp.int32(0)
    if gh is None:
        gh = h
    wp = blur.shape[1]
    # --- min-index connected-component labels, fixpoint relaxation.
    # Labels pack (row, col) as (row << 16) | col instead of row*w + col:
    # the packing is monotonic in scan order (col < w <= 3840 < 2^16), so
    # every min/sort semantic is identical, and unpacking in the hot
    # extraction loop is a shift/mask instead of scalar div/mod by the
    # non-power-of-2 w (measured: the two emulated divisions cost ~0.2 us
    # of the ~0.75 us per-root loop iteration)
    big = jnp.int32(2**30)
    own = (grow << 16) | cloc
    init = jnp.where(mask, own, big)

    def relax(lab):
        # no boundary guards needed: `mask` excludes window edge rows
        # and cols (and everything >= w-1 incl. padding), so edge labels
        # are ALWAYS `big` and a wrap-around roll can only deliver
        # `big` — it can never corrupt the min. Dropping the four
        # guard compare+selects nearly halves the relax sweep.
        upl = pltpu.roll(lab, win - 1, 0)
        downl = pltpu.roll(lab, 1, 0)
        leftl = pltpu.roll(lab, wp - 1, 1)
        rightl = pltpu.roll(lab, 1, 1)
        m = jnp.minimum(jnp.minimum(upl, downl), jnp.minimum(leftl, rightl))
        return jnp.where(mask, jnp.minimum(lab, m), big)

    def make_records():
        # dense candidate record (reference src/detector.rs:330-356,
        # shared helper `_record_planes`). The SAME f32 expressions the
        # per-root scalar chain used to evaluate, now evaluated once per
        # pixel; each root just reads the record at its rounded centroid,
        # so the decision data is bit-identical to the scalar path's.
        # Window-edge rows get roll-wraparound garbage; every consumer is
        # gated by margin_ok/in_b below, exactly as before.
        x0, y0, c3p, c4p, c5p, okf = _record_planes(
            blur, win, wp, hp2, move_thr
        )
        fbuf[0] = cloc.astype(jnp.float32) + x0
        # y is emitted in GLOBAL rows (== local when single-chip)
        fbuf[1] = (grow + roff).astype(jnp.float32) + y0
        fbuf[2] = c3p
        fbuf[3] = c4p
        fbuf[4] = c5p
        fbuf[5] = okf.astype(jnp.float32)
        return okf

    if prefilter:
        # --- TURBO-ONLY blob pre-filter. A root whose whole blob sits
        # far from any accept-gate pixel can never append (the drain
        # loop's accept reads okf at the rounded centroid, and the
        # centroid of a real saddle blob lies within ~1 px of a member).
        # Seed each masked pixel with the okf plane dilated by 1 px
        # (Chebyshev, separable max passes), OR-propagate it across the
        # component INSIDE the label fixpoint (zero extra sweeps: the
        # loop already runs until the root's eccentricity is covered,
        # and dist(root, nearest seed) <= eccentricity(root)), and drop
        # seedless roots from the drain loop — ~48 % of blobs on the
        # bundled scenes, whose per-root serial scalar chains dominate
        # the kernel. APPROXIMATE (a snaky blob whose centroid rounds
        # >1 px from every member could be lost), so the exact-parity
        # path never takes it; recall on the golden scenes is pinned by
        # tests/test_decimate.py and measured blob-exact by
        # tools/probe_prefilter.py (0 of 1,998 accepted blobs missed).
        okf = make_records()
        oki = jnp.where(okf, 1, 0)
        vmax = oki
        # 1-px dilation: measured keep rates at half res (radius 0/1/2 =
        # 51.6/52.1/57.6 %, all with 0 accepted blobs missed on the
        # golden scenes — tools/probe_prefilter.py); radius 1 keeps a
        # robustness buffer over the bare member∩ok test while cutting
        # ~10 % more drain trips than radius 2
        for sh in (1, win - 1):
            vmax = jnp.maximum(vmax, pltpu.roll(oki, sh, 0))
        okd = vmax
        for sh in (1, wp - 1):
            okd = jnp.maximum(okd, pltpu.roll(vmax, sh, 1))
        okinit = jnp.where(mask, okd, 0)

        def relax2(lab, okp):
            upl = pltpu.roll(lab, win - 1, 0)
            downl = pltpu.roll(lab, 1, 0)
            leftl = pltpu.roll(lab, wp - 1, 1)
            rightl = pltpu.roll(lab, 1, 1)
            m = jnp.minimum(
                jnp.minimum(upl, downl), jnp.minimum(leftl, rightl)
            )
            upo = pltpu.roll(okp, win - 1, 0)
            downo = pltpu.roll(okp, 1, 0)
            lefto = pltpu.roll(okp, wp - 1, 1)
            righto = pltpu.roll(okp, 1, 1)
            mo = jnp.maximum(
                jnp.maximum(upo, downo), jnp.maximum(lefto, righto)
            )
            return (
                jnp.where(mask, jnp.minimum(lab, m), big),
                jnp.where(mask, jnp.maximum(okp, mo), 0),
            )

        def lbody2(state):
            lab, okp, _ = state
            for _ in range(3):
                lab, okp = relax2(lab, okp)
            nxt, okp = relax2(lab, okp)
            return nxt, okp, jnp.any(nxt != lab)

        l0, o0 = relax2(init, okinit)
        labels, okprop, _ = lax.while_loop(
            lambda s: s[2], lbody2, (l0, o0, jnp.bool_(True))
        )
    else:
        def lbody(state):
            lab, _ = state
            for _ in range(3):
                lab = relax(lab)
            nxt = relax(lab)
            return nxt, jnp.any(nxt != lab)

        labels, _ = lax.while_loop(
            lambda s: s[1], lbody, (relax(init), jnp.bool_(True))
        )
        okprop = None

    band_lo = ti * _BAND
    root = mask & (labels == own) & (grow >= band_lo) & (grow < band_lo + _BAND)

    # park labels in a scratch ref so per-cluster member scans can slice
    # a small row window around each root
    lab_ref[:, :] = jnp.where(mask, labels, big)

    if not prefilter:
        make_records()

    iota8r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    nblk = wp // 128

    def pick_record(lr8, cb, onehot):
        # point lookup of the candidate record from ONE aligned
        # (6, 8, 128) dynamic load (dynamic VMEM loads must be
        # 8/128-aligned; the one-hot selects within the block) — one
        # address generation for all six planes. The reductions stay
        # per-plane scalars: Mosaic cannot extract lanes of a (6,)
        # reduced vector (vector.extract layout restriction). Only the
        # gate bit (plane 5) is reduced eagerly; callers reduce the
        # other planes lazily, under the accept branch.
        return fbuf[:, pl.ds(lr8, 8), pl.ds(cb, 128)] * onehot[None, :, :]

    # Root extraction, two-level region drain. The yet-unextracted root
    # labels live in `rem_ref`; rm3 = min label per (8-row, 128-lane)
    # region. The OUTER loop walks regions in ascending-min order over a
    # loop-carried rm3 VALUE (mask one entry + small min tree per
    # region); the INNER loop drains one region's roots over a
    # loop-carried (8, 128) register (compare + one short min tree per
    # root). Measured: per-root pyramid maintenance in VMEM (clear
    # region ref -> row mins -> rm2 -> rm3 -> global min) was ~85% of
    # the old loop's 0.85 us/cluster — the member scan and coefficient
    # picks are latency-hidden behind it. Roots therefore come out in
    # region-major (NOT global scan) order; `saddles_from_candidates`
    # restores the reference's ascending-label enumeration with one
    # cheap XLA sort over the compacted rows.
    # loop-invariant member-scan iotas/masks, hoisted out of the hot loop
    subw = min(_SUBW, wp)  # narrow frames: scan caps at the full width
    subrows = {
        r: jax.lax.broadcasted_iota(jnp.int32, (r, subw), 0)
        for r in (_SUBF, _SUB)
    }
    subcol1 = jax.lax.broadcasted_iota(jnp.int32, (1, subw), 1)
    lane_first = (subcol1 == 0).astype(jnp.int32)
    lane_last = (subcol1 == subw - 1).astype(jnp.int32)

    def process_roots(lbls, ens, rows, collect_tall):
        # Process a small batch of roots with every STEP emitted for all
        # roots before the next step (member scans, then marginals, then
        # picks, ...). The chains share no data, and step-interleaved
        # emission lets the in-order machine overlap their load/reduce
        # latencies — two sequential full-body calls did not. ``ens``
        # masks a slot off (odd remainder): its loads hit clamped
        # addresses and its gates force reject.
        #
        # ``rows``/``collect_tall``: the hot drain path scans a
        # _SUBF(24)-row member window — it covers ~98-100 % of real
        # blobs and the scan's vector issue count is what the loop is
        # bound on. Roots whose blob touches the fast window's last two
        # rows are APPENDED (branchlessly) to a tall list and re-scanned
        # after the drain with the full _SUB(48)-row window
        # (collect_tall=False), where the exact border/drop semantics of
        # the old single-window code apply. Emission order moves those
        # roots to the end — harmless, the downstream label sort
        # restores reference enumeration order.
        n_r = len(lbls)
        rr = range(n_r)
        subrow = subrows[rows]
        # clip to _WIN - rows (NOT a fixed _WIN - _SUB): in the clipped
        # LAST window claimed roots sit at local rows up to _WIN-2, and a
        # fast-path scan pinned at _WIN-_SUB would start more than
        # _SUBF rows ABOVE such a root — zero members, no bottom-row
        # touch, silent drop (bottom ~40 image rows lost; caught by the
        # cropped-TUM_VI sharded parity test). With the per-rows bound
        # the root always lands inside the scan; blobs touching its last
        # 2 rows still defer to the full-_SUB rescan via the tall list.
        lroot = [
            pl.multiple_of(
                (jnp.clip((lbls[i] >> 16) - row0, 0, win - rows) // 8) * 8,
                8,
            )
            for i in rr
        ]
        croot = [lbls[i] & 0xFFFF for i in rr]
        cstart = [
            pl.multiple_of(
                jnp.clip(((croot[i] - 64) // 128) * 128, 0, wp - subw), 128
            )
            for i in rr
        ]
        sub = [
            lab_ref[pl.ds(lroot[i], rows), pl.ds(cstart[i], subw)]
            for i in rr
        ]
        member = [(sub[i] == lbls[i]).astype(jnp.int32) for i in rr]
        # column marginal first (sublane-direction adds are cheap); the
        # count, x-sum and lateral border contacts then reduce over a
        # single (1, _SUBW) row instead of the full window — only the
        # y-sum still needs a full-window multiply-reduce
        colsum = [jnp.sum(member[i], axis=0, keepdims=True) for i in rr]
        cnt_i = [jnp.sum(colsum[i]) for i in rr]
        scol = [jnp.sum(colsum[i] * subcol1) for i in rr]
        srow = [jnp.sum(member[i] * subrow) for i in rr]
        # blob touches the last-2-row slice => it may continue below the
        # scanned window
        bot = [jnp.sum(member[i][rows - 2 :, :]) > 0 for i in rr]
        if collect_tall:
            # fast path: a bottom touch means "rescan with the full
            # window later", never a drop verdict
            tall = [bot[i] & ens[i] for i in rr]
            for i in rr:
                tc = cur_ref[2]
                tall_ref[jnp.minimum(tc, _TALLCAP - 1)] = lbls[i]
                cur_ref[2] = tc + tall[i].astype(jnp.int32)
            drop_bot = [jnp.bool_(False) for _ in rr]
        else:
            tall = [jnp.bool_(False) for _ in rr]
            # full window: bottom contact is the real blob-size cap
            # (counted drop), unless the window bottom IS the image edge
            drop_bot = [
                bot[i] & (row0 + lroot[i] + _SUB - 1 + roff < gh - 1)
                for i in rr
            ]
        # lateral border contact => drop (counted), as before
        lft = [jnp.sum(colsum[i] * lane_first) > 0 for i in rr]
        rgt = [jnp.sum(colsum[i] * lane_last) > 0 for i in rr]
        bad = [
            drop_bot[i]
            | (lft[i] & (cstart[i] > 0))
            | (rgt[i] & (cstart[i] + subw < w))
            for i in rr
        ]
        cnt = [cnt_i[i].astype(jnp.float32) for i in rr]
        cx = [
            scol[i].astype(jnp.float32) / cnt[i]
            + cstart[i].astype(jnp.float32)
            for i in rr
        ]
        cy = [
            srow[i].astype(jnp.float32) / cnt[i]
            + (row0 + lroot[i]).astype(jnp.float32)
            for i in rr
        ]

        # reference rust_round (coords are non-negative here)
        rx = [jnp.floor(cx[i] + 0.5).astype(jnp.int32) for i in rr]
        ry = [jnp.floor(cy[i] + 0.5).astype(jnp.int32) for i in rr]
        in_b = [
            (ry[i] + roff - hp2 >= 0)
            & (ry[i] + roff + hp2 < gh)
            & (rx[i] - hp2 >= 0)
            & (rx[i] + hp2 < w)
            for i in rr
        ]
        lr = [jnp.clip(ry[i] - row0, 0, win - 1) for i in rr]
        # ROCHADE support must stay inside the valid stencil interior
        margin_ok = [(lr[i] >= 4) & (lr[i] <= win - 5) for i in rr]
        rxc = [jnp.clip(rx[i], 0, wp - 1) for i in rr]
        cb = [pl.multiple_of((rxc[i] // 128) * 128, 128) for i in rr]
        lr8 = [
            pl.multiple_of(jnp.clip((lr[i] // 8) * 8, 0, win - 8), 8)
            for i in rr
        ]
        onehot = [
            (
                (iota8r == lr[i] - lr8[i]) & (iota128 == rxc[i] - cb[i])
            ).astype(jnp.float32)
            for i in rr
        ]

        # read the precomputed record at the rounded centroid: one
        # aligned (6, 8, 128) load per root and 6 scalar reductions.
        # The old scalar subpixel-solve/gate chain (~25 dependent scalar
        # ops per root) is gone — its results are in the planes, and the
        # decision data is bit-identical. NOTE: a variant that branched
        # the row build + append under pl.when(acc) was measured 14 %
        # SLOWER at b64 (per-root scalar branches flush the in-order
        # pipeline); branchless it stays.
        v = [pick_record(lr8[i], cb[i], onehot[i]) for i in rr]
        okp = [jnp.sum(v[i][5]) for i in rr]
        # tall roots contribute NOTHING from the fast pass (their sums
        # cover a truncated window); the tall re-scan both emits and
        # counts them
        acc = [
            ens[i]
            & in_b[i]
            & ~bad[i]
            & ~tall[i]
            & margin_ok[i]
            & (okp[i] > 0.5)
            for i in rr
        ]
        scan_lbl = [(lbls[i] >> 16) * w + (lbls[i] & 0xFFFF) for i in rr]
        # angles (theta/phi via atan2/acos) are NOT computed here: the
        # few-thousand compacted rows get them in one cheap XLA pass
        # (saddles_from_candidates) instead of per loop iteration
        vals = [
            jnp.concatenate(
                [
                    jnp.sum(v[i][0]).reshape(1, 1),  # x = rx + x0
                    jnp.sum(v[i][1]).reshape(1, 1),  # y = ry + y0
                    jnp.float32(0.0).reshape(1, 1),  # k derived downstream
                    jnp.sum(v[i][2]).reshape(1, 1),  # c3
                    jnp.sum(v[i][3]).reshape(1, 1),  # c4
                    jnp.sum(v[i][4]).reshape(1, 1),  # c5
                    jnp.where(acc[i], 1.0, 0.0).reshape(1, 1),
                    # stored label = scan-order linear index (row*w+col):
                    # exact in f32 up to 2^24 (4K is ~8.3M), unlike the
                    # packed (row<<16)|col form (~141M)
                    (scan_lbl[i].astype(jnp.float32) + 1.0).reshape(1, 1),
                ],
                axis=1,
            )
            for i in rr
        ]
        # append accepted candidates only — branchless: a rejected
        # candidate lands at the stationary cursor with ok=0 and is
        # overwritten by the next accepted one (anything left past the
        # final count is filtered by its ok column downstream)
        for i in rr:
            cur = cur_ref[0]
            app = acc[i] & (cur < capf)
            out_ref[0, pl.ds(jnp.minimum(cur, capf - 1), 1), :] = vals[i]
            cur_ref[0] = cur + app.astype(jnp.int32)
            cur_ref[1] = (
                cur_ref[1]
                + (bad[i] & ~tall[i] & ens[i]).astype(jnp.int32)
            )

    def drain_region(state):
        nproc, rm3v, m = state
        # region of the current global-min root label. Regions are
        # (16, 128): measured P-series probes attribute ~30% of the
        # kernel to the drain OUTER loop (one iteration per occupied
        # region), so taller regions halve its trip count for two extra
        # tiles of inner where/min work — net win on board scenes
        lr_m = jnp.clip((m >> 16) - row0, 0, win - 1)
        g16 = pl.multiple_of(jnp.clip((lr_m // 16) * 16, 0, win - 16), 8)
        c128 = pl.multiple_of(
            jnp.clip(((m & 0xFFFF) // 128) * 128, 0, wp - 128), 128
        )
        reg0 = rem_ref[pl.ds(g16, 16), pl.ds(c128, 128)]
        # _WIN is not a 16-multiple, so the LAST pyramid group ([176,
        # 184)) loads a region clipped to start at 168 — spanning rows of
        # group 10 too. Draining those here would leave their rm3 entry
        # live and re-drain them on a later visit (exact duplicate
        # emission; seen on clipped-last-window deep roots). Mask the
        # load to the min-root's own 16-row group.
        rloc16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) + g16
        reg0 = jnp.where((rloc16 // 16) == (lr_m // 16), reg0, big)

        def ibody(istate):
            # two roots per iteration, branchless: their scan/fit chains
            # share no data, so the in-order machine overlaps their
            # load/reduce latencies; the second slot is masked off when
            # the region has an odd remainder
            iproc, reg, lbl = istate
            reg2 = jnp.where(reg == lbl, big, reg)
            lbl2 = jnp.min(reg2)
            en2 = lbl2 < big
            # two slots measured best: 4 wastes too many masked slots on
            # small regions (162 vs 155 ms at b64)
            process_roots(
                [lbl, lbl2], [jnp.bool_(True), en2],
                rows=_SUBF, collect_tall=True,
            )
            reg3 = jnp.where(reg2 == lbl2, big, reg2)
            return (
                iproc + 1 + en2.astype(jnp.int32),
                reg3,
                jnp.min(reg3),
            )

        nproc, _, _ = lax.while_loop(
            lambda st: (st[0] < _MAX_ROOTS) & (st[2] < big),
            ibody,
            (nproc, reg0, m),
        )
        # the region is fully drained and never revisited: mask its rm3
        # entry (m is unique — labels are distinct linear indices)
        rm3v = jnp.where(rm3v == m, big, rm3v)
        return nproc, rm3v, jnp.min(rm3v)

    if prefilter:
        # seedless blobs never enter the drain loop (turbo pre-filter)
        rem0 = jnp.where(root & (okprop > 0), own, big)
    else:
        rem0 = jnp.where(root, own, big)
    rem_ref[:, :] = rem0
    for b in range(nblk):
        rm2_ref[:, b : b + 1] = jnp.min(
            rem0[:, 128 * b : 128 * (b + 1)], axis=1, keepdims=True
        )
    rm2v = rm2_ref[:, :]
    for g in range((win + 15) // 16):
        rm3_ref[g : g + 1, :] = jnp.min(
            rm2v[16 * g : min(16 * (g + 1), win), :], axis=0,
            keepdims=True,
        )
    cur_ref[2] = jnp.int32(0)  # tall list is per window
    rm3v0 = rm3_ref[:, :]
    lax.while_loop(
        lambda st: (st[0] < _MAX_ROOTS) & (st[2] < big),
        drain_region,
        (jnp.int32(0), rm3v0, jnp.min(rm3v0)),
    )

    # second drain over the (rare) tall roots with the full 48-row
    # member window; list overflow beyond _TALLCAP is surfaced on the
    # drop counter (never silent)
    n_tall = cur_ref[2]

    def tall_body(i, carry):
        process_roots(
            [tall_ref[i]], [jnp.bool_(True)], rows=_SUB, collect_tall=False
        )
        return carry

    lax.fori_loop(0, jnp.minimum(n_tall, _TALLCAP), tall_body, jnp.int32(0))
    cur_ref[1] = cur_ref[1] + jnp.maximum(n_tall - _TALLCAP, 0)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "hp2", "move_thr", "interpret"),
)
def cluster_rochade(
    blur: jnp.ndarray,   # (B, Hp, Wp) f32, padded
    thr: jnp.ndarray,    # (B,) f32
    h: int,              # true image height
    w: int,              # true image width
    hp2: int = 4,
    move_thr: float = 1.0,
    interpret: bool = False,
    capf: int = _CAPF,
):
    """Accepted candidate saddles, append-compacted per frame in
    region-drain order (each row carries its cluster label; sort by
    label downstream for the reference's scan-order enumeration —
    `saddles_from_candidates` does). Windows with no below-threshold
    response pixel skip everything past the in-register Hessian
    (self-skipping — no precomputed cover needed).

    Returns (fields (B, capf, 8) f32: [x, y, k, c3, c4, c5, ok, label+1],
    counters (B, 2) f32: [#appended (== capf signals possible overflow),
    #clusters dropped at the member-scan window border — the
    data-dependent blob-size cap, surfaced instead of silent]).
    """
    b, hp, wp = blur.shape
    assert hp >= _WIN and hp % 8 == 0, "padded height must be 8-aligned >= 88"
    assert wp % 128 == 0
    # label packing/sort-key domain limits (advisor finding, round 2):
    # packed labels store col in 16 bits, and the scan-order sort key
    # row*w+col must stay exact in f32 (< 2^24) for the reference's
    # enumeration order to survive the downstream argsort
    assert w < 2**16, f"width {w} overflows the packed (row<<16|col) label"
    assert h * w < 2**24, (
        f"{h}x{w} scan-order indices exceed f32's exact-integer range; "
        "the restored cluster enumeration order would be corrupted"
    )
    tiles = -(-h // _BAND)
    nblk = wp // 128

    fields, counts = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=w, hp2=hp2, move_thr=move_thr, capf=capf,
        ),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, capf, 8), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, capf, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _WIN, wp), jnp.float32),
            pltpu.VMEM((_WIN, wp), jnp.int32),
            pltpu.VMEM((6, _WIN, wp), jnp.float32),
            pltpu.VMEM((_WIN, wp), jnp.int32),
            pltpu.VMEM((_WIN, nblk), jnp.int32),
            pltpu.VMEM(((_WIN + 15) // 16, nblk), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SMEM((_TALLCAP,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # 4K frames (wp = 3840) double every scratch plane; the
            # scoped budget peaks at ~80 MB there (v5e VMEM is 128 MB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(thr.reshape(b, 1), blur)
    return fields, counts[:, 0, 0:2]


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "channels", "u16", "sigma", "hp2", "move_thr",
        "interpret", "capf", "global_h", "luma_f32", "prefilter", "win",
    ),
)
def cluster_rochade_raw(
    raw_p: jnp.ndarray,  # pad_raw() output: (B, Hp+16, Wp*C) u8/u16
    thr: jnp.ndarray,    # (B,) f32
    h: int,
    w: int,
    channels: int = 1,
    u16: bool = False,
    sigma: float = 1.5,
    hp2: int = 4,
    move_thr: float = 1.0,
    interpret: bool = False,
    capf: int = _CAPF,
    row_off: jnp.ndarray | None = None,  # (B,) int32 global row offsets
    global_h: int | None = None,
    luma_f32: bool = False,  # input is already f32 luma (turbo half plane)
    prefilter: bool = False,  # turbo-only blob pre-filter (approximate):
                              # skip blobs with no accept-gate pixel
                              # within 2 px of any member
    win: int = _WIN,  # sweep-window rows; the turbo path uses 160 (24-row
                      # blob headroom — half-res blobs are half as tall)
):
    """`cluster_rochade` fed RAW frames: gray conversion and the 7-tap
    separable blur are recomputed per window from the (cheap, u8/u16)
    padded raw input — bit-identical math to pallas/frontend.py — so the
    f32 blur plane never exists in HBM. Pair with
    ``front_kernel(..., emit_blur=False)`` which supplies luma8 +
    tile-min from the same padded raw array. Returns exactly what
    `cluster_rochade` returns.

    ``row_off``/``global_h``: when the input is a row-sharded WINDOW of
    a ``global_h``-tall frame (parallel/sharding.py), border and bounds
    gates test global rows (local + row_off) and the emitted y
    coordinates are global; addressing stays local."""
    from ..ops.frontend import gaussian_kernel
    from .frontend import _deinterleave_chunk

    b = raw_p.shape[0]
    hp = raw_p.shape[1] - 16
    wp = raw_p.shape[2] // channels
    taps = tuple(float(v) for v in gaussian_kernel(sigma))
    assert len(taps) == 7, "kernel tuned for sigma<=1.5 (radius 3)"
    assert hp >= win and hp % 8 == 0
    assert win % 8 == 0 and win >= _BAND + _TOP + _SUBF, (
        "window must be 8-aligned and cover band + top context + the "
        "fast member-scan rows"
    )
    assert wp % 128 == 0
    assert w < 2**16, f"width {w} overflows the packed (row<<16|col) label"
    assert h * w < 2**24, (
        f"{h}x{w} scan-order indices exceed f32's exact-integer range"
    )
    tiles = -(-h // _BAND)
    nblk = wp // 128
    mf, _ = _deinterleave_chunk(128)
    mats = jnp.asarray(mf)  # (384, 128); gray-luma weights only
    if row_off is None:
        row_off = jnp.zeros((b,), jnp.int32)

    fields, counts = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=w, hp2=hp2, move_thr=move_thr, capf=capf,
            from_raw=True, taps=taps, channels=channels, u16=u16,
            gh=global_h, luma_f32=luma_f32, prefilter=prefilter, win=win,
        ),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, capf, 8), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, capf, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win + 16, wp * channels), raw_p.dtype),
            pltpu.VMEM((win + 16, wp + 256), jnp.float32),
            pltpu.VMEM((win, wp), jnp.int32),
            pltpu.VMEM((6, win, wp), jnp.float32),
            pltpu.VMEM((win, wp), jnp.int32),
            pltpu.VMEM((win, nblk), jnp.int32),
            pltpu.VMEM(((win + 15) // 16, nblk), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SMEM((_TALLCAP,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # 4K RGB frames (wp = 3840, 3 channels) peak near the cap:
            # raw slabs 4.6 MB + lscr 3.3 MB + fbuf 17 MB + label/rem
            # planes 11.3 MB + blur intermediates (v5e VMEM is 128 MB)
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mats, thr.reshape(b, 1), row_off.astype(jnp.int32).reshape(b, 1), raw_p)
    return fields, counts[:, 0, 0:2]


def saddles_from_candidates(fields: jnp.ndarray) -> Saddles:
    """Per-frame candidate array -> Saddles SoA (pre k/phi gates).

    The kernel appends per tile in region-major drain order, NOT global
    label order; one sort over the compacted rows by (stored label, with
    invalid rows keyed to +inf) restores the reference's scan-order
    cluster enumeration (src/detector.rs:171-187) exactly — labels are
    ascending linear pixel indices and each tile owns a disjoint,
    ascending row band, so ascending label == scan order. The kernel
    stores the raw quadric coefficients (c3, c4, c5); the angles
    (reference src/detector.rs:344-353) are derived here, once per
    compacted row.
    """
    valid = (fields[:, 7] > 0.5) & (fields[:, 6] > 0.5)
    key = jnp.where(valid, fields[:, 7], jnp.inf)
    order = jnp.argsort(key)
    fields = fields[order]
    valid = valid[order]
    c3, c4, c5 = fields[:, 3], fields[:, 4], fields[:, 5]
    # k = sqrt(c4^2 + c3^2) (src/detector.rs:344) — hoisted out of the
    # kernel's per-root loop; same f32 expression, bit-identical
    k = jnp.sqrt(c4 * c4 + c3 * c3)
    safe_k = jnp.where(k == 0, 1.0, k)
    theta = jnp.degrees(jnp.arctan2(c3, c4) / 2.0)
    phi = jnp.degrees(jnp.arccos(jnp.clip(-c5 / safe_k, -1.0, 1.0)) / 2.0)
    return Saddles(
        p=fields[:, 0:2],
        k=k,
        theta=theta,
        phi=phi,
        valid=valid,
    )

"""Fused Pallas front-end kernel: Gaussian blur + Hessian response.

One kernel per row-tile computes both whole-image hot loops of the
reference (gaussian_blur_f32 src/image_util.rs:110-206 and
hessian_response src/image_util.rs:72-109) in VMEM: the caller pre-pads
the luma plane with 4 edge-replicated rows/columns (handling the
reference's clamped-border semantics), each grid step reads an
overlapping (TILE_H + 8) row slab from HBM via async DMA, and the 7-tap
separable blur plus the 3x3 Hessian stencil run as lane/sublane rolls —
a single fused pass instead of ~25 XLA ops.

Numerics match ops/frontend.py exactly (same tap order, f32).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.frontend import gaussian_kernel

_HALO = 4  # blur radius 3 + 1 hessian row


def _roll(x, shift, axis):
    """pltpu.roll with negative shifts normalized (it requires >= 0)."""
    if shift == 0:
        return x
    return pltpu.roll(x, shift % x.shape[axis], axis)


@functools.lru_cache(maxsize=None)
def _deinterleave_chunk(chunk_w: int) -> tuple[np.ndarray, np.ndarray]:
    """(3*chunk_w, chunk_w) periodic deinterleave+luma matrices — the
    same constant serves every column chunk (MXU matmul; integer sums
    < 2^24 so both luma paths are exact in f32)."""
    mf = np.zeros((3 * chunk_w, chunk_w), np.float32)
    mi = np.zeros((3 * chunk_w, chunk_w), np.float32)
    coef_f = (0.2126 / 255.0, 0.7152 / 255.0, 0.0722 / 255.0)
    coef_i = (2126.0, 7152.0, 722.0)
    for j in range(chunk_w):
        for c in range(3):
            mf[3 * j + c, j] = coef_f[c]
            mi[3 * j + c, j] = coef_i[c]
    return mf, mi


def _gray_kernel(mats_ref, raw_hbm, lumaf_ref, luma8_ref, slab, sem, *, tile_h, w, w_pad, channels, u16):
    """Raw image tile -> (luma_f32, luma_u8) — image-crate semantics
    (reference to_luma32f/to_luma8 usage, src/detector.rs:409,507).

    RGB rows arrive channel-interleaved; deinterleaving + both luma
    weightings happen as chunked matmuls against a periodic constant.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        raw_hbm.at[bi, pl.ds(i * tile_h, tile_h), :], slab, sem
    )
    cp.start()
    cp.wait()
    # Mosaic lacks a direct u8->f32 cast; hop through int32
    x = slab[:].astype(jnp.int32).astype(jnp.float32)
    if channels == 3:
        lf, l8 = _rgb_luma_chunks(x, mats_ref, w)
    elif u16:
        lf = x / 65535.0
        l8 = jnp.floor((x * 255.0 + 32767.0) / 65535.0)
    else:
        lf = x / 255.0
        l8 = x
    pad = w_pad - w
    if pad:
        # edge-replicate luma_f so downstream clamped blur taps match;
        # luma8 padding is never sampled (decode gates on the true size)
        lf = jnp.concatenate([lf, jnp.repeat(lf[:, -1:], pad, 1)], axis=1)
        l8 = jnp.concatenate([l8, jnp.zeros((l8.shape[0], pad), l8.dtype)], axis=1)
    lumaf_ref[0] = lf
    luma8_ref[0] = l8.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gray_kernel(img: jnp.ndarray, interpret: bool = False):
    """(B, H, W[, 3]) u8/u16 raw frames -> (luma_f (B, Hp, Wp) f32,
    luma_u8 (B, Hp, Wp) u8), edge-padded to 64-row/128-lane multiples."""
    b, h, w = img.shape[:3]
    channels = img.shape[3] if img.ndim == 4 else 1
    u16 = img.dtype == jnp.uint16
    tile_h = 64
    h_pad = -(-h // tile_h) * tile_h
    w_pad = -(-w // 128) * 128
    if h_pad != h or w_pad != w:
        # pad the cheap raw plane (u8/u16) so every DMA is 128-aligned;
        # edge mode keeps the clamped-border blur semantics downstream
        pad_spec = ((0, 0), (0, h_pad - h), (0, w_pad - w)) + ((0, 0),) * (
            img.ndim - 3
        )
        img = jnp.pad(img, pad_spec, mode="edge")
    if img.ndim == 4:
        img = img.reshape(b, h_pad, w_pad * channels)  # free: row-major

    mf, mi = _deinterleave_chunk(128)
    mats = jnp.asarray(np.concatenate([mf, mi], axis=1))  # (384, 256)

    grid = (b, h_pad // tile_h)
    lumaf, luma8 = pl.pallas_call(
        functools.partial(
            _gray_kernel, tile_h=tile_h, w=w_pad, w_pad=w_pad,
            channels=channels, u16=u16,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, w_pad), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, w_pad), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.uint8),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h, w_pad * channels), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mats, img)
    return lumaf, luma8


def _rgb_luma_chunks(x, mats_ref, w_pad):
    """RGB gray conversion shared by both front kernels: interleaved raw
    lanes -> (f32 luma, UNSCALED integer luma) via the side-by-side
    selection matrices. Full 128-col chunks issue ONE (3cw, 256) matmul
    and split the output columns — per-column results are bit-identical
    to two separate dots, at half the MXU dispatch count. Both kernels
    MUST share this path: the turbo half plane's bit-parity with the
    exact pipeline rests on identical luma."""
    lf_chunks = []
    l8_chunks = []
    col = 0
    while col < w_pad:
        cw = min(128, w_pad - col)
        xs = x[:, 3 * col : 3 * (col + cw)]
        if cw == 128:
            both = jnp.dot(
                xs, mats_ref[:, :], preferred_element_type=jnp.float32
            )
            lf_chunks.append(both[:, 0:128])
            l8_chunks.append(both[:, 128:256])
        else:
            mf = mats_ref[0 : 3 * cw, 0:cw]
            mi = mats_ref[0 : 3 * cw, 128 : 128 + cw]
            lf_chunks.append(
                jnp.dot(xs, mf, preferred_element_type=jnp.float32)
            )
            l8_chunks.append(
                jnp.dot(xs, mi, preferred_element_type=jnp.float32)
            )
        col += cw
    lf = jnp.concatenate(lf_chunks, axis=1)
    l8 = jnp.floor(jnp.concatenate(l8_chunks, axis=1) / 10000.0)
    return lf, l8


def _front_kernel(
    mats_ref, raw_hbm, *rest,
    taps, tile_h, w, w_pad, h, channels, u16, emit_blur=True, gh=None,
):
    """Fused raw->(blur, luma8, tile_min) kernel: gray conversion, 7-tap
    separable blur and the Hessian-response tile minimum in ONE pass over
    the raw frames — the f32 luma plane never exists in HBM (saves a full
    plane write + read vs the split gray_kernel/fused_frontend pair).

    The raw input arrives padded with 8 edge-replicated rows on top and
    >= 8 below (plus lane alignment), so every tile's DMA window
    [i*tile_h, i*tile_h + tile_h + 16) is in range and the clamped-border
    blur semantics (reference src/image_util.rs:144-183) fall out of the
    padding. Double-buffered DMA hides the raw fetch under compute.
    """
    has_roff = gh is not None
    if emit_blur:
        if has_roff:
            roff_ref, blur_ref, luma8_ref, min_ref, slab, lscr, sem = rest
        else:
            blur_ref, luma8_ref, min_ref, slab, lscr, sem = rest
            roff_ref = None
    else:
        # folded mode: the cluster kernel recomputes gray+blur in-window
        # straight from the raw frames, so the f32 blur plane never
        # exists in HBM at all (saves a full-plane write + read)
        if has_roff:
            roff_ref, luma8_ref, min_ref, slab, lscr, sem = rest
        else:
            luma8_ref, min_ref, slab, lscr, sem = rest
            roff_ref = None
        blur_ref = None
    if gh is None:
        gh = h
    bi = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    rows = tile_h + 16
    radius = (len(taps) - 1) // 2

    slot = (bi * nt + i) % 2

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        pltpu.make_async_copy(
            raw_hbm.at[0, pl.ds(0, rows), :], slab.at[0], sem.at[0]
        ).start()

    last_t = i == nt - 1
    nbi = jnp.where(last_t, bi + 1, bi)
    nti = jnp.where(last_t, 0, i + 1)

    @pl.when(nbi < nb)
    def _():
        pltpu.make_async_copy(
            raw_hbm.at[nbi, pl.ds(nti * tile_h, rows), :],
            slab.at[1 - slot],
            sem.at[1 - slot],
        ).start()

    pltpu.make_async_copy(
        raw_hbm.at[bi, pl.ds(i * tile_h, rows), :], slab.at[slot], sem.at[slot]
    ).wait()

    x = slab[slot].astype(jnp.int32).astype(jnp.float32)
    if channels == 3:
        lf, l8 = _rgb_luma_chunks(x, mats_ref, w_pad)
    elif u16:
        lf = x / 65535.0
        l8 = jnp.floor((x * 255.0 + 32767.0) / 65535.0)
    else:
        lf = x / 255.0
        l8 = x

    # stage luma in a lane-guarded scratch so the horizontal rolls next
    # never wrap valid data into view; guards replicate the edge columns
    # (clamped-border semantics; right guard also covers w..w_pad pad)
    lscr[:, 128 : 128 + w_pad] = lf
    lscr[:, 0:128] = jnp.repeat(lf[:, 0:1], 128, axis=1)
    lscr[:, 128 + w_pad : 256 + w_pad] = jnp.repeat(
        lf[:, w - 1 : w], 128, axis=1
    )

    y = lscr[:, :]
    temp = jnp.zeros_like(y)
    for k, kw in enumerate(taps):
        temp = temp + _roll(y, radius - k, 1) * kw
    blur = jnp.zeros_like(y)
    for k, kw in enumerate(taps):
        blur = blur + _roll(temp, radius - k, 0) * kw

    left = _roll(blur, 1, 1)
    right = _roll(blur, -1, 1)
    up = _roll(blur, 1, 0)
    down = _roll(blur, -1, 0)
    ul = _roll(up, 1, 1)
    ur = _roll(up, -1, 1)
    dl = _roll(down, 1, 1)
    dr = _roll(down, -1, 1)
    lxx = left - 2.0 * blur + right
    lyy = up - 2.0 * blur + down
    lxy = (ur - ul + dl - dr) * 0.25
    resp = lxx * lyy - lxy * lxy

    lrow = i * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 0)
    grow = lrow if roff_ref is None else lrow + roff_ref[bi, 0]
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 1)
    # zero the reference's untouched GLOBAL borders; in sharded windows
    # also zero everything below the local window (rows there may blur
    # into edge-replicated padding that the full frame would not have)
    # and ABOVE the global frame (shard 0's clamp-replicated context)
    border = (
        (grow <= 0) | (grow >= gh - 1) | (lrow >= h)
        | (gcol == 0) | (gcol >= w - 1)
    )
    center = (slice(8, 8 + tile_h), slice(128, 128 + w_pad))
    if blur_ref is not None:
        blur_ref[0, :, :] = blur[center]
    if channels == 1 and not u16:
        # u8 gray input: luma8 IS the raw plane (l8 = x is the identity
        # round trip) — copy the slab rows, skip two full-tile casts
        luma8_ref[0, :, :] = slab[slot][8 : 8 + tile_h, :]
    else:
        luma8_ref[0, :, :] = l8[8 : 8 + tile_h, :].astype(jnp.int32).astype(
            jnp.uint8
        )
    resp_center = jnp.where(border, 0.0, resp[center])
    min_ref[0, 0] = jnp.full((8, 128), jnp.min(resp_center), jnp.float32)


def pad_raw(img: jnp.ndarray, tile_h: int = 64):
    """Edge-pad raw frames for the fused kernels: 8 rows above, row/lane
    alignment below/right, channels flattened into lanes. Returns
    (padded (B, Hp+16, Wp*C), h, w, channels, u16) — the SAME padded
    array feeds both front_kernel and cluster_rochade_raw, so the pad is
    materialized once. ``tile_h=128`` rounds Hp to 128-row tiles for the
    double-height turbo front-end (extra rows are edge replicas the
    kernels mask; the cluster/refine consumers only need Hp >= their own
    window arithmetic, which a larger pad always satisfies)."""
    if img.ndim == 4 and img.shape[3] == 4 and img.dtype == jnp.uint8:
        img = img[..., :3]  # alpha is ignored (ops/gray.py semantics)
    b, hgt, wid = img.shape[:3]
    channels = img.shape[3] if img.ndim == 4 else 1
    u16 = bool(img.dtype == jnp.uint16)
    # the in-kernel gray conversion handles exactly three raw modes;
    # anything else (LA, RGB16, f32 — the wider DynamicImage contract)
    # must be folded first by pipeline.normalize_raw_batch, which the
    # detector facade does. Direct kernel callers get a hard error
    # instead of silently wrong luma.
    if channels not in (1, 3) or (u16 and channels != 1) or (
        img.dtype not in (jnp.uint8, jnp.uint16)
    ):
        raise TypeError(
            f"pad_raw: unsupported raw mode (channels={channels}, "
            f"dtype={img.dtype}); fold exotic DynamicImage modes with "
            "pipeline.normalize_raw_batch first"
        )
    h_pad = -(-hgt // tile_h) * tile_h
    w_pad = -(-wid // 128) * 128
    # 8 edge rows above and >= 8 below so every DMA window is in range
    # and vertical clamping falls out of the padding
    pad_spec = ((0, 0), (8, 8 + h_pad - hgt), (0, w_pad - wid)) + (
        (0, 0),
    ) * (img.ndim - 3)
    img = jnp.pad(img, pad_spec, mode="edge")
    if img.ndim == 4:
        img = img.reshape(b, h_pad + 16, w_pad * channels)
    return img, hgt, wid, channels, u16


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "interpret", "emit_blur", "pre_padded", "true_shape",
        "channels", "u16", "global_h", "tile_h",
    ),
)
def front_kernel(
    img: jnp.ndarray,
    sigma: float = 1.5,
    interpret: bool = False,
    emit_blur: bool = True,
    pre_padded: bool = False,
    true_shape: tuple[int, int] | None = None,
    channels: int | None = None,
    u16: bool | None = None,
    row_off: jnp.ndarray | None = None,  # (B,) int32 global row offsets
    global_h: int | None = None,
    tile_h: int = 64,
):
    """(B, H, W[, 3]) u8/u16 raw frames -> (blur_p (B, Hp, Wp) f32,
    luma_u8 (B, Hp, Wp) u8, tile_min (B, Hp/tile_h, 8, 128) f32), fully
    fused; outputs are edge-padded to 64-row / 128-lane multiples
    (response zero in padding) for the cluster kernel.

    ``emit_blur=False`` drops the blur plane from the outputs (returns
    (luma8, tile_min)) — used when the cluster kernel reads the raw
    frames itself. ``pre_padded=True`` takes a pad_raw() output plus
    true_shape/channels/u16 instead of raw frames. ``row_off``/
    ``global_h``: border zeroing for row-sharded windows of a taller
    frame (see parallel/sharding.py) tests GLOBAL rows. ``tile_h`` (64
    or 128) is the rows per grid step — 128 halves the per-step fixed
    costs (DMA setup, gray matmul chunk loops) at ~2x slab VMEM;
    ``pre_padded`` inputs must come from ``pad_raw(img, tile_h)``."""
    if pre_padded:
        hgt, wid = true_shape
    else:
        img, hgt, wid, channels, u16 = pad_raw(img, tile_h=tile_h)
    b = img.shape[0]
    taps = tuple(float(v) for v in gaussian_kernel(sigma))
    assert len(taps) == 7, "kernel tuned for sigma<=1.5 (radius 3)"
    assert tile_h in (64, 128)
    h_pad = img.shape[1] - 16
    assert h_pad % tile_h == 0, (h_pad, tile_h)
    w_pad = img.shape[2] // channels

    mf, mi = _deinterleave_chunk(128)
    mats = jnp.asarray(np.concatenate([mf, mi], axis=1))

    plane_spec = pl.BlockSpec(
        (1, tile_h, w_pad), lambda bi, i: (bi, i, 0),
        memory_space=pltpu.VMEM,
    )
    min_spec = pl.BlockSpec(
        (1, 1, 8, 128), lambda bi, i: (bi, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane_shape = jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32)
    luma8_shape = jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.uint8)
    min_shape = jax.ShapeDtypeStruct(
        (b, h_pad // tile_h, 8, 128), jnp.float32
    )
    if emit_blur:
        out_specs = (plane_spec, plane_spec, min_spec)
        out_shape = (plane_shape, luma8_shape, min_shape)
    else:
        out_specs = (plane_spec, min_spec)
        out_shape = (luma8_shape, min_shape)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [mats, img]
    assert row_off is None or global_h is not None, (
        "row_off without global_h would be silently ignored"
    )
    if global_h is not None:
        if row_off is None:
            row_off = jnp.zeros((b,), jnp.int32)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(row_off.astype(jnp.int32).reshape(b, 1))

    grid = (b, h_pad // tile_h)
    outs = pl.pallas_call(
        functools.partial(
            _front_kernel, taps=taps, tile_h=tile_h, w=wid, w_pad=w_pad,
            h=hgt, channels=channels, u16=u16, emit_blur=emit_blur,
            gh=global_h,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 16, w_pad * channels), img.dtype),
            pltpu.VMEM((tile_h + 16, w_pad + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
    return outs


@functools.lru_cache(maxsize=None)
def _decimate_mats(hh: int = 40) -> tuple[np.ndarray, np.ndarray]:
    """Selection matrices for the turbo front-end's 2x2-mean decimation:
    ``S`` (256, 128) compacts even lanes of a pair-summed row chunk
    (S[2j, j] = 1), ``R`` (hh, 2*hh) compacts even sublanes
    (R[t, 2t] = 1; hh = tile_h//2 + 8 half-window rows). Pure 0/1
    selections — the matmuls move values unchanged, so the half plane
    equals pipeline._decimate2's pairwise sums bit-exactly."""
    s = np.zeros((256, 128), np.float32)
    for j in range(128):
        s[2 * j, j] = 1.0
    r = np.zeros((hh, 2 * hh), np.float32)
    for t in range(hh):
        r[t, 2 * t] = 1.0
    return s, r


def _front_kernel_decimate(
    mats_ref, sel_ref, rsel_ref, raw_hbm, *rest,
    taps, tile_h, w, w_pad, h, whp, channels, u16, pad_b, gh=None,
):
    """Turbo ("decimate") front-end tile: full-res luma8 out, plus a
    HALF-resolution f32 luma plane (2x2 pairwise mean) written in
    pad_raw layout (8 context rows above, edge-replicated padding) with
    the Hessian-response tile minimum evaluated at half resolution —
    the cluster kernel then runs UNCHANGED on the half plane (f32 luma
    input mode, cluster.cluster_rochade_raw(luma_f32=True)).

    Per grid step (bi, i): the (tile_h+16)-row raw slab covers full-res
    luma rows [i*tile_h-8, i*tile_h+tile_h+8), which decimate to the
    hh = tile_h//2+8 half rows [i*band-4, i*band+band+4) (band =
    tile_h//2) — 4 halo rows on each side of the tile's half band,
    exactly the blur(3)+hessian(1) support. The half band is DMA'd to
    output rows [8+i*band, ...) (8-aligned); tile 0 also fills the 8
    context rows (replicated half row 0) and the last tile the bottom
    padding (replicated last true half row), so the output is
    bit-compatible with pad_raw(_decimate2(luma)). ``tile_h`` is 64 or
    128 — 128 halves the per-step fixed costs (DMA setup, matmul chunk
    loops) at ~2x the slab VMEM.
    """
    if gh is not None:
        (roff_ref, luma8_ref, half_hbm, min_ref,
         slab, hstage, lscr, sem, osem) = rest
    else:
        (luma8_ref, half_hbm, min_ref,
         slab, hstage, lscr, sem, osem) = rest
        roff_ref = None
    bi = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    rows = tile_h + 16
    band = tile_h // 2
    hh = band + 8
    radius = (len(taps) - 1) // 2
    h_half = h // 2
    w_half = w // 2

    slot = (bi * nt + i) % 2

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        pltpu.make_async_copy(
            raw_hbm.at[0, pl.ds(0, rows), :], slab.at[0], sem.at[0]
        ).start()

    last_t = i == nt - 1
    nbi = jnp.where(last_t, bi + 1, bi)
    nti = jnp.where(last_t, 0, i + 1)

    @pl.when(nbi < nb)
    def _():
        pltpu.make_async_copy(
            raw_hbm.at[nbi, pl.ds(nti * tile_h, rows), :],
            slab.at[1 - slot],
            sem.at[1 - slot],
        ).start()

    pltpu.make_async_copy(
        raw_hbm.at[bi, pl.ds(i * tile_h, rows), :], slab.at[slot], sem.at[slot]
    ).wait()

    # --- gray conversion (identical to _front_kernel)
    x = slab[slot].astype(jnp.int32).astype(jnp.float32)
    if channels == 3:
        lf, l8 = _rgb_luma_chunks(x, mats_ref, w_pad)
    elif u16:
        lf = x / 65535.0
        l8 = jnp.floor((x * 255.0 + 32767.0) / 65535.0)
    else:
        lf = x / 255.0
        l8 = None  # u8 gray: luma8 IS the raw plane (identity round trip)
    if l8 is None:
        luma8_ref[0, :, :] = slab[slot][8 : 8 + tile_h, :]
    else:
        luma8_ref[0, :, :] = l8[8 : 8 + tile_h, :].astype(jnp.int32).astype(
            jnp.uint8
        )

    # --- 2x2 pairwise-mean decimation: lane pair sums (roll), compact
    # even lanes (selection matmul), sublane pair sums (roll), compact
    # even sublanes (selection matmul), scale by the exact 0.25
    csum = lf + _roll(lf, -1, 1)  # pair sum at even lanes
    # compute min(whp, w_pad//2) compacted columns from the input (all
    # true half cols w//2 <= both), then extend to whp by replication —
    # the right-edge fix-up below overwrites everything >= w//2 anyway
    hw_c = min(whp, w_pad // 2)
    hc_chunks = []
    col = 0
    while col < hw_c:
        cw = min(128, hw_c - col)
        hc_chunks.append(
            jnp.dot(
                csum[:, 2 * col : 2 * (col + cw)],
                sel_ref[0 : 2 * cw, 0:cw],
                preferred_element_type=jnp.float32,
            )
        )
        col += cw
    half_c = jnp.concatenate(hc_chunks, axis=1)  # (rows, hw_c)
    if whp > hw_c:
        half_c = jnp.concatenate(
            [half_c, jnp.repeat(half_c[:, -1:], whp - hw_c, 1)], axis=1
        )
    rsum = half_c + _roll(half_c, -1, 0)  # pair sum at even sublanes
    half40 = (
        jnp.dot(
            rsel_ref[:, 0:rows], rsum, preferred_element_type=jnp.float32
        )
        * 0.25
    )  # (hh, whp): half rows [i*band-4, i*band+band+4)

    # --- edge fix-ups so padding replicates the HALF plane's own edges
    # (decimated full-res padding would replicate the last full row/col
    # instead of the last half row/col — off by one half pixel)
    riota = jax.lax.broadcasted_iota(jnp.int32, (hh, whp), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (hh, whp), 1)
    # right: cols >= w_half replicate col w_half-1
    rep_c = jnp.repeat(half40[:, w_half - 1 : w_half], whp, axis=1)
    half40 = jnp.where(ciota >= w_half, rep_c, half40)
    # top (tile 0 only): halo rows with global half row < 0 replicate
    # half row 0 (slab row 4)
    rep_t = jnp.repeat(half40[4:5, :], hh, axis=0)
    half40 = jnp.where(jnp.logical_and(i == 0, riota < 4), rep_t, half40)
    # bottom: rows with global half row > h_half-1 replicate row h_half-1
    # (dynamic row extraction via masked max — Mosaic has no dynamic
    # value slicing)
    rb = h_half + 3 - i * band  # slab row of global half row h_half-1
    rep_b0 = jnp.max(
        jnp.where(riota == jnp.clip(rb, 0, hh - 1), half40, -jnp.inf),
        axis=0,
        keepdims=True,
    )
    rep_b = jnp.repeat(rep_b0, hh, axis=0)
    half40 = jnp.where(riota > rb, rep_b, half40)

    # --- half-res blur + Hessian for the response tile minimum
    # (bit-identical structure to _front_kernel's full-res pass)
    lscr[:, 128 : 128 + whp] = half40
    lscr[:, 0:128] = jnp.repeat(half40[:, 0:1], 128, axis=1)
    lscr[:, 128 + whp : 256 + whp] = jnp.repeat(
        half40[:, w_half - 1 : w_half], 128, axis=1
    )
    y = lscr[:, :]
    temp = jnp.zeros_like(y)
    for k, kw in enumerate(taps):
        temp = temp + _roll(y, radius - k, 1) * kw
    blur = jnp.zeros_like(y)
    for k, kw in enumerate(taps):
        blur = blur + _roll(temp, radius - k, 0) * kw
    left = _roll(blur, 1, 1)
    right = _roll(blur, -1, 1)
    up = _roll(blur, 1, 0)
    down = _roll(blur, -1, 0)
    ul = _roll(up, 1, 1)
    ur = _roll(up, -1, 1)
    dl = _roll(down, 1, 1)
    dr = _roll(down, -1, 1)
    lxx = left - 2.0 * blur + right
    lyy = up - 2.0 * blur + down
    lxy = (ur - ul + dl - dr) * 0.25
    resp = (lxx * lyy - lxy * lxy)[4 : 4 + band, 128 : 128 + whp]
    lhr = i * band + jax.lax.broadcasted_iota(jnp.int32, (band, whp), 0)
    # global half row: sharded windows of a taller frame offset by
    # roff_ref (negative on the claim-context rows above the band)
    ghr = lhr if roff_ref is None else lhr + roff_ref[bi, 0]
    ghh = h_half if gh is None else gh
    gcol = jax.lax.broadcasted_iota(jnp.int32, (band, whp), 1)
    border = (
        (ghr <= 0) | (ghr >= ghh - 1) | (lhr >= h_half)
        | (gcol == 0) | (gcol >= w_half - 1)
    )
    if gh is not None:
        # sharded windows: the outer 4 local half rows blur into the
        # window's own replicated padding — their responses are owned by
        # the neighbor shard's interior (parallel/sharding.py coverage)
        border = border | (lhr < 4) | (lhr >= h_half - 4)
    min_ref[0, 0] = jnp.full(
        (8, 128), jnp.min(jnp.where(border, 0.0, resp)), jnp.float32
    )

    # --- stage + DMA the half band into the pad_raw-layout output.
    # hstage rows 4..4+hh hold half40; the center band [8, 8+band) is
    # 8-aligned
    hstage[4 : 4 + hh, :] = half40

    @pl.when(i == 0)
    def _():
        hstage[0:4, :] = rep_t[0:4, :]
        cp = pltpu.make_async_copy(
            hstage.at[pl.ds(0, 8 + band)],
            half_hbm.at[bi, pl.ds(0, 8 + band), :],
            osem,
        )
        cp.start()
        cp.wait()

    @pl.when(i > 0)
    def _():
        dst = pl.multiple_of(8 + i * band, 8)
        cp = pltpu.make_async_copy(
            hstage.at[pl.ds(8, band)],
            half_hbm.at[bi, pl.ds(dst, band), :],
            osem,
        )
        cp.start()
        cp.wait()

    if pad_b:

        @pl.when(last_t)
        def _():
            hstage[8 + band : 8 + band + pad_b, :] = rep_b[0:pad_b, :]
            cp = pltpu.make_async_copy(
                hstage.at[pl.ds(8 + band, pad_b)],
                half_hbm.at[bi, pl.ds(8 + nt * band, pad_b), :],
                osem,
            )
            cp.start()
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "interpret", "pre_padded", "true_shape", "channels", "u16",
        "tile_h", "global_h",
    ),
)
def front_kernel_decimate(
    img: jnp.ndarray,
    sigma: float = 1.5,
    interpret: bool = False,
    pre_padded: bool = False,
    true_shape: tuple[int, int] | None = None,
    channels: int | None = None,
    u16: bool | None = None,
    tile_h: int = 64,
    row_off: jnp.ndarray | None = None,  # (B,) int32 HALF-res row offsets
    global_h: int | None = None,         # HALF-res global frame height
):
    """Turbo front-end: (B, H, W[, 3]) u8/u16 raw frames -> (luma_u8
    (B, Hp, Wp) u8, half_p (B, H//2 padded + 16, W//2 padded) f32,
    tile_min (B, Hp/tile_h, 8, 128) f32).

    ``half_p`` is the 2x2 pairwise-mean decimated luma plane in pad_raw
    layout (8 context rows above, edge-replicated padding) — feed it
    straight to ``cluster.cluster_rochade_raw(..., luma_f32=True)``;
    ``tile_min`` holds the HALF-resolution Hessian response minima (the
    turbo clustering threshold). Bit-identical to
    ``pad_raw(_decimate2(to_luma(img)))`` + the XLA response min.

    ``tile_h`` (64 or 128) is the full-res rows per grid step; 128
    halves the per-step fixed costs. ``pre_padded`` inputs must come
    from ``pad_raw(img, tile_h=tile_h)`` (Hp a tile_h multiple).

    ``row_off``/``global_h`` (both in HALF-res rows): border zeroing for
    row-sharded windows of a taller frame tests GLOBAL half rows (see
    parallel/sharding.py's turbo front-end)."""
    if pre_padded:
        hgt, wid = true_shape
    else:
        img, hgt, wid, channels, u16 = pad_raw(img, tile_h=tile_h)
    b = img.shape[0]
    taps = tuple(float(v) for v in gaussian_kernel(sigma))
    assert len(taps) == 7, "kernel tuned for sigma<=1.5 (radius 3)"
    assert tile_h in (64, 128)
    band = tile_h // 2
    hh = band + 8
    h_pad = img.shape[1] - 16
    assert h_pad % tile_h == 0, (h_pad, tile_h)
    w_pad = img.shape[2] // channels
    nt = h_pad // tile_h
    h_half = hgt // 2
    whp = -(-(wid // 2) // 128) * 128
    # padded half height: at least the usual 64-row alignment, but also
    # tall enough that every tile's band-row DMA fits (the grid can
    # cover rows past the 64-aligned pad; the extra rows hold edge
    # replicas and are masked downstream)
    h_half_pad = max(-(-h_half // 64) * 64, nt * band - 8)
    pad_b = h_half_pad + 8 - nt * band
    assert 0 <= pad_b <= hh and h_half_pad % 8 == 0, (
        hgt, h_pad, h_half_pad, pad_b
    )

    mf, mi = _deinterleave_chunk(128)
    mats = jnp.asarray(np.concatenate([mf, mi], axis=1))
    sel_np, rsel_np = _decimate_mats(hh)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [mats, jnp.asarray(sel_np), jnp.asarray(rsel_np), img]
    assert row_off is None or global_h is not None, (
        "row_off without global_h would be silently ignored"
    )
    if global_h is not None:
        if row_off is None:
            row_off = jnp.zeros((b,), jnp.int32)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(row_off.astype(jnp.int32).reshape(b, 1))

    grid = (b, nt)
    luma8, half_p, tile_min = pl.pallas_call(
        functools.partial(
            _front_kernel_decimate, taps=taps, tile_h=tile_h, w=wid,
            w_pad=w_pad, h=hgt, whp=whp, channels=channels, u16=u16,
            pad_b=pad_b, gh=global_h,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, w_pad), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 1, 8, 128), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.uint8),
            jax.ShapeDtypeStruct((b, h_half_pad + 16, whp), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 16, w_pad * channels), img.dtype),
            pltpu.VMEM((-(-(8 + band + hh) // 8) * 8, whp), jnp.float32),
            pltpu.VMEM((hh, whp + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return luma8, half_p, tile_min


def _kernel(refs, *, taps, tile_h, w_pad, h, w, emit_resp):
    if emit_resp:
        luma_hbm, blur_ref, resp_ref, min_ref, slab, sem = refs
    else:
        luma_hbm, blur_ref, min_ref, slab, sem = refs
        resp_ref = None
    bi = pl.program_id(0)
    i = pl.program_id(1)
    radius = (len(taps) - 1) // 2

    copy = pltpu.make_async_copy(
        luma_hbm.at[bi, pl.ds(i * tile_h, tile_h + 2 * _HALO), :],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    x = slab[:]  # (tile_h + 8, w_pad + 256)

    # horizontal pass — lane rolls; cyclic wrap only pollutes the outer
    # columns of the pad, never the valid center
    temp = jnp.zeros_like(x)
    for k, kw in enumerate(taps):
        temp = temp + _roll(x, radius - k, 1) * kw
    # vertical pass — sublane rolls
    blur = jnp.zeros_like(x)
    for k, kw in enumerate(taps):
        blur = blur + _roll(temp, radius - k, 0) * kw

    # hessian stencil on the blurred slab
    left = _roll(blur, 1, 1)
    right = _roll(blur, -1, 1)
    up = _roll(blur, 1, 0)
    down = _roll(blur, -1, 0)
    ul = _roll(up, 1, 1)
    ur = _roll(up, -1, 1)
    dl = _roll(down, 1, 1)
    dr = _roll(down, -1, 1)
    lxx = left - 2.0 * blur + right
    lyy = up - 2.0 * blur + down
    lxy = (ur - ul + dl - dr) * 0.25
    resp = lxx * lyy - lxy * lxy

    # zero the global border rows/cols (reference leaves them 0)
    grow = i * tile_h + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, w_pad), 0
    )
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_pad), 1)
    # zero the reference's untouched borders AND all padding so the
    # clustering threshold/mask never see stencil garbage
    border = (grow == 0) | (grow >= h - 1) | (gcol == 0) | (gcol >= w - 1)
    center = (slice(_HALO, _HALO + tile_h), slice(128, 128 + w_pad))
    blur_ref[0, :, :] = blur[center]
    resp_center = jnp.where(border, 0.0, resp[center])
    if emit_resp:
        resp_ref[0, :, :] = resp_center
    # per-tile response minimum: the clustering threshold is
    # ratio * global_min (src/detector.rs:414-418); reducing per tile here
    # saves a whole-image pass (vector-tile output: SMEM outputs need
    # (8,128)-aligned blocks)
    min_ref[0, 0] = jnp.full((8, 128), jnp.min(resp_center), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "interpret", "crop", "true_shape", "emit_resp"),
)
def fused_frontend(
    luma: jnp.ndarray,
    sigma: float = 1.5,
    interpret: bool = False,
    crop: bool = True,
    true_shape: tuple[int, int] | None = None,
    emit_resp: bool = True,
):
    """(H, W) or (B, H, W) f32 luma -> (blur, resp) of the same shape.

    Matches gaussian_blur + hessian_response from ops/frontend.py. The
    batch dimension is handled natively by the kernel grid (Pallas calls
    with ANY-space inputs cannot be vmapped). ``crop=False`` returns the
    lane/row-padded planes (width/height rounded up; response zero in all
    padding) for direct consumption by the Pallas cluster kernel.
    """
    squeeze = luma.ndim == 2
    if squeeze:
        luma = luma[None]
    taps = tuple(float(v) for v in gaussian_kernel(sigma))
    assert len(taps) == 2 * 3 + 1, "kernel tuned for sigma<=1.5 (radius 3)"
    b = luma.shape[0]
    # when fed pre-padded planes (gray_kernel output), borders/gates use
    # the true image size
    h, w = true_shape if true_shape is not None else luma.shape[1:]
    tile_h = 64
    h_pad = -(-h // tile_h) * tile_h
    w_pad = -(-w // 128) * 128

    # pad once: 4 edge rows (clamped border) + row alignment, and full
    # 128-lane guards so rolls never wrap valid data into view
    hin, win = luma.shape[1:]
    x = jnp.pad(
        luma,
        (
            (0, 0),
            (_HALO, _HALO + h_pad - hin),
            (128, 128 + w_pad - win),
        ),
        mode="edge",
    )

    plane_spec = pl.BlockSpec(
        (1, tile_h, w_pad), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
    )
    min_spec = pl.BlockSpec(
        (1, 1, 8, 128), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM
    )
    plane_shape = jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32)
    min_shape = jax.ShapeDtypeStruct((b, h_pad // tile_h, 8, 128), jnp.float32)
    if emit_resp:
        out_specs = (plane_spec, plane_spec, min_spec)
        out_shape = (plane_shape, plane_shape, min_shape)
    else:
        out_specs = (plane_spec, min_spec)
        out_shape = (plane_shape, min_shape)

    def kernel(*refs):
        _kernel(
            refs, taps=taps, tile_h=tile_h, w_pad=w_pad, h=h, w=w,
            emit_resp=emit_resp,
        )

    grid = (b, h_pad // tile_h)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, w_pad + 256), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    if not emit_resp:
        blur, tile_min = outs
        assert not crop, "emit_resp=False implies padded outputs"
        return blur, tile_min
    blur, resp, tile_min = outs
    if not crop:
        return blur, resp, tile_min
    blur = blur[:, :h, :w]
    resp = resp[:, :h, :w]
    if squeeze:
        blur, resp = blur[0], resp[0]
    return blur, resp

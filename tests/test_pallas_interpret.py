"""Interpret-mode regression tests for the Mosaic kernels.

CI has no TPU; the Pallas interpreter executes the same kernel code on
CPU, guarding the kernel algorithms (the Mosaic lowering itself is
exercised by bench.py on hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aprilgrid_tpu.oracle import numpy_ref as R


@pytest.fixture(scope="module")
def euroc(data_dir):
    return R.load_image(str(data_dir / "EuRoC.png"))


def test_gray_kernel_matches_image_crate(euroc, data_dir):
    from aprilgrid_tpu.pallas.frontend import gray_kernel

    for name in ("EuRoC", "TUM_VI", "two_boards"):
        img = R.load_image(str(data_dir / f"{name}.png"))
        h, w = img.shape[:2]
        lf, l8 = gray_kernel(jnp.asarray(img)[None], interpret=True)
        np.testing.assert_allclose(
            np.asarray(lf)[0, :h, :w], R.to_luma32f(img), atol=2e-7
        )
        np.testing.assert_array_equal(
            np.asarray(l8)[0, :h, :w], R.to_luma8(img)
        )


def test_front_kernel_matches_split_kernels(euroc, data_dir):
    """Fused raw->blur kernel == gray_kernel + fused_frontend, bit-exact."""
    from aprilgrid_tpu.pallas.frontend import (
        front_kernel,
        fused_frontend,
        gray_kernel,
    )

    for name in ("EuRoC", "two_boards", "TUM_VI"):
        img = R.load_image(str(data_dir / f"{name}.png"))
        h, w = img.shape[:2]
        raw = jnp.asarray(img)[None]
        blur_p, l8, tmin = front_kernel(raw, 1.5, interpret=True)
        lf_ref, l8_ref = gray_kernel(raw, interpret=True)
        blur_ref, tmin_ref = fused_frontend(
            lf_ref, 1.5, interpret=True, crop=False, true_shape=(h, w),
            emit_resp=False,
        )
        np.testing.assert_array_equal(
            np.asarray(l8)[0, :h, :w], np.asarray(l8_ref)[0, :h, :w]
        )
        np.testing.assert_allclose(
            np.asarray(blur_p)[0, :h, :w],
            np.asarray(blur_ref)[0, :h, :w],
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tmin), np.asarray(tmin_ref), atol=1e-9
        )


def test_front_kernel_tile_h_128_matches_64(data_dir):
    """The exact front kernel at tile_h=128 (env AG_TILEH A/B) must be
    bit-identical to tile_h=64 on the true rows: same luma8, same
    response minimum (the extra pad rows are masked edge replicas)."""
    from aprilgrid_tpu.pallas.frontend import front_kernel, pad_raw

    for name in ("EuRoC", "two_boards"):  # u8-gray odd-height + RGB 1080p
        img = R.load_image(str(data_dir / f"{name}.png"))
        h, w = img.shape[:2]
        raw = jnp.asarray(img)[None]
        l8a, tmina = front_kernel(raw, 1.5, interpret=True, emit_blur=False)
        raw_p, _h, _w, channels, u16 = pad_raw(raw, tile_h=128)
        l8b, tminb = front_kernel(
            raw_p, 1.5, interpret=True, emit_blur=False, pre_padded=True,
            true_shape=(h, w), channels=channels, u16=u16, tile_h=128,
        )
        np.testing.assert_array_equal(
            np.asarray(l8a)[0, :h, :w], np.asarray(l8b)[0, :h, :w]
        )
        np.testing.assert_array_equal(
            np.min(np.asarray(tmina)), np.min(np.asarray(tminb))
        )


def test_exact_front_tile_h_128_cluster_parity(data_dir):
    """The EXACT Pallas front path on a 128-row pad (AG_TILEH=128:
    pad_raw rounds 64-pads up, adding a replica band at the bottom)
    must produce the same compacted saddles as the 64-row pad — the
    cluster kernel's true-size gates must reject the extra pad rows."""
    from aprilgrid_tpu.config import CONSTANTS, DEFAULT_CAPACITIES, DEFAULT_PARAMS
    from aprilgrid_tpu.ops.rochade import filter_and_compact
    from aprilgrid_tpu.pallas.cluster import (
        cluster_rochade_raw,
        saddles_from_candidates,
    )
    from aprilgrid_tpu.pallas.frontend import front_kernel, pad_raw

    # 260 rows: 64-pad -> 320, 128-pad -> 384 (the pads must DIFFER for
    # this test to mean anything); the crop holds ~85 oracle saddles
    img = R.load_image(str(data_dir / "two_boards.png"))[300:560, :768]
    h, w = img.shape[:2]
    outs = []
    for tile_h in (64, 128):
        raw_p, _h, _w, channels, u16 = pad_raw(
            jnp.asarray(img)[None], tile_h=tile_h
        )
        l8, tmin = front_kernel(
            raw_p, 1.5, interpret=True, emit_blur=False, pre_padded=True,
            true_shape=(h, w), channels=channels, u16=u16, tile_h=tile_h,
        )
        thr = jnp.min(tmin, axis=(1, 2, 3)) * CONSTANTS.response_threshold_ratio
        fields, _ = cluster_rochade_raw(
            raw_p, thr, h, w, channels=channels, u16=u16, interpret=True
        )
        s = filter_and_compact(
            saddles_from_candidates(fields[0]),
            DEFAULT_CAPACITIES.max_saddles,
            CONSTANTS.saddle_k_ratio,
            DEFAULT_PARAMS.min_saddle_angle,
            DEFAULT_PARAMS.max_saddle_angle,
        )
        outs.append(jax.tree.map(np.asarray, s))
    a, b = outs
    assert a.valid.sum() == b.valid.sum() > 20
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_array_equal(a.p[a.valid], b.p[b.valid])
    np.testing.assert_array_equal(a.theta[a.valid], b.theta[b.valid])


def test_fused_frontend_matches_xla(euroc):
    from aprilgrid_tpu.ops.frontend import gaussian_blur, hessian_response
    from aprilgrid_tpu.pallas.frontend import fused_frontend

    luma = jnp.asarray(R.to_luma32f(euroc))
    blur, resp = fused_frontend(luma, 1.5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(blur), np.asarray(gaussian_blur(luma, 1.5)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(resp),
        np.asarray(hessian_response(gaussian_blur(luma, 1.5))),
        atol=1e-7,
    )


@pytest.mark.parametrize("name", ["EuRoC", "TUM_VI"])
def test_cluster_rochade_matches_oracle_saddles(name, data_dir):
    """EuRoC = u8 752x480; TUM_VI = 16-bit 1024x1024 — both through the
    full fused cluster kernel in interpret mode."""
    from aprilgrid_tpu.ops.rochade import filter_and_compact
    from aprilgrid_tpu.pallas.cluster import (
        cluster_rochade,
        saddles_from_candidates,
    )
    from aprilgrid_tpu.pallas.frontend import fused_frontend

    euroc = R.load_image(str(data_dir / f"{name}.png"))
    h, w = euroc.shape
    luma = jnp.asarray(R.to_luma32f(euroc))[None]
    blur_p, tile_min = fused_frontend(
        luma, 1.5, interpret=True, crop=False, emit_resp=False
    )
    thr = jnp.min(tile_min, axis=(1, 2, 3)) * 0.05
    fields, counts = cluster_rochade(blur_p, thr, h, w, 4, 1.0, interpret=True)
    assert float(counts[0, 0]) < fields.shape[1]  # no overflow on EuRoC
    assert float(counts[0, 1]) == 0  # no blob-size drops on EuRoC
    raw = jax.vmap(saddles_from_candidates)(fields)
    s = jax.vmap(lambda x: filter_and_compact(x, 768, 0.1, 30.0, 60.0))(raw)
    got = np.asarray(s.p[0])[np.asarray(s.valid[0])]

    ref = R.refined_saddle_points(euroc)
    assert len(got) == len(ref)
    ref_p = np.array(sorted(tuple(x.p) for x in ref))
    got_p = np.array(sorted(map(tuple, got)))
    np.testing.assert_allclose(got_p, ref_p, atol=1e-3)
    # ORDER parity, not just set parity: the kernel drains clusters in
    # region-major order and the tail's label argsort must restore the
    # reference's scan-order enumeration exactly (seed order and
    # capacity truncation downstream are order-sensitive)
    np.testing.assert_allclose(
        np.asarray(got), np.array([x.p for x in ref]), atol=1e-3
    )


@pytest.mark.parametrize("name", ["EuRoC", "TUM_VI", "two_boards"])
def test_cluster_rochade_raw_matches_blur_fed(name, data_dir):
    """Folded raw-input cluster kernel (gray + blur recomputed
    in-window) must reproduce the blur-fed kernel bit-for-bit — u8,
    16-bit and RGB inputs."""
    from aprilgrid_tpu.pallas.cluster import (
        cluster_rochade,
        cluster_rochade_raw,
    )
    from aprilgrid_tpu.pallas.frontend import (
        front_kernel,
        pad_raw,
    )

    img = R.load_image(str(data_dir / f"{name}.png"))
    h, w = img.shape[:2]
    raw = jnp.asarray(img)[None]
    blur_p, _l8, tmin = front_kernel(raw, 1.5, interpret=True)
    thr = jnp.min(tmin, axis=(1, 2, 3)) * 0.05
    ref_fields, ref_counts = cluster_rochade(
        blur_p, thr, h, w, 4, 1.0, interpret=True
    )
    raw_p, _h, _w, channels, u16 = pad_raw(raw)
    l8b, tminb = front_kernel(
        raw_p, 1.5, interpret=True, emit_blur=False, pre_padded=True,
        true_shape=(h, w), channels=channels, u16=u16,
    )
    np.testing.assert_array_equal(np.asarray(_l8), np.asarray(l8b))
    np.testing.assert_array_equal(np.asarray(tmin), np.asarray(tminb))
    fields, counts = cluster_rochade_raw(
        raw_p, thr, h, w, channels=channels, u16=u16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_counts), np.asarray(counts))
    np.testing.assert_array_equal(np.asarray(ref_fields), np.asarray(fields))


def test_cluster_blob_size_cap_is_signaled_not_silent():
    """A response blob taller than the member-scan window is dropped by
    design (the reference has no such cap) — but the drop must be
    SURFACED via the per-frame drop counter, never silent."""
    from aprilgrid_tpu.pallas.cluster import _SUB, cluster_rochade

    h, w = 256, 256
    # blur = r*c has lxy = 1, lxx = lyy = 0 => response = -1 at every
    # interior pixel: one giant connected blob spanning every window
    r = np.arange(h, dtype=np.float32)[:, None]
    c = np.arange(w, dtype=np.float32)[None, :]
    blur = (r * c)[None]
    assert h > _SUB  # the blob is guaranteed to cross the scan border
    thr = jnp.asarray([-0.05], jnp.float32)
    fields, counts = cluster_rochade(
        jnp.asarray(blur), thr, h, w, 4, 1.0, interpret=True
    )
    assert float(counts[0, 1]) >= 1, "oversized blob drop must be counted"
    # and nothing bogus was accepted from it
    assert float(counts[0, 0]) == 0


def test_hamming_scan_matches_einsum():
    """Pallas VMEM hamming table scan == the XLA einsum + argmin path
    (min AND first-argmin semantics), on random bit rows + the real
    T36H11 table."""
    from aprilgrid_tpu.families import get_family
    from aprilgrid_tpu.pallas.decode import hamming_scan

    spec = get_family("t36h11")
    codes = jnp.asarray(spec.code_bits.astype(np.float32))  # (587, 36)
    rng = np.random.default_rng(3)
    b, r, nb = 3, 40, codes.shape[1]
    rows = rng.integers(0, 2, (b, r, nb)).astype(np.float32)
    # plant exact codes (ham 0, duplicated mins) to stress tie-breaking
    rows[0, 0] = np.asarray(codes[17])
    rows[1, 1] = np.asarray(codes[0])
    rots = jnp.asarray(rows)

    inner = jnp.einsum("brn,cn->brc", rots, codes)
    ham = rots.sum(-1)[..., None] + codes.sum(-1)[None, None, :] - 2.0 * inner
    ref_idx = jnp.argmin(ham, axis=-1)
    ref_min = jnp.take_along_axis(ham, ref_idx[..., None], -1)[..., 0]

    mins, idxs = hamming_scan(rots, codes, interpret=True)
    np.testing.assert_array_equal(np.asarray(mins), np.asarray(ref_min))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idx))


def test_decode_quads_batch_pallas_matches_xla(data_dir):
    """Full decode path (positions + sampling + hamming + corner
    ordering) with the Pallas hamming kernel == the XLA einsum path, on
    real quads from EuRoC."""
    from aprilgrid_tpu.config import CONSTANTS
    from aprilgrid_tpu.families import get_family
    from aprilgrid_tpu.ops.decode import decode_quads_batch

    from aprilgrid_tpu import native

    spec = get_family("t36h11")
    img = R.load_image(str(data_dir / "EuRoC.png"))
    luma8 = R.to_luma8(img)
    saddles = R.refined_saddle_points(img)
    px = np.array([s.p[0] for s in saddles], np.float32)
    py = np.array([s.p[1] for s in saddles], np.float32)
    th = np.array([s.theta for s in saddles], np.float32)
    quads = native.find_board(px, py, th, np.ones(len(saddles), np.uint8))
    qp = np.stack([px[quads], py[quads]], axis=-1)[None]  # (1, T, 4, 2)
    qv = np.ones((1, qp.shape[1]), bool)
    args = (
        jnp.asarray(luma8)[None], jnp.asarray(qp), jnp.asarray(qv), spec,
        CONSTANTS.decode_margin, CONSTANTS.valid_brightness_threshold,
        CONSTANTS.max_invalid_bit, CONSTANTS.min_contrast,
    )
    ref = decode_quads_batch(*args, use_pallas=False)
    got = decode_quads_batch(*args, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.ids), np.asarray(got.ids))
    np.testing.assert_array_equal(
        np.asarray(ref.valid), np.asarray(got.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.corners), np.asarray(got.corners)
    )
    assert int(ref.valid.sum()) == 36


def test_mathx_accuracy():
    from aprilgrid_tpu.pallas import mathx

    rng = np.random.default_rng(0)
    y = rng.uniform(-10, 10, 10000).astype(np.float32)
    x = rng.uniform(-10, 10, 10000).astype(np.float32)
    got = np.asarray(mathx.atan2(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan2(y, x), atol=5e-7)
    z = rng.uniform(-1, 1, 10000).astype(np.float32)
    got = np.asarray(mathx.acos(jnp.asarray(z)))
    np.testing.assert_allclose(got, np.arccos(z), atol=2e-6)

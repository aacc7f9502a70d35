"""Parity of the matmul (vectorized per-chunk) root extraction vs the
serial region drain (pallas/cluster.py ``extract=``): bit-identical
accepted-candidate rows and counters in interpret mode.

Covers: an RGB 1080p scene with a TALL blob (iphone — exercises the
tall-list handoff whose f32 label packing once corrupted), a dense
4-px checkerboard (>8 roots per (16, 128) chunk => leftover revisits),
bottom-row saddles (clipped last window), u16 input, and the turbo
half plane (prefilter + 160-row window).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from aprilgrid_tpu.pallas.cluster import cluster_rochade_raw
from aprilgrid_tpu.pallas.frontend import (
    front_kernel,
    front_kernel_decimate,
    pad_raw,
)


def _accepted(fields):
    f = np.asarray(fields[0])
    ok = (f[:, 6] > 0.5) & (f[:, 7] > 0.5)
    rows = f[ok]
    return rows[np.argsort(rows[:, 7])]


def _assert_pair(raw_p, thr, h, w, ch, u16, min_rows, **kw):
    outs = []
    for mode in ("drain", "matmul"):
        fields, counts = cluster_rochade_raw(
            raw_p, thr, h, w, channels=ch, u16=u16, interpret=True,
            extract=mode, **kw,
        )
        outs.append((_accepted(fields), np.asarray(counts[0])))
    (a, ca), (b, cb) = outs
    assert a.shape == b.shape and a.shape[0] >= min_rows, (a.shape, b.shape)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ca, cb)


def _frontend(img):
    raw = jnp.asarray(img)[None]
    h, w = img.shape[:2]
    raw_p, _, _, ch, u16 = pad_raw(raw)
    _, tile_min = front_kernel(
        raw_p, 1.5, emit_blur=False, pre_padded=True, true_shape=(h, w),
        channels=ch, u16=u16, interpret=True,
    )
    thr = jnp.min(tile_min, axis=(1, 2, 3)) * 0.05
    return raw_p, thr, h, w, ch, u16


@pytest.mark.parametrize(
    "name,crop,min_rows",
    [
        # full frame: a tall blob at (806, 1518) rides the tall-list
        # handoff between the vector batch and the serial 48-row rescan
        ("iphone", None, 400),
        ("TUM_VI", (512, 512), 50),  # u16 path
    ],
)
def test_matmul_extraction_matches_drain(data_dir, name, crop, min_rows):
    img = np.asarray(Image.open(data_dir / f"{name}.png"))
    if crop is not None:
        img = img[: crop[0], : crop[1]]
    _assert_pair(*_frontend(img), min_rows)


@pytest.mark.parametrize("mslots", [8, 16])
def test_matmul_extraction_dense_revisits(mslots):
    """>mslots roots per (16, 128) chunk: leftovers must stay in rem and
    be re-extracted on a later visit of the same chunk."""
    cb = np.indices((25, 41)).sum(0) % 2
    dense = np.kron(cb, np.ones((4, 4), np.uint8)) * 255
    img = np.full((192, 384), 255, np.uint8)
    img[16:116, 64:228] = dense
    _assert_pair(*_frontend(img), 500, mslots=mslots)


def test_matmul_extraction_clipped_last_window():
    patch = np.kron(np.indices((6, 24)).sum(0) % 2, np.ones((8, 8), np.uint8)) * 255
    img = np.full((200, 512), 255, np.uint8)
    img[148:196, 20:212] = patch[:48, :192]
    _assert_pair(*_frontend(img), 80)


def test_matmul_extraction_e2e_golden(data_dir, monkeypatch):
    """AG_EXTRACT=matmul end to end through the hybrid detector: same
    tags as the default path on a golden scene (the env knob is read at
    trace time; the static arg keys a separate jit cache entry)."""
    from aprilgrid_tpu.detector import TagDetector

    monkeypatch.setenv("AG_EXTRACT", "matmul")
    img = np.asarray(Image.open(data_dir / "EuRoC.png"))
    tags = TagDetector("t36h11").detect(img)
    assert len(tags) == 36
    monkeypatch.delenv("AG_EXTRACT")
    ref = TagDetector("t36h11").detect(img)
    assert set(tags) == set(ref)
    for tid, c in tags.items():
        np.testing.assert_array_equal(np.asarray(c), np.asarray(ref[tid]))


def test_matmul_extraction_turbo_half_plane(data_dir):
    """Turbo composition: half-res f32 luma plane, prefilter on, and the
    160-row sweep window."""
    img = np.asarray(Image.open(data_dir / "two_boards.png"))[:768, :1024]
    raw = jnp.asarray(img)[None]
    h, w = img.shape[:2]
    raw_p, _, _, ch, u16 = pad_raw(raw)
    _, half_p, tile_min = front_kernel_decimate(
        raw_p, 1.5, pre_padded=True, true_shape=(h, w), channels=ch,
        u16=u16, interpret=True,
    )
    thr = jnp.min(tile_min, axis=(1, 2, 3)) * 0.05
    _assert_pair(
        half_p, thr, h // 2, w // 2, 1, False, 50,
        luma_f32=True, prefilter=True, win=160,
    )

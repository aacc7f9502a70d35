"""Clustering-free turbo extraction (pallas/nms.py).

Two-link contract chain (each link asserted directly):

1. kernel == NumPy reference: the Pallas NMS kernel reproduces the
   NumPy formulation (tools/probe_nms.py — masked response min-filter,
   scan-order tie-break, record read at the peak) peak-for-peak on
   real-image crops spanning RGB/gray, odd dims, and multi-window
   frames.
2. NumPy reference == oracle end-to-end: the NMS front-end + the
   ORACLE's board search/decode reproduces the oracle's exact tag-ID
   set with corners within the 0.1 px BASELINE agreement budget on the
   >= 2 MP golden scenes (turbo's domain).

On CPU the facade never routes to Pallas kernels, so the e2e golden
contract for the hardware path itself is enforced by the bench gate
(tools/bench_ladder.sh) and the existing tests/test_decimate.py suite
on the XLA turbo path.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from probe_nms import (  # noqa: E402
    dense_records,
    merge_peaks,
    nms_peaks,
    turbo_nms_detect,
)

from aprilgrid_tpu.oracle import numpy_ref as orc  # noqa: E402
from aprilgrid_tpu.pallas.frontend import (  # noqa: E402
    front_kernel_decimate,
    pad_raw,
)
from aprilgrid_tpu.pallas.nms import (  # noqa: E402
    cells_to_fields,
    nms_extract_raw,
)


@pytest.mark.parametrize(
    "name,crop,merge",
    [
        ("two_boards", (512, 1024), 0),  # RGB, 2 sweep windows
        ("iphone", (416, 640), 0),       # RGB, odd half width (-> wp 384)
        ("TUM_VI", (417, 513), 0),       # gray, odd dims
        # geodesic peak merge: windowed kernel == global NumPy merge
        ("two_boards", (512, 1024), 8),
        ("iphone", (416, 640), 4),
        ("TUM_VI", (417, 513), 8),
    ],
)
def test_nms_kernel_matches_numpy(data_dir, name, crop, merge):
    img = np.asarray(Image.open(data_dir / f"{name}.png"))[
        : crop[0], : crop[1]
    ]
    h, w = img.shape[:2]

    # NumPy expected (probe methodology, float64 records)
    luma = orc.to_luma32f(img)
    hh, ww = h // 2 * 2, w // 2 * 2
    x = luma[:hh, :ww].reshape(hh // 2, 2, ww // 2, 2)
    half = (
        (x[:, 0, :, 0] + x[:, 0, :, 1]) + (x[:, 1, :, 0] + x[:, 1, :, 1])
    ) * np.float32(0.25)
    blur_h = orc.gaussian_blur_f32(half, 1.5)
    resp_h = orc.hessian_response(blur_h)
    thr = np.float32(resp_h.min()) * np.float32(0.05)
    x0, y0, c3, c4, c5, kk, okf = dense_records(blur_h)
    hp_, wp_ = resp_h.shape
    margin = np.zeros_like(okf)
    margin[4 : hp_ - 4, 4 : wp_ - 4] = True
    cand = (resp_h < thr) & okf & margin
    peaks = nms_peaks(resp_h, cand, 3)
    if merge:
        inner = np.zeros_like(cand)
        inner[1:-1, 1:-1] = True
        peaks = merge_peaks(peaks, (resp_h < thr) & inner, merge)
    ys, xs = np.nonzero(peaks)
    exp = np.stack(
        [
            xs + x0[ys, xs],
            ys + y0[ys, xs],
            c3[ys, xs],
            c4[ys, xs],
            c5[ys, xs],
            (ys * (w // 2) + xs + 1).astype(np.float64),
        ],
        axis=1,
    )
    exp = exp[np.argsort(exp[:, 5])]

    # kernel (interpret mode)
    raw = jnp.asarray(img)[None]
    raw_p, _, _, channels, u16 = pad_raw(raw, tile_h=64)
    _, half_p, tile_min = front_kernel_decimate(
        raw_p, 1.5, pre_padded=True, true_shape=(h, w),
        channels=channels, u16=u16, tile_h=64, interpret=True,
    )
    thr_j = jnp.min(tile_min, axis=(1, 2, 3)) * 0.05
    cells = nms_extract_raw(
        half_p, thr_j, h // 2, w // 2, channels=1, u16=False,
        luma_f32=True, sigma=1.5, hp2=4, move_thr=1.0, interpret=True,
        merge=merge,
    )
    fields, n = jax.vmap(lambda c: cells_to_fields(c, 1024))(cells)
    f = np.asarray(fields[0])
    ok = f[:, 6] > 0.5
    got = f[ok][:, [0, 1, 3, 4, 5, 7]]
    got = got[np.argsort(got[:, 5])]

    assert len(exp) == ok.sum() == int(n[0]) > 0
    np.testing.assert_array_equal(exp[:, 5], got[:, 5])  # same peaks
    # f32 kernel vs f64 reference records
    np.testing.assert_allclose(exp[:, :5], got[:, :5], atol=5e-5)


def test_nms_pipeline_env_knob(data_dir, monkeypatch):
    """AG_TURBO_NMS=1 routes the Pallas turbo front-end through the NMS
    kernel: counters valid, saddles populated, and every emitted saddle
    passes the same k/phi gates as the drain path's survivors."""
    from aprilgrid_tpu.config import (
        DEFAULT_CAPACITIES,
        DEFAULT_PARAMS,
        PipelineConstants,
    )
    from aprilgrid_tpu.pipeline import _pallas_decimated_frontend_batch

    monkeypatch.setenv("AG_TURBO_NMS", "1")
    img = np.asarray(Image.open(data_dir / "two_boards.png"))[:512, :1024]
    raw = jnp.asarray(img)[None]
    s, l8, counters = _pallas_decimated_frontend_batch(
        raw, DEFAULT_PARAMS, PipelineConstants(), DEFAULT_CAPACITIES,
        with_counters=True, interpret=True,
    )
    nv = int(np.asarray(s.valid[0]).sum())
    assert nv > 0
    assert np.asarray(counters)[0, 0] == 0.0  # no overflow
    # full-res positions inside the frame
    p = np.asarray(s.p[0])[np.asarray(s.valid[0])]
    assert (p[:, 0] > 0).all() and (p[:, 0] < img.shape[1]).all()
    assert (p[:, 1] > 0).all() and (p[:, 1] < img.shape[0]).all()


@pytest.mark.parametrize("merge", [0, 8])
@pytest.mark.parametrize("name", ["iphone", "two_boards"])
def test_nms_e2e_matches_oracle(data_dir, name, merge):
    """NMS front-end + oracle board search/decode == oracle detect on
    the >= 2 MP goldens: same tag IDs, corners within the 0.1 px
    BASELINE agreement budget (the turbo auto-policy contract, asserted
    directly against the reference-exact oracle) — with and without the
    geodesic peak merge (m8 is the production default)."""
    from aprilgrid_tpu.config import DEFAULT_PARAMS

    img = orc.load_image(str(data_dir / f"{name}.png"))
    ref = orc.TagDetector("t36h11", DEFAULT_PARAMS).detect(img)
    stats: dict = {"merge_sweeps": merge}
    got = turbo_nms_detect(img, 3, DEFAULT_PARAMS, stats)
    assert set(got) == set(ref)
    assert stats["missed_acc_blobs"] <= 1
    for tid, corners in ref.items():
        err = np.abs(np.asarray(corners) - np.asarray(got[tid])).max()
        assert err < 0.1, (tid, err)


def test_turbo_nms_env_policy(monkeypatch):
    """AG_TURBO_NMS policy resolution: "0"/empty force the drain,
    "auto" (the default) is resolved STATICALLY by the hybrid facade
    (NMS iff the turbo fast path exists) — callers WITHOUT the facade
    (xla mode, direct pipeline calls) resolve it to the drain — and
    anything else forces the NMS kernel."""
    from aprilgrid_tpu.pipeline import _resolve_nms, _turbo_nms_env

    monkeypatch.delenv("AG_TURBO_NMS", raising=False)
    assert _turbo_nms_env() == "auto"
    assert _resolve_nms(None) is False  # auto w/o the facade -> drain
    monkeypatch.setenv("AG_TURBO_NMS", "0")
    assert _turbo_nms_env() == "0" and _resolve_nms(None) is False
    monkeypatch.setenv("AG_TURBO_NMS", "1")
    assert _turbo_nms_env() == "1" and _resolve_nms(None) is True
    monkeypatch.setenv("AG_TURBO_NMS", "auto")
    # an explicit facade choice always wins over the env policy
    assert _resolve_nms(True) is True and _resolve_nms(False) is False


def test_turbo_fast_path_domain():
    """The facade's static NMS selector keys off turbo_fast_path_ok —
    the same predicate saddle_frontend_batch uses to route to the fused
    Pallas turbo path, so the selector can never pick a kernel the
    frontend would not run (round-4 advisor finding: the retired timing
    probe raced two identical computations outside this domain)."""
    from aprilgrid_tpu.pipeline import _pallas_cluster_ok, turbo_fast_path_ok

    # golden-scene geometries: all inside the fast path
    for h, w in [(1080, 1920), (1024, 1024), (2160, 3840)]:
        assert turbo_fast_path_ok(h, w)
        assert _pallas_cluster_ok(h // 2, w // 2)
    # too short for one half-res sweep window -> no fast path
    assert not turbo_fast_path_ok(240, 320)
    # half-res width beyond the packed-label domain -> no fast path
    assert not turbo_fast_path_ok(1024, 2**17 + 64)

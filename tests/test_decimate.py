"""Decimated ("turbo") detection mode (no reference equivalent).

The turbo mode detects at half resolution and re-refines surviving
corners at full resolution straight from the raw frame
(pipeline._decimated_tail). It is APPROXIMATE by design: the contract
pinned here is

* >= 2 MP golden scenes (iphone, two_boards): exact same tag-ID set as
  the reference ORACLE with corners within 0.1 px of it (the
  BASELINE.json agreement budget, asserted DIRECTLY — not transitively),
  and the same ID set as the exact JAX pipeline within 0.15 px;
* the JAX decimated front-end bit-matches the NumPy oracle's
  ``decimated_refined_saddle_points``;
* the facade's ``decimate="auto"`` policy engages only at >= 2 MP
  (1024x1024 scenes DO lose tags at half resolution — that is why).
"""

import numpy as np
import pytest
from PIL import Image

from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle import numpy_ref as oracle


@pytest.fixture(scope="module")
def detectors():
    return (
        TagDetector("t36h11", mode="hybrid"),
        TagDetector("t36h11", mode="hybrid", decimate=True),
    )


@pytest.mark.parametrize("name", ["iphone", "two_boards"])
def test_turbo_matches_exact_at_2mp(detectors, data_dir, name):
    d_exact, d_turbo = detectors
    img = np.asarray(Image.open(data_dir / f"{name}.png"))
    r_exact = d_exact.detect(img)
    r_turbo = d_turbo.detect(img)
    assert set(r_turbo) == set(r_exact)
    for tid, corners in r_exact.items():
        err = np.abs(np.asarray(corners) - np.asarray(r_turbo[tid])).max()
        assert err < 0.15, (tid, err)


@pytest.mark.parametrize("name", ["iphone", "two_boards"])
def test_turbo_matches_oracle_directly(detectors, data_dir, name):
    """The auto policy's claim chains DIRECTLY to the reference, not
    transitively through the exact JAX pipeline: on the >= 2 MP golden
    scenes the turbo mode must reproduce the ORACLE's (reference-exact,
    tests/test_oracle.py) tag-ID set with corners within the 0.1 px
    agreement budget of BASELINE.json."""
    from aprilgrid_tpu.oracle.numpy_ref import TagDetector as OracleDetector

    _, d_turbo = detectors
    img = np.asarray(Image.open(data_dir / f"{name}.png"))
    r_oracle = OracleDetector("t36h11").detect(img)
    r_turbo = d_turbo.detect(img)
    assert set(r_turbo) == set(r_oracle)
    for tid, corners in r_oracle.items():
        err = np.abs(np.asarray(corners) - np.asarray(r_turbo[tid])).max()
        assert err < 0.1, (tid, err)


def test_decimated_frontend_matches_oracle(data_dir):
    img = np.asarray(Image.open(data_dir / "TUM_VI.png"))
    d = TagDetector("t36h11", decimate=True)
    got = d.refined_saddle_points(img)
    want = oracle.decimated_refined_saddle_points(img)
    assert len(got) == len(want)
    gp = np.array(sorted((s.p[0], s.p[1]) for s in got))
    wp = np.array(sorted((s.p[0], s.p[1]) for s in want))
    np.testing.assert_allclose(gp, wp, atol=1e-3)


def test_auto_policy_resolution_gate():
    d = TagDetector("t36h11", decimate="auto")
    assert d._use_decimate(1080, 1920)  # 2.07 MP: on
    assert d._use_decimate(2160, 3840)  # 4K: on
    assert not d._use_decimate(1024, 1024)  # 1.05 MP: off (loses tags)
    assert not TagDetector("t36h11")._use_decimate(2160, 3840)  # default off


def test_auto_mode_small_frame_stays_exact(data_dir):
    """decimate="auto" on a 1024x1024 frame must take the exact path
    (full 36 tags — the turbo path only finds ~26-33 there)."""
    img = np.asarray(Image.open(data_dir / "r45.png"))
    d = TagDetector("t36h11", mode="hybrid", decimate="auto")
    assert len(d.detect(img)) == 36


def test_turbo_batch(detectors, data_dir):
    """Batched turbo detect returns per-frame dicts matching single-frame."""
    _, d_turbo = detectors
    img = np.asarray(Image.open(data_dir / "two_boards.png"))
    single = d_turbo.detect(img)
    batch = d_turbo.detect_batch(np.stack([img, img]))
    assert len(batch) == 2
    for res in batch:
        assert set(res) == set(single)
        for tid in single:
            np.testing.assert_allclose(res[tid], single[tid], atol=1e-4)


def test_invalid_decimate_arg():
    with pytest.raises(ValueError):
        TagDetector("t36h11", decimate="always")


def test_turbo_detect_stream(data_dir):
    """detect_stream composes with turbo (the streaming path just calls
    detect_batch, which resolves the decimate policy per batch)."""
    from aprilgrid_tpu.parallel.streaming import detect_stream

    det = TagDetector("t36h11", mode="hybrid", decimate=True)
    img = np.asarray(Image.open(data_dir / "two_boards.png"))[:540, :960]
    batches = [np.broadcast_to(img, (2,) + img.shape) for _ in range(2)]
    got = list(detect_stream(det, iter(batches), prefetch=2))
    ref = det.detect_batch(batches[0])
    assert len(got) == 2
    for res in got:
        assert [set(r) for r in res] == [set(r) for r in ref]


def test_native_pair_cache_overflow(data_dir):
    """Regression: a dense low-resolution board (64 turbo saddles of a
    ~41 px-tag 4x4 grid) generated more distinct expansion-edge queries
    than the native PairCache's old 1024 slots — the open-addressing
    probe loop then spun forever on the first miss in a full table.
    The cache now floors at 4096 slots and stops storing at 50 % load
    (recompute instead of hang). Saddles captured from that scene."""
    from aprilgrid_tpu import native

    s = np.load(data_dir / "pair_cache_overflow_saddles.npy")
    n = len(s)
    quads, counts = native.find_board_batch(
        s[None, :, 0], s[None, :, 1], s[None, :, 2],
        np.ones((1, n), np.uint8),
    )
    assert counts[0] == 16  # the full 4x4 board


def test_pallas_cluster_domain_gate():
    """8K-class frames exceed the Pallas cluster kernel's packed-label
    domain and must route to the XLA ops path instead of tripping the
    kernel asserts; turbo clusters at half resolution, which brings 8K
    back inside the domain."""
    from aprilgrid_tpu.pipeline import _pallas_cluster_ok

    assert _pallas_cluster_ok(1080, 1920)
    assert _pallas_cluster_ok(2160, 3840)        # 4K exact: 8.3M < 2^24
    assert not _pallas_cluster_ok(4320, 7680)    # 8K exact: over the domain
    assert _pallas_cluster_ok(4320 // 2, 7680 // 2)  # 8K turbo half plane
    assert not _pallas_cluster_ok(100, 1920)     # too short for one window


def test_turbo_xla_mode(data_dir):
    """decimate composes with mode="xla": the whole decimated detect —
    including board growth — inside one jitted program, matching the
    hybrid turbo result."""
    img = np.asarray(Image.open(data_dir / "two_boards.png"))
    d_hyb = TagDetector("t36h11", mode="hybrid", decimate=True)
    d_xla = TagDetector("t36h11", mode="xla", decimate=True)
    r_hyb = d_hyb.detect(img)
    r_xla = d_xla.detect(img)
    assert set(r_xla) == set(r_hyb) and len(r_hyb) == 72
    for tid in r_hyb:
        np.testing.assert_allclose(
            np.asarray(r_xla[tid]), np.asarray(r_hyb[tid]), atol=1e-3
        )


def test_turbo_stress_scene_2mp():
    """Synthetic >= 2 MP scene: turbo must keep the exact pipeline's
    tag-ID set (the auto-policy recall contract beyond the goldens)."""
    from conftest import make_stress_scene

    base = make_stress_scene(3)  # 820x820 with a rotated 4x4 board
    canvas = np.full((1200, 1700), 160, np.uint8)  # 2.04 MP
    canvas[190 : 190 + 820, 440 : 440 + 820] = base
    d_exact = TagDetector("t36h11", mode="hybrid")
    d_turbo = TagDetector("t36h11", mode="hybrid", decimate="auto")
    r_exact = d_exact.detect(canvas)
    r_turbo = d_turbo.detect(canvas)
    assert len(r_exact) >= 8
    assert set(r_turbo) == set(r_exact)
    for tid in r_exact:
        err = np.abs(
            np.asarray(r_exact[tid]) - np.asarray(r_turbo[tid])
        ).max()
        assert err < 0.3, (tid, err)


def test_turbo_detect_batch_sharded(data_dir):
    """DP-sharded turbo detect == single-device turbo (CPU mesh)."""
    from aprilgrid_tpu.parallel.sharding import (
        detect_batch_sharded,
        make_mesh,
    )

    img = np.asarray(Image.open(data_dir / "two_boards.png"))[:540, :960]
    imgs = np.stack([img] * 4)
    det = TagDetector("t36h11", mode="hybrid", decimate=True)
    ref = det.detect_batch(imgs)
    mesh = make_mesh({"data": 4})
    got = detect_batch_sharded(det, imgs, mesh)
    assert len(got) == 4
    for r, g in zip(ref, got):
        assert set(r) == set(g) and len(r) > 0
        for tid in r:
            np.testing.assert_allclose(
                np.asarray(g[tid]), np.asarray(r[tid]), atol=1e-5
            )


@pytest.mark.parametrize(
    "name,crop",
    [
        ("iphone", (416, 640)),     # RGB, even dims
        ("TUM_VI", (417, 513)),     # gray, odd dims
        ("TUM_VI", (385, 512)),     # h ≡ 1 mod 128: pad_b == 0 DMA layout
        ("two_boards", (512, 1024)),
    ],
)
def test_pallas_turbo_frontend_matches_xla(data_dir, name, crop, u16=False):
    """The fused Pallas turbo front-end (front_kernel_decimate +
    cluster_rochade_raw(luma_f32=True) + the sparse refine kernel)
    reproduces the XLA decimated front-end exactly (same saddles, same
    luma8) in interpret mode."""
    import jax.numpy as jnp

    from aprilgrid_tpu.config import (
        DEFAULT_CAPACITIES,
        DEFAULT_PARAMS,
        PipelineConstants,
    )
    from aprilgrid_tpu.pipeline import (
        _pallas_decimated_frontend_batch,
        saddle_frontend_batch,
    )

    consts = PipelineConstants()
    img = np.asarray(Image.open(data_dir / f"{name}.png"))[: crop[0], : crop[1]]
    if u16:
        img = (img.astype(np.uint16) * 257)  # 16-bit gray path
    raw = jnp.asarray(img)[None]
    s_ref, l8_ref = saddle_frontend_batch(
        raw, DEFAULT_PARAMS, consts, DEFAULT_CAPACITIES,
        use_pallas=False, decimate=True,
    )
    s_pal, l8_pal, counters = _pallas_decimated_frontend_batch(
        raw, DEFAULT_PARAMS, consts, DEFAULT_CAPACITIES,
        with_counters=True, interpret=True,
    )
    vr = np.asarray(s_ref.valid[0])
    vp = np.asarray(s_pal.valid[0])
    assert vr.sum() == vp.sum() and vr.sum() > 0
    pr = np.asarray(s_ref.p[0])[vr]
    pp = np.asarray(s_pal.p[0])[vp]
    pr = pr[np.lexsort(pr.T)]
    pp = pp[np.lexsort(pp.T)]
    if u16:
        # the u16 /65535 luma division lowers with ulp-level differences
        # between the kernel and vmap programs (u8 /255 is exact)
        np.testing.assert_allclose(pr, pp, atol=1e-3)
    else:
        np.testing.assert_array_equal(pr, pp)
    h, w = img.shape[:2]
    np.testing.assert_array_equal(
        np.asarray(l8_pal)[0, :h, :w], np.asarray(l8_ref)[0, :h, :w]
    )
    assert np.asarray(counters)[0, 0] == 0.0  # no overflow
    assert np.asarray(counters)[0, 1] == 0.0  # no drops


def test_pallas_turbo_frontend_u16(data_dir):
    """u16 input exercises the 16-bit branches of the turbo front
    kernel and the sparse refine kernel."""
    test_pallas_turbo_frontend_matches_xla(
        data_dir, "TUM_VI", (416, 512), u16=True
    )


@pytest.mark.parametrize(
    "name,crop",
    [
        ("iphone", (416, 640)),    # RGB, 64-and-128-aligned h
        ("TUM_VI", (417, 513)),    # gray, odd dims (extra pad tile @128)
        ("TUM_VI", (385, 512)),    # h ≡ 1 mod 128
    ],
)
def test_turbo_frontend_tile_h_128(data_dir, name, crop):
    """front_kernel_decimate(tile_h=128) (halved per-step fixed costs)
    is bit-identical to the tile_h=64 kernel: same half plane on the
    common padded rows, same luma8 on the true rows, same global
    response minimum."""
    import jax.numpy as jnp

    from aprilgrid_tpu.pallas.frontend import front_kernel_decimate

    img = np.asarray(Image.open(data_dir / f"{name}.png"))[
        : crop[0], : crop[1]
    ]
    raw = jnp.asarray(img)[None]
    l8a, halfa, mina = front_kernel_decimate(
        raw, tile_h=64, interpret=True
    )
    l8b, halfb, minb = front_kernel_decimate(
        raw, tile_h=128, interpret=True
    )
    h, w = img.shape[:2]
    np.testing.assert_array_equal(
        np.asarray(l8b)[0, :h], np.asarray(l8a)[0, :h]
    )
    rows = min(halfa.shape[1], halfb.shape[1])  # taller pad @128 on odd h
    np.testing.assert_array_equal(
        np.asarray(halfb)[0, :rows], np.asarray(halfa)[0, :rows]
    )
    assert float(jnp.min(minb)) == float(jnp.min(mina))


def test_turbo_tile_h_env_e2e(data_dir, monkeypatch):
    """AG_TILEH=128 routes the whole turbo front-end through the
    double-height kernel with identical saddles (env-knob e2e parity)."""
    monkeypatch.setenv("AG_TILEH", "128")
    test_pallas_turbo_frontend_matches_xla(data_dir, "iphone", (416, 640))

"""Per-frame time budget for the hybrid exact pipeline at 1080p, b128.

Round-5 verdict item 1: publish a measured budget (relay dispatch
floor, front min-pass kernel, cluster kernel, decode, host search,
downloads) and attack the top line. Each component is timed in
ISOLATION on the real chip (back-to-back in one relay window; timing
sync = tiny host read per CLAUDE.md), then compared against the
pipelined e2e — the difference is what the software pipeline already
hides.

Usage: python tools/probe_budget.py [scene ...]  (default: two_boards iphone)
Env: BENCH_BATCH (128), BENCH_REPS (3), AG_CHUNK (default resolution
ladder, 48 @1080p exact).
"""

import os
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from aprilgrid_tpu import native
    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.oracle.numpy_ref import load_image
    from aprilgrid_tpu.pallas.cluster import cluster_rochade_raw
    from aprilgrid_tpu.pallas.frontend import front_kernel, pad_raw

    scenes = sys.argv[1:] or ["two_boards", "iphone"]
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    det = TagDetector("t36h11")
    consts = det.consts

    def sync(x):
        # block_until_ready under-reports through the relay; a tiny
        # host read is the only trustworthy sync (CLAUDE.md). Slice ON
        # DEVICE first — np.asarray on the full array would download
        # tens of MB through the ~40 MB/s relay.
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def best_of(fn, *a, **kw):
        fn(*a, **kw)  # warm (compile already cached)
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a, **kw))
            b = min(b, time.perf_counter() - t0)
        return b

    # relay dispatch floor: trivial op on a tiny array, full round trip
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    t_disp = best_of(f_tiny, tiny)

    for name in scenes:
        img = load_image(f"tests/data/{name}.png")
        h, w = img.shape[:2]
        imgs_np = np.ascontiguousarray(
            np.broadcast_to(img, (batch,) + img.shape)
        )
        imgs = jnp.asarray(imgs_np)
        from aprilgrid_tpu.detector import _default_chunk

        chunk = int(os.environ.get("AG_CHUNK", _default_chunk(h, w)))
        probe = imgs[:chunk]

        # e2e (pipelined)
        det.detect_batch(imgs)
        t_e2e = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            det.detect_batch(imgs)
            t_e2e = min(t_e2e, time.perf_counter() - t0)

        # front-end packed (front min-pass + cluster + compact) per chunk
        t_fe = best_of(det._frontend_packed_fn, probe, decimate=False)

        # front min-pass kernel alone
        raw_p, th_, tw_, channels, u16 = pad_raw(probe)
        fk = lambda rp: front_kernel(  # noqa: E731
            rp, consts.blur_sigma, emit_blur=False, pre_padded=True,
            true_shape=(h, w), channels=channels, u16=u16,
        )
        t_front = best_of(fk, raw_p)

        # cluster kernel alone (threshold from a real run)
        luma_u8, tile_min = fk(raw_p)
        thr = jnp.min(tile_min, axis=(1, 2, 3)) * consts.response_threshold_ratio
        ck = jax.jit(
            lambda rp, t: cluster_rochade_raw(
                rp, t, h, w, channels=channels, u16=u16,
                sigma=consts.blur_sigma, hp2=2 * consts.rochade_half_patch,
                move_thr=consts.rochade_move_threshold,
            )
        )
        t_cluster = best_of(ck, raw_p, thr)

        # pack download (device -> host, one chunk): fresh dispatch per
        # rep — np.asarray on an already-fetched jax Array reuses the
        # cached host copy and times 0
        t_dl = 1e9
        for _ in range(reps):
            pack = det._frontend_packed_fn(probe, decimate=False)
            sync(pack)
            t0 = time.perf_counter()
            np.asarray(pack[0])
            t_dl = min(t_dl, time.perf_counter() - t0)

        # host search per pass (native, from the real pack)
        pk = np.asarray(pack[0])[:, :-1]
        sp = np.ascontiguousarray(pk[..., 0:2])
        theta = np.ascontiguousarray(pk[..., 2])
        alive = np.ascontiguousarray(pk[..., 3] > 0.5).astype(np.uint8)
        t0 = time.perf_counter()
        quads, counts = native.find_board_batch(
            sp[..., 0], sp[..., 1], theta, alive,
            spacing_ratio=det.params.tag_spacing_ratio,
            max_seeds=det.consts.max_seeds,
            early_exit_score=det.consts.early_exit_score,
            cap=(2 * det.caps.grid_radius + 1) ** 2,
        )
        t_search1 = time.perf_counter() - t0

        # decode dispatch (realistic dcap bucket from real counts)
        dcap = det.caps.max_tags * 2
        mx = int(counts.max())
        for cand in (24, 48, 96):
            if mx <= cand < dcap:
                dcap = cand
                break
        nb = quads.shape[0]
        q = np.ascontiguousarray(quads[:, :dcap])
        qarr = np.concatenate(
            [q.reshape(nb, dcap * 4), counts[:, None]], axis=1
        ).astype(np.int32)
        t_dec = best_of(
            det._decode_packed_fn, pack[0], pack[1], jnp.asarray(qarr),
            hw=(h, w), dcap=dcap,
        )

        n_chunks = max(1, -(-batch // chunk))
        ms = lambda s: round(1e3 * s, 2)  # noqa: E731
        per_frame = lambda s: round(1e3 * s / chunk, 3)  # noqa: E731
        print(f"\n## {name} ({w}x{h}), batch {batch}, chunk {chunk}, "
              f"{n_chunks} chunks — isolation times in ONE relay window")
        print("| component | ms/chunk | ms/frame |")
        print("|---|---|---|")
        print(f"| relay dispatch+sync floor (tiny op) | {ms(t_disp)} | "
              f"{per_frame(t_disp)} |")
        print(f"| front min-pass kernel | {ms(t_front)} | {per_frame(t_front)} |")
        print(f"| cluster+ROCHADE kernel | {ms(t_cluster)} | "
              f"{per_frame(t_cluster)} |")
        print(f"| front-end packed (all of the above + compact) | {ms(t_fe)} "
              f"| {per_frame(t_fe)} |")
        print(f"| pack download ({pk.nbytes // 1024} KiB) | {ms(t_dl)} | "
              f"{per_frame(t_dl)} |")
        print(f"| host search pass-1 (this pack) | {ms(t_search1)} | "
              f"{per_frame(t_search1)} |")
        print(f"| decode dispatch (dcap {dcap}) | {ms(t_dec)} | "
              f"{per_frame(t_dec)} |")
        print(f"| **e2e pipelined** | — | **{round(1e3 * t_e2e / batch, 3)}** "
              f"({round(batch / t_e2e, 1)} fps) |")
        ideal = t_fe / chunk
        print(f"| device-bound floor (front-end packed only) | — | "
              f"{round(1e3 * ideal, 3)} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Probe the decode pass's device cost vs quad capacity on TPU.

Times _decode_packed_fn (upload + device + tiny sync) on real
two_boards front-end outputs at the dcap ladder, plus isolation
variants (gather-only, pre-without-hamming) to attribute the cost.
Run: python tools/probe_decode.py [batch]
"""

import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from aprilgrid_tpu import native
    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.oracle.numpy_ref import load_image

    img = load_image("tests/data/two_boards.png")
    imgs = jnp.asarray(np.stack([img] * b))
    det = TagDetector("t36h11")
    hw = (int(imgs.shape[1]), int(imgs.shape[2]))
    cap = (2 * det.caps.grid_radius + 1) ** 2

    packed, luma8 = det._frontend_packed_fn(imgs)
    pk = np.asarray(packed)[:, :-1]
    quads, counts = native.find_board_batch(
        np.ascontiguousarray(pk[..., 0]),
        np.ascontiguousarray(pk[..., 1]),
        np.ascontiguousarray(pk[..., 2]),
        np.ascontiguousarray(pk[..., 3] > 0.5).astype(np.uint8),
        spacing_ratio=det.params.tag_spacing_ratio,
        max_seeds=det.consts.max_seeds,
        early_exit_score=det.consts.early_exit_score,
        cap=cap,
    )
    print(f"b={b} quads/frame max={counts.max()} mean={counts.mean():.1f}")

    def timeit(fn, reps=6):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            np.asarray(out.reshape(-1)[0])  # tiny sync read
            best = min(best, time.time() - t0)
        return best

    for dc in (24, 48, 96, 192):
        q = np.ascontiguousarray(quads[:, :dc])
        qarr = jnp.asarray(
            np.concatenate(
                [q.reshape(b, dc * 4), counts[:, None]], axis=1
            ).astype(np.int32)
        )
        dt = timeit(
            lambda: det._decode_packed_fn(packed, luma8, qarr, hw=hw, dcap=dc)
        )
        print(f"decode dc={dc:3d}  {dt*1e3:7.1f} ms  ({dt/b*1e6:6.0f} us/frame)")

    # isolation at dc=192: gather only
    dc = 192
    q = np.ascontiguousarray(quads[:, :dc])
    qarr = jnp.asarray(
        np.concatenate(
            [q.reshape(b, dc * 4), counts[:, None]], axis=1
        ).astype(np.int32)
    )
    from aprilgrid_tpu.ops.decode import _decode_pre

    spec, consts = det.spec, det.consts

    @jax.jit
    def pre_only(packed, luma8, qarr):
        quads_ = qarr[:, : dc * 4].reshape(b, dc, 4)
        cnts = qarr[:, dc * 4]
        qv = jnp.arange(dc)[None, :] < cnts[:, None]
        qp = jax.vmap(lambda pkk, qq: pkk[jnp.maximum(qq, 0), 0:2])(
            packed[:, :-1], quads_
        )
        rots, gates = jax.vmap(
            lambda l, qq, v: _decode_pre(
                l, qq, v, spec, consts.decode_margin,
                consts.valid_brightness_threshold, consts.max_invalid_bit,
                consts.min_contrast, hw,
            )
        )(luma8, qp, qv)
        return rots.sum(axis=(1, 2, 3)) + gates.sum(axis=(1, 2))

    dt = timeit(lambda: pre_only(packed, luma8, qarr))
    print(f"pre-only dc=192 {dt*1e3:7.1f} ms  ({dt/b*1e6:6.0f} us/frame)")


if __name__ == "__main__":
    main()

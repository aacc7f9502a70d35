"""Bisect the decode-pre fixed cost on TPU (stage-by-stage jit probes).

Run: python tools/probe_decode2.py [batch] [dc]
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
from jax import lax


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dc = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    h, w, nb = 1080, 1920, 36
    rng = np.random.default_rng(0)
    luma8 = jnp.asarray(rng.integers(0, 255, (b, h, w), np.uint8))
    packed = jnp.asarray(rng.random((b, 769, 4), np.float32) * 500)
    qarr = jnp.asarray(
        rng.integers(0, 700, (b, dc * 4 + 1), np.int32)
    )

    from aprilgrid_tpu.families import get_family
    from aprilgrid_tpu.ops.decode import _affine_pinv, _bit_grid, _rot_perms
    from aprilgrid_tpu.ops.geometry import rust_round
    from aprilgrid_tpu.config import CONSTANTS

    spec = get_family("t36h11")
    margin = CONSTANTS.decode_margin

    def stage_qp(packed, qarr):
        quads = qarr[:, : dc * 4].reshape(b, dc, 4)
        counts = qarr[:, dc * 4]
        qv = jnp.arange(dc)[None, :] < counts[:, None]
        qp = jax.vmap(lambda pk, q: pk[jnp.maximum(q, 0), 0:2])(
            packed[:, :-1], quads
        )
        return qp, qv

    def stage_coords(qp):
        pinv = jnp.asarray(_affine_pinv(spec.side_bits, margin))
        bq = qp.reshape(b, dc, 8)
        params = jnp.einsum(
            "ph,tkh->tkp", pinv, bq, precision=lax.Precision.HIGHEST
        )
        grid = jnp.asarray(_bit_grid(spec.edge, spec.border))
        px = (
            params[..., None, 0] * grid[None, None, :, 0]
            + params[..., None, 1] * grid[None, None, :, 1]
            + params[..., None, 2]
        )
        py = (
            params[..., None, 3] * grid[None, None, :, 0]
            + params[..., None, 4] * grid[None, None, :, 1]
            + params[..., None, 5]
        )
        return px, py

    def stage_idx(px, py):
        sx = jnp.maximum(rust_round(px), 0.0)
        sy = jnp.maximum(rust_round(py), 0.0)
        xi = jnp.clip(sx.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(sy.astype(jnp.int32), 0, h - 1)
        return xi, yi

    def stage_gather(luma8, xi, yi):
        return jax.vmap(lambda l, y, x: l[y, x])(luma8, yi, xi).astype(
            jnp.int32
        )

    def stage_bits(bright):
        min_b = bright.min(axis=-1)
        max_b = bright.max(axis=-1)
        mid = (min_b + max_b + 1) // 2
        bits_msb = bright > mid[..., None]
        lsb = bits_msb[..., ::-1].astype(jnp.float32)
        perms = jnp.asarray(_rot_perms(spec.edge))
        rots = lsb[..., perms]
        return rots

    probes = {
        "qp": jax.jit(lambda: stage_qp(packed, qarr)[0].sum()),
        "+coords": jax.jit(
            lambda: sum(x.sum() for x in stage_coords(stage_qp(packed, qarr)[0]))
        ),
        "+idx": jax.jit(
            lambda: sum(
                x.sum()
                for x in stage_idx(*stage_coords(stage_qp(packed, qarr)[0]))
            )
        ),
        "+gather": jax.jit(
            lambda: stage_gather(
                luma8,
                *stage_idx(*stage_coords(stage_qp(packed, qarr)[0])),
            ).sum()
        ),
        "+bits": jax.jit(
            lambda: stage_bits(
                stage_gather(
                    luma8,
                    *stage_idx(*stage_coords(stage_qp(packed, qarr)[0])),
                )
            ).sum()
        ),
    }

    def timeit(fn, reps=6):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            np.asarray(out.reshape(-1)[0] if out.ndim else out)
            best = min(best, time.time() - t0)
        return best

    print(f"b={b} dc={dc}")
    for name, fn in probes.items():
        dt = timeit(fn)
        print(f"{name:10s} {dt*1e3:8.1f} ms ({dt/b*1e6:6.0f} us/frame)")


if __name__ == "__main__":
    main()

"""TPU attribution probe for mode="xla" (round-5 verdict item 2).

Times the whole-pipeline xla mode's stages IN ISOLATION on the real
chip at the bench batch (16): Pallas frontend, knn_table, init_quads
(30 seeds vmapped), find_best_board on the pass-1 and pass-2 saddle
sets (and the seeds_per_group ladder), fix_missing, decode at the
G2-cell capacity, and the full detect_batch e2e. Relay timing rules
per CLAUDE.md (tiny-slice host-read sync, best-of reps, one window).

Usage: python tools/probe_xla.py [scene]   (default iphone)
Env: XB (batch, 16), XREPS (3), XSPG (comma list of seeds_per_group
values to ladder, default "1").
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

    from aprilgrid_tpu.config import CONSTANTS, DEFAULT_CAPACITIES, DEFAULT_PARAMS
    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.families import get_family
    from aprilgrid_tpu.ops.board import fix_missing, grow_board, knn_table
    from aprilgrid_tpu.ops.decode import decode_quads
    from aprilgrid_tpu.ops.quads import init_quads
    from aprilgrid_tpu.ops.search import find_best_board
    from aprilgrid_tpu.oracle.numpy_ref import load_image
    from aprilgrid_tpu import pipeline as pl

    scene = sys.argv[1] if len(sys.argv) > 1 else "iphone"
    b = int(os.environ.get("XB", "16"))
    reps = int(os.environ.get("XREPS", "3"))
    spgs = [int(x) for x in os.environ.get("XSPG", "1").split(",")]

    caps, consts, params = DEFAULT_CAPACITIES, CONSTANTS, DEFAULT_PARAMS
    spec = get_family("t36h11")

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def best_of(fn, *a):
        fn(*a)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    img = load_image(f"tests/data/{scene}.png")
    h, w = img.shape[:2]
    imgs = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(img, (b,) + img.shape))
    )

    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    fe = jax.jit(
        lambda im: pl.saddle_frontend_batch(
            im, params, consts, caps, use_pallas
        )
    )
    saddles, luma8 = fe(imgs)
    sync(saddles.p)
    t_fe = best_of(fe, imgs)
    alive1 = saddles.valid

    def mk_fbb(spg, mb):
        @jax.jit
        def f(s, alive):
            return jax.vmap(
                lambda sd, al: find_best_board(
                    sd, al, params.tag_spacing_ratio, caps.grid_radius,
                    consts.quad_nn, caps.max_quads, mb, spg,
                    caps.max_attempts, consts.max_seeds,
                    consts.early_exit_score,
                )
            )(s, alive)
        return f

    base = mk_fbb(caps.seeds_per_group, caps.max_boards)
    res = base(saddles, alive1)
    sync(res.board.score)
    n = saddles.valid.shape[1]
    used = jnp.where(
        res.board.placed[..., None], res.board.cell_quad, n
    )
    alive2 = jax.vmap(
        lambda al, u: al.at[u.reshape(-1)].set(False, mode="drop")
    )(alive1, used)

    print(f"# xla probe: {scene} ({w}x{h}) b{b} "
          f"(pass1 score {int(res.board.score[0])})")
    print(f"frontend: {1e3 * t_fe:.1f} ms/batch "
          f"({1e3 * t_fe / b:.2f} ms/frame)")

    kt = jax.jit(lambda s, a: jax.vmap(knn_table)(s, a))
    t_kt = best_of(kt, saddles, alive1)
    print(f"knn_table: {1e3 * t_kt:.1f} ms/batch")

    iq = jax.jit(
        lambda s, a: jax.vmap(
            lambda sd, al: jax.vmap(
                lambda seed: init_quads(
                    sd, al, seed, consts.quad_nn, caps.max_quads
                )
            )(jnp.arange(30))
        )(s, a)
    )
    t_iq = best_of(iq, saddles, alive1)
    print(f"init_quads x30 seeds: {1e3 * t_iq:.1f} ms/batch")

    dq = jax.jit(
        lambda l8, qp, qv: jax.vmap(
            lambda l, p_, v_: decode_quads(
                l, p_, v_, spec, consts.decode_margin,
                consts.valid_brightness_threshold, consts.max_invalid_bit,
                consts.min_contrast, true_shape=(h, w),
            )
        )(l8, qp, qv)
    )
    qp = jax.vmap(lambda sd, q: sd.p[jnp.maximum(q, 0)])(
        saddles, res.board.cell_quad
    )
    t_dq = best_of(dq, luma8, qp, res.board.placed)
    print(f"decode @G2 cells: {1e3 * t_dq:.1f} ms/batch")

    for spg in spgs:
        mb = max(caps.max_boards, spg * caps.max_quads)
        f = mk_fbb(spg, mb)
        t1 = best_of(f, saddles, alive1)
        t2 = best_of(f, saddles, alive2)
        print(f"find_best_board spg={spg} mb={mb}: pass1 {1e3 * t1:.1f} "
              f"ms/batch, pass2(no-board) {1e3 * t2:.1f} ms/batch "
              f"({1e3 * (t1 + t2) / b:.2f} ms/frame both passes)")

    det = TagDetector("t36h11", mode="xla")
    det.detect_batch(np.asarray(imgs))
    te = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        det.detect_batch(np.asarray(imgs))
        te = min(te, time.perf_counter() - t0)
    print(f"e2e detect_batch: {1e3 * te:.1f} ms/batch -> "
          f"{b / te:.2f} fps")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Race formulations of the per-quad corner lookup (b, dc, 4) from the
packed saddle array (b, 768, 4) — the decode pass's dominant fixed cost
(~32 ms/b128 as a vmapped XLA gather).

Run: python tools/probe_qp.py [batch] [dc]
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dc = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    n = 768
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((b, n + 1, 4), np.float32) * 500)
    quads = jnp.asarray(rng.integers(0, n, (b, dc, 4), np.int32))

    @jax.jit
    def v_vmap(packed, quads):
        return jax.vmap(lambda pk, q: pk[jnp.maximum(q, 0), 0:2])(
            packed[:, :-1], quads
        )

    @jax.jit
    def v_onehot(packed, quads):
        q = jnp.maximum(quads, 0).reshape(b, dc * 4)
        oh = (
            q[..., None] == jnp.arange(n, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        src = packed[:, :-1, 0:2].astype(jnp.bfloat16)
        out = jnp.einsum(
            "bqn,bnc->bqc", oh, src, preferred_element_type=jnp.float32
        )
        return out.reshape(b, dc, 4, 2)

    @jax.jit
    def v_onehot_f32(packed, quads):
        q = jnp.maximum(quads, 0).reshape(b, dc * 4)
        oh = (
            q[..., None] == jnp.arange(n, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        src = packed[:, :-1, 0:2]
        out = jnp.einsum(
            "bqn,bnc->bqc", oh, src, preferred_element_type=jnp.float32
        )
        return out.reshape(b, dc, 4, 2)

    @jax.jit
    def v_take_along(packed, quads):
        q = jnp.maximum(quads, 0).reshape(b, dc * 4, 1)
        out = jnp.take_along_axis(
            packed[:, :-1, 0:2], jnp.broadcast_to(q, (b, dc * 4, 2)), axis=1
        )
        return out.reshape(b, dc, 4, 2)

    @jax.jit
    def v_flat(packed, quads):
        base = jnp.arange(b, dtype=jnp.int32)[:, None] * (n + 1)
        lin = (base + jnp.maximum(quads, 0).reshape(b, dc * 4)).reshape(-1)
        flat = packed[:, :, 0:2].reshape(-1, 2)
        return flat[lin].reshape(b, dc, 4, 2)

    def timeit(fn, reps=6):
        out = fn(packed, quads)
        np.asarray(out.reshape(-1)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(packed, quads)
            np.asarray(out.reshape(-1)[0])
            best = min(best, time.time() - t0)
        return best

    ref = np.asarray(v_vmap(packed, quads))
    print(f"b={b} dc={dc}")
    for name, fn in [
        ("vmap-index", v_vmap),
        ("onehot-bf16", v_onehot),
        ("onehot-f32", v_onehot_f32),
        ("take-along", v_take_along),
        ("flat-gather", v_flat),
    ]:
        dt = timeit(fn)
        got = np.asarray(fn(packed, quads)).reshape(ref.shape)
        exact = "exact" if np.array_equal(got, ref) else f"MAXERR {np.abs(got - ref).max():.2e}"
        print(f"{name:12s} {dt*1e3:8.1f} ms ({dt/b*1e6:6.0f} us/frame)  {exact}")


if __name__ == "__main__":
    main()

"""Mosaic capability probes for the vectorized root-extraction design
(docs/ROADMAP.md "Root loop"): can the one-hot compaction be built in
matmul layout on this toolchain?

Each probe compiles + runs a tiny kernel on the TPU and prints OK/FAIL —
lowering errors are what we are testing for (interpret mode bypasses
Mosaic entirely, so this must run on the real chip).

1. reshape (16, 128) -> (1, 2048)        [rank row for the one-hot]
2. reshape (8, 128)  -> (1, 1024)
3. broadcast-compare one-hot (16, 2048) from a (1, 2048) row + iota
4. matmul (16, 2048) @ (2048, 8) f32     [the compaction itself]
5. transpose (1, 128) -> (128, 1)
6. lane prefix-sum via log-step masked rolls (sanity)
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        res = np.asarray(jax.jit(fn)(*args))
        print(f"{name}: OK  (out[0,:4]={np.asarray(res)[0].ravel()[:4]})")
        return res
    except Exception as e:  # noqa: BLE001 — probing lowering failures
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: FAIL  {type(e).__name__}: {msg}")
        return None


def main():
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)

    def k_reshape16(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(1, 2048)

    run("reshape (16,128)->(1,2048)", k_reshape16,
        jax.ShapeDtypeStruct((1, 2048), jnp.float32), x)

    x8 = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def k_reshape8(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(1, 1024)

    run("reshape (8,128)->(1,1024)", k_reshape8,
        jax.ShapeDtypeStruct((1, 1024), jnp.float32), x8)

    rank = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None, :], (1, 128))

    def k_onehot(r_ref, o_ref):
        row = r_ref[:, :]                       # (1, 2048) int32
        si = jax.lax.broadcasted_iota(jnp.int32, (16, 2048), 0)
        o_ref[:, :] = (jnp.broadcast_to(row, (16, 2048)) == si).astype(
            jnp.float32
        )

    oh = run("one-hot (16,2048) bcast-compare", k_onehot,
             jax.ShapeDtypeStruct((16, 2048), jnp.float32),
             rank.reshape(1, 2048))

    feats = jnp.arange(2048 * 8, dtype=jnp.float32).reshape(2048, 8)

    def k_matmul(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(
            a_ref[:, :], b_ref[:, :], preferred_element_type=jnp.float32
        )

    if oh is not None:
        run("matmul (16,2048)@(2048,8)", k_matmul,
            jax.ShapeDtypeStruct((16, 8), jnp.float32),
            jnp.asarray(oh), feats)

    v = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)

    def k_transpose(v_ref, o_ref):
        o_ref[:, :] = v_ref[:, :].reshape(128, 1)

    run("reshape (1,128)->(128,1)", k_transpose,
        jax.ShapeDtypeStruct((128, 1), jnp.float32), v)

    def k_prefix(x_ref, o_ref):
        a = x_ref[:, :]
        li = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        for s in (1, 2, 4, 8, 16, 32, 64):
            a = a + jnp.where(li >= s, pltpu.roll(a, s, 1), 0.0)
        o_ref[:, :] = a

    run("lane prefix-sum (16,128) log-rolls", k_prefix,
        jax.ShapeDtypeStruct((16, 128), jnp.float32), x)

    # --- the extraction design's exact op mix (docs/ROADMAP.md):
    # A @ B^T via dot_general contracting LANES of both operands (the
    # native MXU orientation, as in flash-attention kernels)
    a = jnp.arange(8 * 2048, dtype=jnp.float32).reshape(8, 2048) % 7.0
    bmat = jnp.arange(8 * 2048, dtype=jnp.float32).reshape(8, 2048) % 5.0

    def k_dotT(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run("dot_general (8,2048)x(8,2048)^T lanes-lanes", k_dotT,
        jax.ShapeDtypeStruct((8, 8), jnp.float32), a, bmat)

    # broadcast-compare one-hot against a (slots, 1) column + masked
    # lane reduce to (slots, 1) — the member-sum / bot-touch op shape
    lbl = jnp.arange(15360, dtype=jnp.int32).reshape(1, 15360) % 97
    col = (jnp.arange(8, dtype=jnp.int32) * 13).reshape(8, 1)

    def k_member(l_ref, c_ref, o_ref):
        oh2 = (
            jnp.broadcast_to(l_ref[:, :], (8, 15360))
            == jnp.broadcast_to(c_ref[:, :], (8, 15360))
        )
        o_ref[:, :] = jnp.sum(
            oh2.astype(jnp.float32), axis=1, keepdims=True
        )

    run("member one-hot (8,15360) + lane reduce", k_member,
        jax.ShapeDtypeStruct((8, 1), jnp.float32), lbl, col)

    # reshape (40, 384) -> (1, 15360): the shared member window flatten
    m = jnp.arange(40 * 384, dtype=jnp.float32).reshape(40, 384)

    def k_reshape_mw(m_ref, o_ref):
        o_ref[:, :] = m_ref[:, :].reshape(1, 15360)

    run("reshape (40,384)->(1,15360)", k_reshape_mw,
        jax.ShapeDtypeStruct((1, 15360), jnp.float32), m)

    # sublane prefix-sum on a (16, 1) column (in-block append ranks)
    cvec = jnp.ones((16, 1), jnp.float32)

    def k_colprefix(c_ref, o_ref):
        a2 = c_ref[:, :]
        si = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        for s in (1, 2, 4, 8):
            a2 = a2 + jnp.where(si >= s, pltpu.roll(a2, s, 0), 0.0)
        o_ref[:, :] = a2

    run("sublane prefix-sum (16,1)", k_colprefix,
        jax.ShapeDtypeStruct((16, 1), jnp.float32), cvec)
    return 0


if __name__ == "__main__":
    sys.exit(main())

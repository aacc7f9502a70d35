"""Pallas hamming table-scan kernel for tag decoding.

The XLA formulation of best_tag (ops/decode.py) materializes the
(B, T, 4, |family|) hamming-distance tensor in HBM (231 MB at the
default capacities for T36H11) just to immediately argmin-reduce it —
measured as the bulk of the decode pass cost. This kernel runs the
MXU matmul AND the min/argmin reduction per frame inside VMEM, so only
the (B, T*4) minima and indices ever touch HBM (~15x less traffic).

Semantics are exactly ops/decode.py's: ham = |bits| + |code| - 2*b.c
(values are small exact integers in f32), argmin takes the FIRST
minimum (reference best_tag scans the table in order,
src/detector.rs:142-169).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rots_ref, codes_ref, pops_ref, min_ref, idx_ref, *, n_codes):
    r = rots_ref[0]                      # (R, nbp) f32 0/1 bits
    c = codes_ref[:]                     # (Cp, nbp) f32 0/1 bits
    inner = jax.lax.dot_general(
        r, c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                    # (R, Cp)
    rsum = jnp.sum(r, axis=1, keepdims=True)
    # pops holds |code| for real codes and +inf-ish for the padding
    # columns so they can never win the min
    ham = rsum + pops_ref[:] - 2.0 * inner
    m = jnp.min(ham, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, ham.shape, 1)
    first = jnp.min(
        jnp.where(ham == m, lane, n_codes + 1), axis=1, keepdims=True
    )
    min_ref[0] = jnp.repeat(m, 128, axis=1)[:, :128]
    idx_ref[0] = jnp.repeat(first.astype(jnp.float32), 128, axis=1)[:, :128]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_scan(
    rots: jnp.ndarray,   # (B, R, nb) f32 0/1 LSB-first rotated bit rows
    codes: jnp.ndarray,  # (C, nb) f32 0/1 family code bits
    interpret: bool = False,
):
    """Per row: (min hamming over the table, FIRST argmin) — equivalent
    to argmin over ops/decode.py's `ham`, without the (B, R, C) HBM
    intermediate. Returns (min (B, R) f32, idx (B, R) int32)."""
    b, rr, nb = rots.shape
    cc = codes.shape[0]
    rp = -(-rr // 8) * 8
    nbp = -(-nb // 128) * 128
    cp = -(-cc // 128) * 128
    rots_p = jnp.zeros((b, rp, nbp), jnp.float32).at[:, :rr, :nb].set(rots)
    codes_p = jnp.zeros((cp, nbp), jnp.float32).at[:cc, :nb].set(codes)
    # padding rows (all-zero bits, pop forced huge) can never be the min
    pops = jnp.full((1, cp), 1e9, jnp.float32)
    pops = pops.at[0, :cc].set(jnp.sum(codes, axis=1))

    mins, idxs = pl.pallas_call(
        functools.partial(_kernel, n_codes=cc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rp, nbp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rp, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, rp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, rp, 128), jnp.float32),
        ),
        interpret=interpret,
    )(rots_p, codes_p, pops)
    return mins[:, :rr, 0], idxs[:, :rr, 0].astype(jnp.int32)

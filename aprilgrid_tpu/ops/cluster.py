"""Connected-component saddle clustering, shape-static for XLA.

The reference flood-fills each below-threshold response region with a
destructive stack BFS (pixel_bfs, src/image_util.rs:208-236; driver
src/detector.rs:171-187) and takes per-cluster centroids
(src/detector.rs:421-429). Flood fill is inherently sequential, so the
TPU recast is:

1. label each masked pixel with its linear index and relax to the
   component minimum via fixed rounds of 4-neighbor min-propagation plus
   pointer jumping (O(log diameter) convergence);
2. compact the component roots (pixels whose label is their own index) —
   ascending linear order, which equals the reference's scan-order cluster
   ordering (first cluster pixel encountered = minimum linear index);
3. centroid = per-component mean position via a compact scatter-add over
   the masked pixels only.

Everything is fixed capacity: at most ``max_clusters`` components and
``max_masked`` contributing pixels (overflow pixels are dropped, which
the bundled test set never hits — see Capacities in config.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Clusters(NamedTuple):
    centers: jnp.ndarray  # (MC, 2) float32 (x, y) centroids
    valid: jnp.ndarray    # (MC,) bool


def _min_neighbors(lab: jnp.ndarray, big) -> jnp.ndarray:
    up = jnp.pad(lab[:-1, :], ((1, 0), (0, 0)), constant_values=big)
    down = jnp.pad(lab[1:, :], ((0, 1), (0, 0)), constant_values=big)
    left = jnp.pad(lab[:, :-1], ((0, 0), (1, 0)), constant_values=big)
    right = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=big)
    return jnp.minimum(jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right)), lab)


def label_components(mask: jnp.ndarray, max_rounds: int = 64) -> jnp.ndarray:
    """Min-index labels of 4-connected components of ``mask``.

    Non-mask pixels carry the sentinel ``H*W``. Each round does three
    neighbor min-sweeps then one pointer jump; rounds repeat until a
    fixpoint (no label changed) or ``max_rounds``, whichever first. The
    bundled test set converges in <= ~10 rounds.
    """
    h, w = mask.shape
    hw = h * w
    big = jnp.int32(hw)
    idx = jnp.arange(hw, dtype=jnp.int32).reshape(h, w)
    init = jnp.where(mask, idx, big)

    def round_fn(lab):
        for _ in range(3):
            lab = jnp.where(mask, _min_neighbors(lab, big), big)
        flat = lab.ravel()
        jumped = flat[jnp.minimum(flat, hw - 1)]
        return jnp.where(mask, jnp.minimum(lab, jumped.reshape(h, w)), big)

    def cond(state):
        i, _, changed = state
        return changed & (i < max_rounds)

    def body(state):
        i, lab, _ = state
        new = round_fn(lab)
        return i + 1, new, jnp.any(new != lab)

    _, lab, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), init, jnp.bool_(True)))
    return lab


def cluster_centroids(
    resp: jnp.ndarray,
    threshold_ratio: float,
    max_clusters: int,
    max_masked: int,
    max_rounds: int,
) -> Clusters:
    """Centroids of {resp < ratio * min(resp)} components
    (src/detector.rs:414-429)."""
    thr = resp.min() * threshold_ratio
    mask = resp < thr
    lab = label_components(mask, max_rounds)
    return component_centroids(mask, lab, max_clusters, max_masked)


def component_centroids(
    mask: jnp.ndarray,
    lab: jnp.ndarray,
    max_clusters: int,
    max_masked: int,
    row_range: tuple | None = None,
) -> Clusters:
    """Per-component centroids from precomputed labels, in ascending
    root order (= the reference's scan-order cluster enumeration).

    ``row_range=(lo, hi)`` keeps only components whose ROOT row lies in
    [lo, hi) — the claiming rule for row-sharded windows: a blob's root
    (minimum linear index = topmost pixel) lies in exactly one shard's
    band, so every blob is claimed exactly once while halo rows provide
    the cross-boundary pixels for its centroid."""
    h, w = mask.shape
    hw = h * w
    flat_mask = mask.ravel()
    flat_lab = lab.ravel()
    root = flat_mask & (flat_lab == jnp.arange(hw, dtype=jnp.int32))
    if row_range is not None:
        rows = jnp.arange(hw, dtype=jnp.int32) // w
        root &= (rows >= row_range[0]) & (rows < row_range[1])

    (root_idx,) = jnp.nonzero(root, size=max_clusters, fill_value=hw)
    root_idx = root_idx.astype(jnp.int32)
    cluster_valid = root_idx < hw

    (masked_idx,) = jnp.nonzero(flat_mask, size=max_masked, fill_value=hw)
    masked_idx = masked_idx.astype(jnp.int32)
    pixel_valid = masked_idx < hw
    safe_idx = jnp.minimum(masked_idx, hw - 1)
    pix_lab = flat_lab[safe_idx]

    # map each pixel's root label to its compact cluster slot
    slot = jnp.searchsorted(root_idx, pix_lab)
    slot = jnp.minimum(slot, max_clusters - 1)
    hit = pixel_valid & (root_idx[slot] == pix_lab)
    slot = jnp.where(hit, slot, max_clusters)  # trash bin for misses

    x = (safe_idx % w).astype(jnp.float32)
    y = (safe_idx // w).astype(jnp.float32)
    one = hit.astype(jnp.float32)
    sums = jnp.zeros((max_clusters + 1, 3), jnp.float32)
    vals = jnp.stack([x * one, y * one, one], axis=-1)
    sums = sums.at[slot].add(vals)
    sums = sums[:max_clusters]

    cnt = jnp.maximum(sums[:, 2], 1.0)
    centers = jnp.stack([sums[:, 0] / cnt, sums[:, 1] / cnt], axis=-1)
    return Clusters(centers=centers, valid=cluster_valid & (sums[:, 2] > 0))

"""Prefix-sum / offset primitives.

TPU equivalents of the reference's L1 offset helpers (reference:
src/sort_utils.rs:10-31 ``get_prefix_sums`` / ``get_end_offsets``). These
operate on tiny (R,) or (T, R) count tables, so plain XLA ``cumsum`` is
already optimal — no kernel needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["exclusive_prefix_sum", "end_offsets", "tile_bucket_offsets"]


def exclusive_prefix_sum(counts: jax.Array, axis: int = -1) -> jax.Array:
    """Exclusive scan (get_prefix_sums, sort_utils.rs:10-20)."""
    return jnp.cumsum(counts, axis=axis) - counts


def end_offsets(counts: jax.Array, axis: int = -1) -> jax.Array:
    """Inclusive scan = one-past-the-end offsets (get_end_offsets,
    sort_utils.rs:23-31)."""
    return jnp.cumsum(counts, axis=axis)


def tile_bucket_offsets(tile_hists: jax.Array) -> jax.Array:
    """(T, R) per-tile counts -> (T, R) absolute output offsets.

    Bucket-major, tile-minor: ``off[t, d] = base[d] + sum_{t'<t} hist[t', d]``
    — the output layout of the reference's tiled stable scatter
    (mt_lsb_sort.rs:51-63): every (tile, bucket) cell owns a private,
    disjoint output range, which gives stability with no atomics.
    """
    counts = jnp.sum(tile_hists, axis=0)
    base = exclusive_prefix_sum(counts, axis=-1)
    within = exclusive_prefix_sum(tile_hists, axis=0)
    return base[None, :] + within

"""Pallas run-scatter: contiguous runs DMA'd to dynamic HBM offsets.

The TPU-native form of the reference's private-range scatter
(reference: src/mt_lsb_sort.rs:40-133 — each tile writes its elements
into per-(tile,digit) output ranges computed from histogram prefix sums;
no atomics because ranges are disjoint). On TPU the per-element loop
becomes one DMA descriptor per run: each grid step holds one input tile
in VMEM and issues ``d_runs`` dynamic-offset copies of a static run size
(`pltpu.make_async_copy`), offsets scalar-prefetched.

Measured (scripts/probe12.py P2, TPU v5e): 246-640 GB/s effective down to
512 B runs — near HBM speed-of-light; the scatter half of a radix pass is
free. The BINNING half (producing tile-contiguous equal-size runs) is the
structural wall that keeps a full radix pipeline off this hardware
(BENCH_NOTES.md round-2 analysis) — so this primitive's role is
fixed-geometry data movement: run-granular transposes / bucket-major
regrouping where run sizes are equal by construction (tile collation,
multi-chip bucket writeback staging).

Constraints (Mosaic DMA): offsets and sizes are in 128-lane ROW units;
run size is static; the element count must be a multiple of
``tile_elems`` and runs must tile the input exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rdst_tpu import config

__all__ = ["scatter_runs", "run_transpose"]

LANES = 128


def _kernel(off_ref, x_ref, o_hbm, sems, *, d_runs, rrows):
    t = pl.program_id(0)
    for d in range(d_runs):
        off = pl.multiple_of(off_ref[t * d_runs + d], rrows)
        pltpu.make_async_copy(
            x_ref.at[0, pl.ds(d * rrows, rrows), :],
            o_hbm.at[pl.ds(off, rrows), :],
            sems.at[d % 8],
        ).start()
        if d % 8 == 7 or d == d_runs - 1:
            lo = (d // 8) * 8
            for s in range(lo, d + 1):
                pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(0, rrows), :],
                    o_hbm.at[pl.ds(0, rrows), :],
                    sems.at[s % 8],
                ).wait()


@functools.partial(
    jax.jit, static_argnames=("tile_elems", "run_elems", "n_out")
)
def scatter_runs(
    x: jax.Array,
    row_offsets: jax.Array,
    *,
    tile_elems: int,
    run_elems: int,
    n_out: int | None = None,
) -> jax.Array:
    """Scatter ``x``'s runs to dynamic offsets.

    ``x``: flat uint32 array, length a multiple of ``tile_elems``; tile t
    consists of ``d_runs = tile_elems // run_elems`` consecutive runs.
    ``row_offsets``: (num_tiles * d_runs,) int32 — destination offset of
    each run IN 128-LANE ROW UNITS (i.e. element offset // 128), tile-major
    run-minor. Offsets must land runs disjointly. Returns the (n_out,)
    scattered array.
    """
    n = int(x.shape[0])
    if n % tile_elems or tile_elems % run_elems or run_elems % LANES:
        raise ValueError(
            "need run_elems % 128 == 0, tile_elems % run_elems == 0 and "
            "len(x) % tile_elems == 0"
        )
    n_out = n if n_out is None else n_out
    tiles = n // tile_elems
    d_runs = tile_elems // run_elems
    rrows = run_elems // LANES
    trows = tile_elems // LANES

    if config.pallas_interpret():
        # CPU/test path: identical semantics, XLA-level
        runs = x.reshape(tiles * d_runs, run_elems)
        out = jnp.zeros((n_out,), x.dtype).reshape(-1, LANES)
        for i in range(tiles * d_runs):
            out = jax.lax.dynamic_update_slice(
                out, runs[i].reshape(rrows, LANES),
                (row_offsets[i], jnp.int32(0)),
            )
        return out.reshape(n_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((1, trows, LANES), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
    )
    return pl.pallas_call(
        functools.partial(_kernel, d_runs=d_runs, rrows=rrows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(row_offsets.astype(jnp.int32),
      x.reshape(tiles, trows, LANES)).reshape(n_out)


def run_transpose(x: jax.Array, *, tile_elems: int, run_elems: int):
    """Run-granular (tile, run) -> (run, tile) transpose via scatter_runs —
    the bucket-major/tile-minor collation of mt_lsb_sort.rs:51-63 at run
    granularity (and probe12 P2's correctness fixture)."""
    n = int(x.shape[0])
    tiles = n // tile_elems
    d_runs = tile_elems // run_elems
    rrows = run_elems // LANES
    off = (
        np.arange(d_runs)[None, :] * (tiles * rrows)
        + np.arange(tiles)[:, None] * rrows
    ).astype(np.int32).reshape(-1)
    return scatter_runs(
        x, jnp.asarray(off), tile_elems=tile_elems, run_elems=run_elems
    )

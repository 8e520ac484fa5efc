"""Pallas fused bitonic merge: the low-memory plan's merge tree at VMEM speed.

The XLA-level bitonic merge (ops/merge.py) materializes every
compare-exchange stage through HBM: merging two sorted 2^23 halves costs
7.57 ns/el vs 2.18 for directly sorting 2^24 (probe12 P5), which is why
the chunked low-memory plan (sorts/regions.py — the TPU form of the
reference's Regions sort, regions_sort.rs:206-262) only engages under
real memory pressure.  This module removes that tax by fusing stages in
VMEM so the whole merge touches HBM O(log(n/B)) times instead of
O(log n):

  phase A  (element stride s >= block): one tiny pairwise kernel per
           stage.  The (n,) sequence is viewed as (n/2s, 2, s/128, 128)
           — a free row-major reshape — so each grid cell loads the two
           partner chunks with plain BlockSpecs, does one lexicographic
           compare-exchange, and streams back out.  Pure bandwidth.
  phase B  (all strides <= block/2): ONE kernel; each grid cell holds a
           full aligned block of B elements in VMEM as (B/128, 128) and
           runs every remaining stage locally — row strides via rolls on
           the sublane axis, sub-128 strides via rolls on the lane axis.

The merge phase of a bitonic network has uniform direction (min up), so
both kernels are mask+select over rolled copies; no data-dependent
control flow.  Reference behavior matched: the merge step of
regions_sort.rs:206-262 (and the same fused-merge idea serves the
distributed post-exchange combine if it ever beats a local re-sort).
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rdst_tpu import config

__all__ = ["bitonic_merge_fused", "fused_merge_available", "merge_level"]

LANES = 128
#: legacy phase-B block reference (elements); production blocks come
#: from pick_block (plane-count-scaled, probe24).
BLOCK = 1 << 17
#: phase-A chunk (elements) — two of these per plane live in VMEM per
#: grid cell (plus pipeline double-buffering).
CHUNK = 1 << 15


def rev_fast(p: jax.Array) -> jax.Array:
    """Reverse a flat array via a 2D double-axis rev.

    XLA's rev on one giant axis costs ~1.9 ns/el at 2^24 (probe18c R1);
    reversing both axes of the row-major (rows, 128) view is the same
    permutation expressed as a row shuffle + an in-row lane reversal,
    which lowers to near-bandwidth code (probe18d). Requires len % 128
    == 0; callers fall back to ``p[::-1]`` otherwise.
    """
    n = p.shape[0]
    return jax.lax.rev(p.reshape(n // LANES, LANES), (0, 1)).reshape(n)


def mosaic_params(grid_rank: int, interpret: bool) -> dict:
    """``pallas_call`` compiler params for this module's kernels.

    Scoped-VMEM limit: the default 16 MB sits exactly at the edge of the
    4-plane single-level tail sweep (register allocation nondeterminism
    flipped the same shape between compiling and a 16.22 MB OOM — round
    4 acceptance run); 64 MB gives headroom without changing geometry
    (v5e has 128 MB VMEM; probe24 V32/V64 validated raised limits).

    Dimension semantics: all grids here are embarrassingly parallel, but
    measurement says NOT to tell Mosaic so by default: at the production
    4 MB in+out block footprint, parallel semantics REGRESSES the tail
    level 73% (probe24: 0.086 -> 0.149 ns/el at 2^18 x 2 planes), while
    at half that footprint it was a ~5-13% win (probe23).
    RDST_TPU_PARALLEL_GRID=1 re-enables the hint for A/B."""
    if interpret:
        return {}
    kw = {"vmem_limit_bytes": 64 << 20}
    if os.environ.get("RDST_TPU_PARALLEL_GRID") == "1":
        kw["dimension_semantics"] = ("parallel",) * grid_rank
    return {"compiler_params": pltpu.CompilerParams(**kw)}


def sds_like(p):
    """ShapeDtypeStruct matching ``p`` including its varying-mesh-axes
    set, so the fused kernels compose with ``jax.shard_map``'s
    ``check_vma=True`` (the distributed shuffle's local sorts)."""
    vma = getattr(jax.typeof(p), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(p.shape, p.dtype, vma=vma)
    return jax.ShapeDtypeStruct(p.shape, p.dtype)


def _roll(p, k, axis):
    """Circular shift so result[i] = p[i + k] along ``axis`` (k > 0)."""
    dim = p.shape[axis]
    return pltpu.roll(p, (-k) % dim, axis)


def widen_plane(p: jax.Array):
    """Reinterpret a plane as the SAME-WIDTH unsigned integer; return
    ``(plane, restore_fn)``.  Since round 4 sub-32-bit planes stay
    narrow in HBM/VMEM (byte-proportional traffic, probe26) and the
    kernels widen to uint32 in registers only (Mosaic has no sub-32-bit
    rotate, probe25)."""
    dt = p.dtype
    size = np.dtype(dt).itemsize
    target = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[size]
    if dt == target:
        return p, lambda q: q
    return (
        jax.lax.bitcast_convert_type(p, target),
        lambda q: jax.lax.bitcast_convert_type(q, dt),
    )


def _kwiden(v):
    """Widen narrow planes to uint32 inside a kernel (zero-extension:
    order-preserving for unsigned keys; riders only move)."""
    return [
        p.astype(jnp.uint32) if p.dtype != jnp.uint32 else p for p in v
    ]


def _knarrow(v, dtypes):
    """Truncate back to the HBM dtypes at store time (exact: merge
    kernels never leave a plane's native domain)."""
    return [
        p.astype(dt) if p.dtype != dt else p for p, dt in zip(v, dtypes)
    ]


def _lex_gt(xs, ys):
    """x > y lexicographically over key planes (most significant first)."""
    gt = jnp.zeros(xs[0].shape, jnp.bool_)
    eq = jnp.ones(xs[0].shape, jnp.bool_)
    for x, y in zip(xs, ys):
        gt = gt | (eq & (x > y))
        eq = eq & (x == y)
    return gt


def _stage_kernel(*refs, n_keys):
    """Phase A: one compare-exchange between partner chunks.

    Each ref is (1, 2, rows, LANES): [:, 0] is the low partner, [:, 1]
    the high partner, at element distance s in the flat sequence.
    """
    n = len(refs) // 2
    ins, outs = refs[:n], refs[n:]
    lo = [r[0, 0] for r in ins]
    hi = [r[0, 1] for r in ins]
    dtypes = [p.dtype for p in lo]
    lo, hi = _kwiden(lo), _kwiden(hi)
    swap = _lex_gt(lo[:n_keys], hi[:n_keys])
    for l, h, o, dt in zip(lo, hi, outs, dtypes):
        o[0, 0] = jnp.where(swap, h, l).astype(dt)
        o[0, 1] = jnp.where(swap, l, h).astype(dt)


def _tail_kernel(*refs, n_keys, rows, row_strides, lane_strides):
    """Phase B: all remaining stages on one VMEM-resident block.

    Each ref is (1, rows, LANES); element index within the block is
    r * LANES + c, so an element stride of k*LANES is a row stride k and
    a stride < LANES stays within the lane dimension.
    """
    n = len(refs) // 2
    ins, outs = refs[:n], refs[n:]
    v = [r[0] for r in ins]
    dtypes = [p.dtype for p in v]
    v = _kwiden(v)

    def stage(v, k, axis):
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), axis)
        low_of_pair = (iota & k) == 0
        up = [_roll(p, k, axis) for p in v]
        dn = [_roll(p, -k, axis) for p in v]
        take_up = low_of_pair & _lex_gt(v[:n_keys], up[:n_keys])
        take_dn = (~low_of_pair) & _lex_gt(dn[:n_keys], v[:n_keys])
        return [
            jnp.where(take_up, u, jnp.where(take_dn, d, p))
            for p, u, d in zip(v, up, dn)
        ]

    for k in row_strides:
        v = stage(v, k, 0)
    for k in lane_strides:
        v = stage(v, k, 1)
    for p, o in zip(_knarrow(v, dtypes), outs):
        o[0] = p


def _pallas_stage(planes, n_elems, s, n_keys, interpret):
    """Run one stride-``s`` compare-exchange pass (phase A)."""
    ch = min(CHUNK, s)
    crows = ch // LANES
    pairs, per = n_elems // (2 * s), s // ch
    shaped = [p.reshape(pairs, 2, per * crows, LANES) for p in planes]
    spec = lambda: pl.BlockSpec(
        (1, 2, crows, LANES), lambda i, j: (i, 0, j, 0)
    )
    out = pl.pallas_call(
        functools.partial(_stage_kernel, n_keys=n_keys),
        grid=(pairs, per),
        in_specs=[spec() for _ in planes],
        out_specs=[spec() for _ in planes],
        out_shape=[sds_like(p) for p in shaped],
        interpret=interpret,
        **mosaic_params(2, interpret),
    )(*shaped)
    return [p.reshape(n_elems) for p in out]


def _pallas_tail(planes, n_elems, block, n_keys, interpret):
    """Run every stage with stride <= block/2 in one pass (phase B)."""
    rows = block // LANES
    nblk = n_elems // block
    shaped = [p.reshape(nblk, rows, LANES) for p in planes]
    row_strides = []
    k = block // 2
    while k >= LANES:
        row_strides.append(k // LANES)
        k //= 2
    lane_strides = [k for k in (64, 32, 16, 8, 4, 2, 1) if k <= block // 2]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _tail_kernel,
            n_keys=n_keys,
            rows=rows,
            row_strides=row_strides,
            lane_strides=lane_strides,
        ),
        grid=(nblk,),
        in_specs=[spec() for _ in planes],
        out_specs=[spec() for _ in planes],
        out_shape=[sds_like(p) for p in shaped],
        interpret=interpret,
        **mosaic_params(1, interpret),
    )(*shaped)
    return [p.reshape(n_elems) for p in out]


def pick_block(n_planes: int) -> int:
    """VMEM-resident block (elements): largest block with <= 2 MB of
    32-bit plane bytes per buffer (4 MB in+out; the next doubling fails
    Mosaic compile, and per-stage cost DROPS with depth until then —
    probe24: 18-stage 2-plane level 0.086 ns/el at 2^18 vs 0.126 at
    2^17, 19-stage 1-plane level 0.028 at 2^19)."""
    return (1 << 19) >> max(0, (n_planes - 1).bit_length())


def fused_merge_available(
    planes: Sequence[jax.Array], n_keys: int | None = None
) -> bool:
    """True when the fused path can take these planes.

    Requirements: total length a power of two and >= 2*LANES (so lane
    stages are well-formed), every plane a <= 32-bit non-bool integer
    (16/8-bit planes are widened for the kernel, an O(n) cost dwarfed by
    the merge win) or — for payload planes beyond ``n_keys`` — a 16/32-bit
    float (they ride through rolls/selects bit-exactly and never enter the
    lexicographic compare), a bounded plane count (VMEM), and either a
    real TPU backend or interpret mode forced (the interpreter is far too
    slow for production-size merges, mirroring the dense-emulation gate
    in parallel/shuffle.py).
    """
    n = int(planes[0].shape[0])
    if n < 2 * LANES or n & (n - 1):
        return False
    if len(planes) > 8:
        return False
    nk = len(planes) if n_keys is None else n_keys
    for i, p in enumerate(planes):
        dt = np.dtype(p.dtype)
        if dt.itemsize > 4 or dt.kind == "b":
            return False
        if i < nk and dt.kind not in "ui":
            return False
        if dt.kind == "f" and dt.itemsize < 2:
            return False
    if os.environ.get("RDST_TPU_FORCE_INTERPRET") not in (None, "0", "", "false"):
        return True
    return config.on_tpu() and not config.pallas_interpret()


def bitonic_merge_fused(
    z: Sequence[jax.Array], n_keys: int
) -> list[jax.Array]:
    """Sort a bitonic plane-list (concat of an ascending and a descending
    sorted run) with HBM-fused compare-exchange stages.

    ``z``: planes of equal power-of-two length n; the first ``n_keys``
    are the key (most significant first).  Callers build z exactly as
    ops/merge.py does: ``concat(a, b[::-1])`` per plane.
    """
    n = int(z[0].shape[0])
    interpret = config.pallas_interpret()
    wz = [widen_plane(p) for p in z]
    z = [p for p, _ in wz]
    blk = pick_block(len(z))
    s = n // 2
    while s >= max(blk, LANES * 2) and n > blk:
        z = _pallas_stage(z, n, s, n_keys, interpret)
        s //= 2
    z = _pallas_tail(z, n, min(blk, n), n_keys, interpret)
    return [r(p) for p, (_, r) in zip(z, wz)]


def merge_level(
    planes: Sequence[jax.Array], m: int, n_keys: int
) -> list[jax.Array]:
    """Merge every adjacent pair of sorted length-``m`` runs, batched.

    ``planes`` are flat with total length a multiple of 2m (a power of
    two); run i occupies ``[i*m, (i+1)*m)`` and every run is sorted.  All
    pairs merge in the SAME pallas calls: a bitonic stage of stride s
    only mixes elements within aligned 2s-blocks, and for s <= m those
    never cross a (power-of-two aligned) pair boundary — so one stage
    kernel over the whole array advances every pair at once.  This is the
    building block of the chunked fused-merge sort (sorts/fused_merge.py)
    and of merge_many's tree when runs are stacked flat.
    """
    n = int(planes[0].shape[0])
    interpret = config.pallas_interpret()
    wz = [widen_plane(p) for p in planes]
    z = []
    for p, _ in wz:
        v = p.reshape(-1, 2, m // LANES, LANES)
        r = jax.lax.rev(v[:, 1], (1, 2))
        z.append(jnp.stack([v[:, 0], r], axis=1).reshape(n))
    blk = pick_block(len(z))
    s = m
    while s >= max(blk, LANES * 2) and 2 * m > blk:
        z = _pallas_stage(z, n, s, n_keys, interpret)
        s //= 2
    z = _pallas_tail(z, n, min(blk, 2 * m), n_keys, interpret)
    return [r(p) for p, (_, r) in zip(z, wz)]

"""Reversal-free fused bitonic sort: the default dense executor on TPU.

The single-chip dense-sort ceiling was XLA's variadic sorting network
(~2.4 ns/el for 2 operand planes at 2^25).  probe18c decomposed the cost
of the chunked-merge alternative and found the Pallas compare-exchange
stage kernels run near HBM bandwidth at EVERY stride (0.03-0.06 ns/el);
what lost 2.8x in round 2 was the per-level data REVERSAL that the
textbook "merge two ascending runs" formulation requires (1.9 ns/el at
run=2^24).  This module implements the reversal-free design recorded in
BENCH_NOTES.md:

  phase 0   chunk rows sort with ALTERNATING directions: odd rows sort
            on bit-flipped keys (an elementwise XOR pre-pass) in ONE
            batched ``lax.sort`` — flipped-ascending IS descending, so
            concat(asc, desc) is directly bitonic and level 1 needs no
            data movement at all.  The un-flip is fused into the first
            merge kernel's loads.
  levels    bitonic merge levels with PARITY-MASKED directions: at the
            level producing runs of length 2R, output run q merges
            descending iff q is odd (mask = one XOR against the
            compare), so every level's output alternates asc/desc and
            no reversal ever touches HBM.  The final level's q is always
            0 — it comes out ascending with no special case.
  span      (element stride s >= block) multi-stride fusion: a grid
            cell gathers P strided pieces covering the interaction
            closure of log2(P) consecutive stages — the flat sequence
            viewed as (T/2s, P, u/w, w_rows, 128) so plain BlockSpecs
            express the gather — and retires all of them in ONE HBM
            round trip.
  tail      (element strides < block) ONE kernel holds an aligned block
            in VMEM as (block/128, 128) and runs every remaining stage
            of one or SEVERAL levels locally: row strides via sublane
            rolls, sub-128 strides via lane rolls (ops/pallas_merge.py's
            machinery, plus the per-element direction masks).

Stability: a uint32 global-index plane appended as the least significant
key makes the total order strict, so the network's unique output IS the
stable permutation — the reference's stable multithreaded workhorse
contract (reference: src/sorts/mt_lsb_sort.rs:40-133, lib.rs stability
docs).  The index plane also obviates the pad-marker plane: pads get
indices >= n and sort after every real element.  Unstable sorts with
payloads at non-pow2 lengths use a u8 pad marker instead, and it joins
only the FINAL piece's sort and last merge (round 4).

Narrow planes: u16/u8 key words and riders stay at native width in
HBM/VMEM (byte-proportional traffic, probe26) and widen to uint32 in
registers only — Mosaic has no sub-32-bit rotate (probe25); direction
complements XOR the narrow-width all-ones so flip domains match the
XLA-land native ``~`` bit-exactly.

Role equivalence: this replaces the radix core of the reference's
out_of_place_sort.rs:52-199 / mt_lsb_sort.rs:65-132 as the thing that
beats a plain comparison sort on dense inputs; a K-pass radix was
measured structurally unable to win on TPU (probe12, BENCH_NOTES.md).
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rdst_tpu import config
from rdst_tpu.ops.pallas_merge import (
    LANES, _lex_gt, _roll, mosaic_params, sds_like,
)

__all__ = ["fused_sort", "fused_sort_available", "MIN_ELEMS"]

#: Below this the direct network wins (crossover measured by probe19).
MIN_ELEMS = 1 << 21
#: Maximum next_pow2(n)/n ratio for the pad-to-pow2 path; above it the
#: piece-decomposition path (pad to a multiple of T/16, sort the binary
#: decomposition's pieces, virtual-pad bitonic merges — <= 1/15 padding)
#: replaces padding all the way to the power of two (up to ~2x work).
MAX_PAD_RATIO = 1.13
#: Phase-0 row length (elements): the batched lax.sort sweet spot is
#: ~4096-wide rows (probe7: 0.47 ns/el 1-op); log^2 growth makes longer
#: rows lose, shorter rows shift work into the (cheaper) tail levels.
ROW = 1 << 12
#: Plane-count ceiling: beyond this the shrunken VMEM block erodes the
#: fusion win and the direct network is safer.
MAX_PLANES = 8


def _log2(x: int) -> int:
    return int(x).bit_length() - 1


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pick_blocks(n_planes: int) -> tuple[int, int]:
    """(small, big) VMEM-resident blocks (elements).

    ``big`` is used by SINGLE-level tail sweeps and span cells: the
    largest block with <= 2 MB of 32-bit plane bytes per buffer.
    Measured (probe24): per-stage cost DROPS with depth — an 18-stage
    level at 2^18 x 2 planes costs 0.086 ns/el vs 0.126 at 2^17 and a
    19-stage 1-plane level at 2^19 costs 0.028 — and every level whose
    run fits in ``big`` needs NO span sweep at all.  The next doubling
    (8 MB in+out) fails Mosaic compile.

    ``small`` is used by the MULTI-level trip-1 kernel, whose longer
    stage program needs scoped-vmem stack on top of the buffers: the
    doubled sizes there exceed the 16 MB scoped limit (measured: trip-1
    at 2^19 x 1 plane wants 29.8 MB).  These are the production-proven
    round-2 sizes.  Plane counts, not bytes: narrow (u16/u8) planes ride
    smaller HBM/VMEM buffers but their in-register u32 temporaries — the
    scoped-vmem constraint — are width-independent."""
    big = (1 << 19) >> max(0, (n_planes - 1).bit_length())
    small = big >> (2 if n_planes == 1 else 1)
    return small, big


def _dir_stage(v, n_keys, k, axis):
    """One ASCENDING compare-exchange stage at distance ``k`` along
    ``axis`` of 2D planes (min of each pair to the low index).

    Descending runs are expressed by complementing the key planes around
    the ascending stages (``_flip_keys``) instead of XORing a direction
    mask into the compare: the mask form costs 2 extra vector ops PER
    STAGE plus their scoped-VMEM live buffers (measured: a scalar-desc
    18-stage level is 0.140-0.157 ns/el vs 0.086 for the pure-ascending
    program, and the mask buffers tip the big block past the 16 MB
    scoped-vmem compile limit), while a complement is 2 selects per
    LEVEL.  Tie pairs never swap (lex_gt is strict, and gt over
    complements equals lt exactly, ties included).
    """
    shape = v[0].shape
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    low = (iota & k) == 0
    up = [_roll(p, k, axis) for p in v]
    dn = [_roll(p, -k, axis) for p in v]
    # two lexicographic compares (one per pair half): a single compare
    # whose swap bit rolls from the low to the high index would be
    # cheaper, but Mosaic has no i1-vector roll lowering (measured:
    # remote-compile HTTP 500), so each half recomputes its strict
    # compare — consistent on ties because lex_gt is strict.
    take_up = low & _lex_gt(v[:n_keys], up[:n_keys])
    take_dn = (~low) & _lex_gt(dn[:n_keys], v[:n_keys])
    return [
        jnp.where(take_up, u, jnp.where(take_dn, d_, p))
        for p, u, d_ in zip(v, up, dn)
    ]


def _flip_keys(v, n_keys, mask, widths=None):
    """Complement the key planes where ``mask`` (scalar or per-element)
    is set.  An ascending merge of complemented keys IS the descending
    merge of the originals (lexicographic order over complements is the
    exact reverse, strict-tie behavior included); payload planes follow
    the same swaps either way.  ``mask`` must be uniform within each
    compare pair — guaranteed because a stage at element stride s only
    pairs elements within one output run (s <= R < 2R).

    ``widths``: per-plane HBM byte widths.  Planes narrower than 32 bits
    ride the kernels zero-extended to uint32 (Mosaic has no sub-32-bit
    rotate — probe25/26), so their complement is an XOR against the
    NARROW all-ones (0xFF/0xFFFF): that keeps flipped values inside the
    narrow domain, matching the XLA-land native ``~`` the phase-0 /
    piece paths apply, and truncates back exactly on store."""
    return [
        jnp.where(mask, p ^ _ones(None if widths is None else widths[j]),
                  p)
        if j < n_keys else p
        for j, p in enumerate(v)
    ]


def _ones(width=None) -> np.uint32:
    if width is None or width >= 4:
        return np.uint32(0xFFFFFFFF)
    return np.uint32((1 << (8 * width)) - 1)


def _kwiden(v):
    """Widen narrow planes to uint32 inside a kernel (zero-extension:
    order-preserving for the unsigned key planes; riders only move)."""
    return [
        p.astype(jnp.uint32) if p.dtype != jnp.uint32 else p for p in v
    ]


def _knarrow(v, dtypes):
    """Inverse of :func:`_kwiden` at store time (exact: every value is
    back in its narrow domain once direction flips are undone)."""
    return [
        p.astype(dt) if p.dtype != dt else p for p, dt in zip(v, dtypes)
    ]


def _level_stages(v, n_keys, start_stride):
    """All ascending stages of one merge level from element stride
    ``start_stride`` down to 1 on a VMEM-resident (rows, LANES) view."""
    s = start_stride
    while s >= LANES:
        v = _dir_stage(v, n_keys, s // LANES, 0)
        s //= 2
    while s >= 1:
        v = _dir_stage(v, n_keys, s, 1)
        s //= 2
    return v


def _tail_kernel(*refs, n_keys, block, levels, unflip_shift, widths):
    """Run one or more merge levels entirely inside a VMEM block.

    ``levels``: tuple of (log2(2R), start_stride) — each level's output
    run length and the largest element stride it still needs (R for
    levels fully inside the block, block/2 after a span pass handled the
    larger strides).  ``unflip_shift``: when set, key planes load XORed
    back to original encoding for odd phase-0 rows (log2 of the phase-0
    row length).  ``widths``: per-plane HBM byte widths — narrow planes
    ride VMEM narrow (half/quarter HBM traffic, probe26) and compute
    widened to uint32 in registers.
    """
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]  # (rows, LANES)
    dtypes = [p.dtype for p in v]
    v = _kwiden(v)
    rows = block // LANES
    i = pl.program_id(0)

    def elem_idx():
        # only materialized when a mask actually needs per-element
        # indices: the (rows, LANES) iota plus its derived masks cost
        # real scoped VMEM, and the common single-level tail sweep
        # (scalar block parity, no un-flip) fits the 16 MB scoped
        # budget at the big block ONLY without them.
        return (
            jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        )

    log_block = _log2(block)
    if unflip_shift is not None:
        flip = (((i * block + elem_idx()) >> unflip_shift) & 1) == 1
        v = [
            jnp.where(flip, p ^ _ones(widths[j]), p) if j < n_keys else p
            for j, p in enumerate(v)
        ]
    for log_2r, start in levels:
        if log_2r >= log_block:
            # whole block inside one output run: scalar parity
            desc = ((i >> (log_2r - log_block)) & 1) == 1
        else:
            desc = (((i * block + elem_idx()) >> log_2r) & 1) == 1
        v = _flip_keys(v, n_keys, desc, widths)
        v = _level_stages(v, n_keys, start)
        v = _flip_keys(v, n_keys, desc, widths)
    for p, o in zip(_knarrow(v, dtypes), outs):
        o[0] = p


def _tail_call(planes, n, block, n_keys, levels, unflip_shift, interpret):
    rows = block // LANES
    nblk = n // block
    shaped = [p.reshape(nblk, rows, LANES) for p in planes]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _tail_kernel,
            n_keys=n_keys,
            block=block,
            levels=tuple(levels),
            unflip_shift=unflip_shift,
            widths=tuple(np.dtype(p.dtype).itemsize for p in planes),
        ),
        grid=(nblk,),
        in_specs=[spec() for _ in planes],
        out_specs=[spec() for _ in planes],
        out_shape=[sds_like(p) for p in shaped],
        interpret=interpret,
        **mosaic_params(1, interpret),
    )(*shaped)
    return [p.reshape(n) for p in out]


def _span_kernel(*refs, n_keys, n_stages, w_rows, log_ratio, widths):
    """Phase A: ``n_stages`` consecutive large-stride stages in one trip.

    Each ref is (1, P, 1, w_rows, LANES): P strided pieces whose piece
    index c is exactly the stage-interaction bit field — a stage at
    element stride s_lo * 2^t is a compare-exchange at distance 2^t
    along c.  Collapsing (P, w_rows) into rows lets the sublane-roll
    stage machinery run unchanged.  Direction is scalar per cell: the
    cell's 2*s_hi span lies inside one output run of length 2R, whose
    index is program_id(0) >> log_ratio.
    """
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    a = pl.program_id(0)
    desc = ((a >> log_ratio) & 1) == 1
    p_dim = ins[0].shape[1]
    v = [r[0, :, 0].reshape(p_dim * w_rows, LANES) for r in ins]
    dtypes = [p.dtype for p in v]
    v = _kwiden(v)
    v = _flip_keys(v, n_keys, desc, widths)
    k = (p_dim // 2) * w_rows
    for _ in range(n_stages):
        v = _dir_stage(v, n_keys, k, 0)
        k //= 2
    v = _flip_keys(v, n_keys, desc, widths)
    for p, o in zip(_knarrow(v, dtypes), outs):
        o[0, :, 0] = p.reshape(p_dim, w_rows, LANES)


def _span_call(planes, n, s_hi, s_lo, two_r, block, n_keys, interpret):
    p_dim = (2 * s_hi) // s_lo
    w = block // p_dim
    w_rows = w // LANES
    w_cells = s_lo // w
    a_dim = n // (2 * s_hi)
    shaped = [
        p.reshape(a_dim, p_dim, w_cells, w_rows, LANES) for p in planes
    ]
    spec = lambda: pl.BlockSpec(
        (1, p_dim, 1, w_rows, LANES), lambda a, b: (a, 0, b, 0, 0)
    )
    out = pl.pallas_call(
        functools.partial(
            _span_kernel,
            n_keys=n_keys,
            n_stages=_log2(p_dim),
            w_rows=w_rows,
            log_ratio=_log2(two_r // (2 * s_hi)),
            widths=tuple(np.dtype(p.dtype).itemsize for p in planes),
        ),
        grid=(a_dim, w_cells),
        in_specs=[spec() for _ in planes],
        out_specs=[spec() for _ in planes],
        out_shape=[sds_like(p) for p in shaped],
        interpret=interpret,
        **mosaic_params(2, interpret),
    )(*shaped)
    return [p.reshape(n) for p in out]


def _norm_plane(p: jax.Array) -> tuple[jax.Array, Callable]:
    """Reinterpret a plane as a SAME-WIDTH unsigned integer; return the
    restoring inverse.  Unlike the pre-round-4 ``_widen``, sub-32-bit
    planes stay narrow: they ride the kernels' HBM/VMEM buffers at their
    native byte width (probe26: a u16 rider costs ~0.55x of a u32 one,
    u8 ~0.4x — byte-proportional, matching probe12 P4 for lax.sort) and
    are widened to uint32 only in registers (Mosaic has no sub-32-bit
    rotate — probe25)."""
    dt = p.dtype
    size = np.dtype(dt).itemsize
    target = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[size]
    if dt == target:
        return p, lambda q: q
    return (
        jax.lax.bitcast_convert_type(p, target),
        lambda q: jax.lax.bitcast_convert_type(q, dt),
    )


def fused_sort_available(
    words: Sequence[jax.Array],
    payloads: Sequence[jax.Array] = (),
    *,
    stable: bool = False,
) -> bool:
    """True when the fused executor can and should take this sort.

    Keys must be unsigned integer planes <= 32 bits (keys.py normalizes
    every key type to exactly that); payloads any non-bool <= 32-bit
    numeric (floats ride bit-cast).  Total plane count (including the
    stable index plane and a potential pad marker) is VMEM-bounded.
    Non-power-of-two lengths take the piece-decomposition path (sort
    power-of-two pieces, then virtual-pad bitonic merges), so no padding
    ratio gate is needed.
    """
    n = int(words[0].shape[0])
    if n < MIN_ELEMS:
        return False
    # unstable+payloads+non-pow2 needs a pad-marker key plane; rounds 2-3
    # gated it off because a u32 marker on every piece cost more than
    # lax.sort's ~1.3x non-pow2 penalty (0.232x vs 0.292x at 10M).  Round
    # 4 made the marker a u8 that joins ONLY the final piece and last
    # merge, flipping the measurement: fused 2.971 vs lax 3.467 ns/el at
    # 10M (probe27 marker) — the gate is gone.
    for p in words:
        dt = np.dtype(p.dtype)
        if dt.itemsize > 4 or dt.kind != "u":
            return False
    for p in payloads:
        dt = np.dtype(p.dtype)
        if dt.itemsize > 4 or dt.kind not in "uif":
            return False
        if dt.kind == "f" and dt.itemsize < 2:
            return False
    if len(words) + len(payloads) + 2 > MAX_PLANES:
        return False
    if os.environ.get("RDST_TPU_FORCE_INTERPRET") not in (
        None,
        "0",
        "",
        "false",
    ):
        return True
    return config.on_tpu() and not config.pallas_interpret()


def fused_sort(
    words: Sequence[jax.Array],
    payloads: Sequence[jax.Array] = (),
    *,
    stable: bool = False,
    row: int | None = None,
    block: int | None = None,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Sort key word planes (most significant first) + payload planes.

    Fully jittable: every decision (pad amount, level schedule, block
    sizes) is static in the input shape.
    """
    words = list(words)
    payloads = list(payloads)
    n = int(words[0].shape[0])
    nk = len(words)
    interpret = config.pallas_interpret()

    wk = [_norm_plane(p) for p in words]
    wp = [_norm_plane(p) for p in payloads]
    kplanes = [p for p, _ in wk]
    pplanes = [p for p, _ in wp]
    for p in kplanes:
        if not jnp.issubdtype(p.dtype, jnp.unsignedinteger):
            raise TypeError(
                f"fused_sort keys must normalize to unsigned planes, got "
                f"{p.dtype}"
            )

    T = _next_pow2(n)
    if T <= MAX_PAD_RATIO * n or T < (1 << 12):
        total, Q = T, None
    else:
        # piece decomposition: pad only to a multiple of the quantum
        # Q = T/16 (<= 1/15 overhead) instead of to T (up to ~2x), sort
        # the binary-decomposition pieces, virtual-pad-merge them.
        Q = T // 16
        total = -(-n // Q) * Q
        if total == T:
            Q = None
    pad = total - n
    if pad:
        kplanes = [
            jnp.concatenate(
                [p, jnp.full((pad,), np.iinfo(p.dtype).max, p.dtype)]
            )
            for p in kplanes
        ]
    planes = list(kplanes)
    n_keys = nk
    late_marker = False
    if stable:
        # strict total order => the unique network output is the stable
        # permutation; doubles as the pad marker (pad indices >= n).
        planes.append(jnp.arange(total, dtype=jnp.uint32))
        n_keys += 1
    elif pad and pplanes:
        # pads must not trade payloads with real all-ones keys; one BYTE
        # suffices (narrow planes ride at native width since round 4).
        # On the piece path the pads all live in the FINAL (smallest)
        # piece, so the marker joins only that piece's sort and the last
        # merge — the leading pieces (most of the data) sort marker-free.
        if Q is None:
            planes.append(
                jnp.concatenate(
                    [jnp.zeros((n,), jnp.uint8),
                     jnp.ones((pad,), jnp.uint8)]
                )
            )
            n_keys += 1
        else:
            late_marker = True
    if pad:
        pplanes = [
            jnp.concatenate([p, jnp.zeros((pad,), p.dtype)]) for p in pplanes
        ]
    planes += pplanes

    def finish(out):
        out = [p[:n] for p in out] if pad else list(out)
        if n_keys > nk:
            out = out[:nk] + out[nk + 1 :]
        return (
            [r(p) for p, (_, r) in zip(out[:nk], wk)],
            [r(p) for p, (_, r) in zip(out[nk:], wp)],
        )

    if block is not None:
        # test-only knob: derived big block stays inside the measured
        # VMEM ceiling (_pick_blocks) no matter what block is passed
        blk_s = block
        blk_b = min(
            block * (4 if len(planes) == 1 else 2),
            _pick_blocks(len(planes))[1],
        )
        blk_b = max(blk_b, blk_s)
    else:
        # a late marker adds one plane to the final piece and the last
        # merges; budget blocks for that count so the scoped-VMEM
        # invariant holds on every kernel invocation, not just most
        blk_s, blk_b = _pick_blocks(len(planes) + (1 if late_marker else 0))
    m = min(row or ROW, min(blk_s, total) // 2)
    if total < 2 * LANES or m < 2 or min(blk_s, total) < 2 * LANES:
        out = jax.lax.sort(tuple(planes), num_keys=n_keys, is_stable=False)
        return finish(out)

    if Q is None:
        planes = _core(planes, total, n_keys, blk_s, blk_b, m, interpret)
        return finish(planes)

    # piece path: sort each power-of-two piece (odd pieces descending via
    # key-complement), then fold right-to-left with virtual-pad ascending
    # bitonic merges — total work scales with M*Q, not next_pow2(n).
    M = total // Q
    pieces = []
    off = 0
    for bit in range(M.bit_length() - 1, -1, -1):
        if M & (1 << bit):
            pieces.append((off, (1 << bit) * Q))
            off += (1 << bit) * Q
    acc = _sort_piece(
        [p[: pieces[0][1]] for p in planes], n_keys, False, blk_s, blk_b,
        m, interpret,
    )
    la = pieces[0][1]
    for o, ln in pieces[1:]:
        sub = [p[o : o + ln] for p in planes]
        nk_piece = n_keys
        if late_marker and o + ln == total:
            # pads (global positions >= n) are all inside this piece
            sub = sub[:n_keys] + [
                jnp.concatenate(
                    [jnp.zeros((n - o,), jnp.uint8),
                     jnp.ones((total - n,), jnp.uint8)]
                )
            ] + sub[n_keys:]
            nk_piece += 1
        pc = _sort_piece(
            sub, nk_piece, True, blk_s, blk_b, m, interpret,
        )
        if nk_piece != n_keys:
            acc = acc[:n_keys] + [jnp.zeros((la,), jnp.uint8)] + (
                acc[n_keys:]
            )
            n_keys = nk_piece
        acc = [jnp.concatenate([a, b]) for a, b in zip(acc, pc)]
        la += ln
        acc = _merge_asc_desc(acc, la, Q, n_keys, blk_b, interpret)
    return finish(acc)


def _core(planes, T, n_keys, blk_s, blk_b, m, interpret):
    """The power-of-two fused network: phase-0 sorted ``blk_s`` blocks
    (batched ``lax.sort`` rows + trip-1 merge tail), then parity-masked
    merge levels.  Levels whose run fits in ``blk_b`` are ONE
    single-level tail sweep (no span); larger levels take span trip(s)
    for strides >= blk_b plus one tail sweep.

    The alternative phase-0 — the full in-VMEM bitonic network of every
    level up to the block in one kernel sweep (round 2's "in-VMEM block
    sort") — was built and REFUTED by A/B at production geometry
    (scripts/probe29.py, BENCH_NOTES round 4): it loses 1.4-1.6x at 2^22
    across 1-3 planes and only ties at 2^25 x 1 plane, because the
    batched lax.sort rows retire the first ~12 levels at 0.46-0.86 ns/el
    while the in-kernel network pays the measured ~0.0073 ns/el/stage
    VPU bound for all of them."""
    blk_s = min(blk_s, T)
    blk_b = min(blk_b, T)
    m = min(m, blk_s // 2)
    log_m, log_bs, log_bb, log_t = (
        _log2(m), _log2(blk_s), _log2(blk_b), _log2(T),
    )

    # phase 0: alternating-direction chunk rows in one batched sort
    gid = jnp.arange(T, dtype=jnp.uint32)
    flip = ((gid >> np.uint32(log_m)) & np.uint32(1)) == 1
    planes = [
        jnp.where(flip, ~p, p) if j < n_keys else p
        for j, p in enumerate(planes)
    ]
    rows2 = [p.reshape(T // m, m) for p in planes]
    srt = jax.lax.sort(tuple(rows2), dimension=1, num_keys=n_keys,
                       is_stable=False)
    planes = [p.reshape(T) for p in srt]

    # trip 1: un-flip + all levels up to run length == blk_s, in VMEM
    levels = [
        (l2r, 1 << (l2r - 1)) for l2r in range(log_m + 1, log_bs + 1)
    ]
    planes = _tail_call(
        planes, T, blk_s, n_keys, levels, unflip_shift=log_m,
        interpret=interpret,
    )

    # levels above blk_s: span trip(s) for strides R..blk_b (none when
    # the run fits in blk_b), then ONE single-level tail sweep at blk_b.
    # Span fan-in is capped so each cell keeps w_rows >= 8 (a full
    # sublane tile): at 2^28 an uncapped p_dim=1024 leaves w_rows=2,
    # whose T(2,128) relayout blows the 16 MB scoped-vmem limit
    # (measured: bench --sweep round 4); one extra trip is cheap.
    max_span = max(1, _log2(blk_b // LANES) - 3)
    for log_r in range(log_bs, log_t):
        two_r = 1 << (log_r + 1)
        hi = log_r
        while hi >= log_bb:
            lo = max(log_bb, hi - max_span + 1)
            planes = _span_call(
                planes, T, 1 << hi, 1 << lo, two_r, blk_b, n_keys,
                interpret,
            )
            hi = lo - 1
        planes = _tail_call(
            planes, T, blk_b, n_keys,
            [(log_r + 1, min(blk_b // 2, 1 << log_r))], None, interpret,
        )
    return planes


#: Pieces below this sort via the direct network (the fused crossover,
#: probe19); pieces at or above it run the power-of-two core.
MIN_PIECE = 1 << 20


def _sort_piece(planes, n_keys, descending, blk_s, blk_b, m, interpret):
    """Sort one power-of-two piece; ``descending`` complements the key
    planes around an ascending sort (lexicographic order over complements
    is the exact reverse), producing the desc-run operand the virtual-pad
    bitonic merge needs WITHOUT any data reversal."""
    ln = int(planes[0].shape[0])
    if descending:
        planes = [~p if j < n_keys else p for j, p in enumerate(planes)]
    if ln >= MIN_PIECE and min(blk_s, ln) >= 2 * LANES and m >= 2:
        out = _core(list(planes), ln, n_keys, blk_s, blk_b, m, interpret)
    else:
        out = list(
            jax.lax.sort(tuple(planes), num_keys=n_keys, is_stable=False)
        )
    if descending:
        out = [~p if j < n_keys else p for j, p in enumerate(out)]
    return out


def _stage_ranges(s: int, p: int, nR: int) -> list[tuple[int, int]]:
    """Active index runs of one virtual-pad merge stage, in REAL coords:
    ``{j in [0, nR-s) : ((j+p) & s) == 0}`` as maximal [start, end) runs
    (p = virtual front-pad count, s = stage stride; all python ints)."""
    out = []
    x = (p // (2 * s)) * (2 * s)
    while x < p + nR - s:
        lo = max(x - p, 0)
        hi = min(x + s - p, nR - s)
        if hi > lo:
            out.append((lo, hi))
        x += 2 * s
    return out


def _slice_stage(planes, n_keys, s, p, nR):
    """One ascending compare-exchange stage at stride ``s`` of the
    virtual-pad merge, as static contiguous slices + minmax + concat —
    the formulation XLA streams near-bandwidth (unlike interleaved
    reshape stages, probe12 P5, or axis reversals, probe18c)."""
    from rdst_tpu.ops.merge import _lex_greater

    ranges = _stage_ranges(s, p, nR)
    if not ranges:
        return planes
    segs = [[] for _ in planes]
    pos = 0
    for a, b in ranges:
        lo = [pl[a:b] for pl in planes]
        hi = [pl[a + s : b + s] for pl in planes]
        swap = _lex_greater(lo[:n_keys], hi[:n_keys])
        for i, pl in enumerate(planes):
            if pos < a:
                segs[i].append(pl[pos:a])
            segs[i].append(jnp.where(swap, hi[i], lo[i]))
            if b < a + s:
                segs[i].append(pl[b : a + s])
            segs[i].append(jnp.where(swap, lo[i], hi[i]))
        pos = b + s
    for i, pl in enumerate(planes):
        if pos < nR:
            segs[i].append(pl[pos:nR])
    return [
        jnp.concatenate(sg) if len(sg) > 1 else sg[0] for sg in segs
    ]


def _merge_asc_desc(planes, nR, Q, n_keys, blk, interpret):
    """Ascending bitonic merge of [run A asc, run B desc] = ``planes``
    (total nR, a multiple of the quantum Q; A/B any lengths).

    Correctness: prepend p = next_pow2(nR) - nR VIRTUAL -inf pads; the
    padded array is bitonic and pads never move under ascending stages
    (a mixed pair always has the pad at the LOW index), so the classic
    pow2 merge network restricted to the real region — pairs (j, j+s)
    active iff ((j+p) & s) == 0 — sorts the real data in place.  Stages
    with stride >= Q run as XLA slice stages (their active sets are a few
    contiguous runs); below Q, p and nR are multiples of 2s, the masks
    reduce to the local pairing, and the existing span/tail kernels
    finish the job in one or two HBM round trips.
    """
    T = _next_pow2(nR)
    p = T - nR
    s = T // 2
    while s >= Q:
        planes = _slice_stage(planes, n_keys, s, p, nR)
        s //= 2
    blk_m = min(blk, Q)
    log_b = _log2(blk_m)
    max_span = max(1, _log2(max(blk_m // LANES, 2)) - 3)
    hi = _log2(Q) - 1
    while hi >= log_b:
        lo = max(log_b, hi - max_span + 1)
        planes = _span_call(
            planes, nR, 1 << hi, 1 << lo, 2 * T, blk_m, n_keys, interpret
        )
        hi = lo - 1
    start = min(blk_m, Q) // 2
    planes = _tail_call(
        planes, nR, blk_m, n_keys, [(_log2(T) + 1, start)], None, interpret
    )
    return planes

"""Distributed table pipeline: shuffle sort + aggregate + filter over a mesh.

BASELINE.json config 5: "Distributed MSB shuffle sort + hash aggregate +
filter pipeline over hash-partitioned tables on N>=2 hosts". Tables are
sharded row-wise over the mesh axis; operators compose:

  * ``distributed_sort_table``   — global ORDER BY via the MSB shuffle
    (rdst order parity: device-major concatenation is the sorted table).
  * ``distributed_filter``       — embarrassingly parallel local filter
    (shard_map, no exchange), packed-left with per-device counts.
  * ``distributed_group_aggregate`` — shuffle rows by group key (the
    hash/range partition step; every group lands on exactly one device),
    then local sort-based aggregation. Matches the reference's
    bucket-parallel recursion shape (SURVEY.md §2.3): partition once,
    finish locally with zero further communication.
"""
from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rdst_tpu import keys as _keys
from rdst_tpu.builder import _encode_payload, _has_64bit_keys, _x64_enabled
from rdst_tpu.parallel.shuffle import distributed_sort, partition_exchange


def _hash_plane(words):
    """Deterministic 32-bit mix of the key word planes.

    The same pure function on every table => equal keys always collide,
    which is all hash co-partitioning needs. Fibonacci-multiplicative
    mix with an avalanche shift per word; full 32-bit output entropy, so
    the shuffle's entropy-adaptive window draws all 16 bucket bits from
    it and DISTINCT keys spread uniformly across devices regardless of
    range clustering (BASELINE config 5's "hash-partitioned tables").
    """
    h = None
    for w in words:
        w = jnp.asarray(w)
        h = w if h is None else h ^ w
        h = h * np.uint32(0x9E3779B1)
        h = h ^ jnp.right_shift(h, np.uint32(15))
    return h
from rdst_tpu.table.table import Table
from rdst_tpu.table import ops as tops

__all__ = [
    "distributed_sort_table",
    "distributed_filter",
    "distributed_group_aggregate",
    "distributed_join",
]


def _encode_table(table: Table, by):
    """Normalize key columns + encode the rest as payload words."""
    by = [by] if isinstance(by, str) else list(by)
    fields = tuple(table.column(c) for c in by)
    nk = _keys.normalize(fields if len(fields) > 1 else fields[0])
    other = [c for c in table.column_names if c not in by]
    enc = [(c, _encode_payload(table.column(c))) for c in other]
    payload_words = [w for _, (ws, _) in enc for w in ws]
    return by, nk, other, enc, payload_words


def _decode_table(by, nk, other, enc, out_words, out_payloads):
    out_nk = _keys.NormalizedKeys(tuple(out_words), nk.n_bytes, nk.meta)
    if _has_64bit_keys(nk) and not _x64_enabled():
        sorted_keys = _keys.denormalize_host(out_nk)
    else:
        sorted_keys = _keys.denormalize(out_nk)
    if len(by) == 1:
        sorted_keys = (sorted_keys,)
    cols = dict(zip(by, sorted_keys))
    i = 0
    for name, (ws, decode) in enc:
        k = len(ws)
        cols[name] = decode(list(out_payloads[i : i + k]))
        i += k
    return cols


def distributed_sort_table(
    table: Table,
    by,
    *,
    mesh: Mesh,
    axis: str = "shard",
    capacity_factor: float = 1.5,
    stable: bool = True,
    overlap_exchange: bool = False,
):
    """Global ORDER BY over the mesh. Returns (Table of D*capacity rows in
    device-major order, per-device valid counts)."""
    by, nk, other, enc, payload_words = _encode_table(table, by)
    words, payloads, counts = distributed_sort(
        list(nk.words),
        payload_words,
        mesh=mesh,
        axis=axis,
        capacity_factor=capacity_factor,
        stable=stable,
        overlap_exchange=overlap_exchange,
    )
    cols = _decode_table(by, nk, other, enc, words, payloads)
    ordered = {c: cols[c] for c in table.column_names}
    return Table(ordered), counts


def distributed_filter(table: Table, mask, *, mesh: Mesh, axis: str = "shard"):
    """Local (no-exchange) filter on every shard; rows packed left per
    shard with a per-device count. Equivalent to the reference's
    data-parallel tiling (SURVEY.md §2.3 row 1)."""
    names = table.column_names
    enc = [(c, _encode_payload(table.column(c))) for c in names]
    payload_words = [w for _, (ws, _) in enc for w in ws]
    mask_w = jnp.asarray(mask).astype(jnp.uint32)

    def body(maskw, *planes):
        pred = jnp.where(maskw != 0, np.uint8(0), np.uint8(1))
        out = jax.lax.sort(
            (pred,) + tuple(planes), num_keys=1, is_stable=True
        )
        cnt = jnp.sum(maskw, dtype=jnp.int32)
        return out[1:] + (cnt[None],)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in range(1 + len(payload_words))),
        out_specs=tuple(P(axis) for _ in range(len(payload_words) + 1)),
    )
    sharding = NamedSharding(mesh, P(axis))
    args = [jax.device_put(mask_w, sharding)] + [
        jax.device_put(w, sharding) for w in payload_words
    ]
    out = fn(*args)
    counts = out[-1]
    planes = list(out[:-1])
    cols = {}
    i = 0
    for name, (ws, decode) in enc:
        k = len(ws)
        cols[name] = decode(planes[i : i + k])
        i += k
    return Table(cols), counts


def _agg_body(axis, n_keys, plan, *arrs):
    """shard_map body: per-device segment reduction + boundary combine.

    ``arrs`` = key word planes (first ``n_keys``, locally sorted, valid
    rows packed first), then one decoded value plane per entry of
    ``plan.value_cols`` (None entries consume nothing), then per-value
    normalized order words (for min/max), then the (1,) valid count.

    The distributed analog of the reference's per-bucket parallel finish
    (recombinating_sort.rs:68-88): every device reduces its resident
    segments; groups spanning a device boundary (possible when the shuffle
    rank-splits a single-key bucket) are combined via an all_gather of
    per-device first-group partials — the owner is the FIRST device
    holding any of the group's rows, which by global sortedness absorbs
    exactly the consecutive run of following devices whose first key
    matches its last key.
    """
    arrs = list(arrs)
    kw = arrs[:n_keys]
    nvals = len(plan.val_specs)
    vals = arrs[n_keys : n_keys + nvals]
    norm_words = arrs[n_keys + nvals : -1]
    cnt = arrs[-1][0].astype(jnp.int32)
    n = kw[0].shape[0]
    me = jax.lax.axis_index(axis)
    D = jax.lax.psum(1, axis)

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    valid = pos < cnt
    diff = jnp.zeros((n,), jnp.bool_)
    for w in kw:
        diff = diff | (w != jnp.roll(w, 1))
    starts = valid & ((pos == 0) | diff)
    G = jnp.sum(starts.astype(jnp.int32))
    # pack group start positions (stable partition; cf. table/ops.py)
    gstart = jax.lax.sort(
        (jnp.where(starts, np.uint8(0), np.uint8(1)), pos),
        num_keys=1, is_stable=True,
    )[1]
    gidx = pos
    gnext = jnp.roll(gstart, -1)
    gend = jnp.where(gidx == G - 1, cnt - 1, gnext - 1)
    gend = jnp.clip(gend, 0, n - 1)

    has = cnt > 0
    fkw = jnp.stack([w[0] for w in kw])  # (nk,)
    lkw = jnp.stack([w[jnp.clip(cnt - 1, 0, n - 1)] for w in kw])

    # --- local partials, packed by group slot -------------------------
    def seg_sum(c, acc_dt):
        m = jnp.where(valid, c.astype(acc_dt), jnp.zeros((), acc_dt))
        acc = jnp.cumsum(m)
        ends = jnp.take(acc, gend)
        st = jnp.where(
            gstart > 0,
            jnp.take(acc, jnp.maximum(gstart - 1, 0)),
            jnp.zeros((), acc_dt),
        )
        return ends - st

    sizes = (gend - gstart + 1).astype(jnp.int32)
    packed: dict = {}
    vsorted_cache: dict = {}
    ni = 0
    for vi, (out_name, op, acc_dt) in enumerate(plan.val_specs):
        c = vals[vi]
        if op == "count":
            packed[out_name] = sizes
        elif op in ("sum", "mean"):
            s = seg_sum(c, acc_dt)
            if op == "sum":
                packed[out_name] = s
            else:
                packed[out_name] = s.astype(jnp.float32) / jnp.maximum(
                    sizes, 1
                ).astype(jnp.float32)
                packed[out_name + "\0sum"] = s
        elif op == "first":
            packed[out_name] = jnp.take(c, gstart)
        elif op == "last":
            packed[out_name] = jnp.take(c, gend)
        elif op in ("min", "max"):
            nw = plan.norm_widths[vi]
            key = (vi,)
            if key not in vsorted_cache:
                vnorm = norm_words[ni : ni + nw]
                validity = jnp.where(valid, np.uint32(0), np.uint32(1))
                vsorted_cache[key] = jax.lax.sort(
                    tuple([validity] + kw + vnorm + [c]),
                    num_keys=1 + n_keys + nw,
                    is_stable=True,
                )[-1]
            vs = vsorted_cache[key]
            idx = gstart if op == "min" else gend
            packed[out_name] = jnp.take(vs, idx)
        ni += plan.norm_widths[vi]

    # --- boundary combine ---------------------------------------------
    g_has = jax.lax.all_gather(has, axis)  # (D,)
    g_fkw = jax.lax.all_gather(fkw, axis)  # (D, nk)
    g_lkw = jax.lax.all_gather(lkw, axis)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0).squeeze(-1)

    def keys_eq(a, b):  # (D, nk) vs (nk,) -> (D,)
        return jnp.all(a == b[None, :], axis=1)

    suppressed = has & jnp.any(
        (d_iota < me) & g_has & keys_eq(g_lkw, fkw)
    )
    contrib = (d_iota > me) & g_has & keys_eq(g_fkw, lkw) & has

    first_partials = {
        k: jax.lax.all_gather(jnp.take(v, jnp.int32(0)), axis)
        for k, v in packed.items()
    }
    last_slot = jnp.clip(G - 1, 0, n - 1)
    for vi, (out_name, op, acc_dt) in enumerate(plan.val_specs):
        fp = first_partials[out_name]
        if op in ("sum", "count"):
            add = jnp.sum(jnp.where(contrib, fp, jnp.zeros((), fp.dtype)))
            packed[out_name] = packed[out_name].at[last_slot].add(
                add.astype(packed[out_name].dtype)
            )
        elif op == "mean":
            fs = first_partials[out_name + "\0sum"]
            fc = jax.lax.all_gather(
                jnp.take(sizes, jnp.int32(0)), axis
            )
            s = jnp.take(packed[out_name + "\0sum"], last_slot) + jnp.sum(
                jnp.where(contrib, fs, jnp.zeros((), fs.dtype))
            )
            c2 = jnp.take(sizes, last_slot) + jnp.sum(
                jnp.where(contrib, fc, 0)
            )
            packed[out_name] = packed[out_name].at[last_slot].set(
                s.astype(jnp.float32) / jnp.maximum(c2, 1).astype(jnp.float32)
            )
        elif op in ("min", "max"):
            red = jnp.min if op == "min" else jnp.max
            cur = jnp.take(packed[out_name], last_slot)
            nw = plan.norm_widths[vi]
            sentinel = plan.sentinels[vi][0 if op == "min" else 1]
            best = red(
                jnp.where(contrib, fp, jnp.full((), sentinel, fp.dtype))
            )
            packed[out_name] = packed[out_name].at[last_slot].set(
                red(jnp.stack([cur, best]))
            )
        elif op == "last":
            e = jnp.max(jnp.where(contrib, d_iota, -1))
            new = jnp.where(
                e >= 0, jnp.take(fp, jnp.clip(e, 0, D - 1)),
                jnp.take(packed[out_name], last_slot),
            )
            packed[out_name] = packed[out_name].at[last_slot].set(new)
        # 'first': owner's value already correct

    # also carry sizes for downstream count consistency? (count handled)
    shift = suppressed.astype(jnp.int32)
    out_count = G - shift
    out_keys = [jnp.roll(jnp.take(w, gstart), -shift) for w in kw]
    outs = tuple(out_keys) + tuple(
        jnp.roll(packed[name], -shift) for name, _, _ in plan.val_specs
    )
    return outs + (out_count[None],)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "n_keys", "plan", "n_out")
)
def _agg_jit(arrs, mesh, axis, n_keys, plan, n_out):
    body = functools.partial(_agg_body, axis, n_keys, plan)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in range(len(arrs))),
        out_specs=tuple(P(axis) for _ in range(n_out)),
    )
    return fn(*arrs)


class _AggPlan:
    """Static per-call aggregation plan (hashable for jit)."""

    def __init__(self, val_specs, norm_widths, sentinels):
        self.val_specs = tuple(val_specs)  # (out_name, op, acc_dtype)
        self.norm_widths = tuple(norm_widths)  # words of order-norm per val
        self.sentinels = tuple(sentinels)  # (min_identity, max_identity)

    def __hash__(self):
        return hash((self.val_specs, self.norm_widths, self.sentinels))

    def __eq__(self, other):
        return (
            isinstance(other, _AggPlan)
            and self.val_specs == other.val_specs
            and self.norm_widths == other.norm_widths
            and self.sentinels == other.sentinels
        )


def distributed_group_aggregate(
    table: Table,
    by,
    aggs: Mapping[str, tuple[str, str]],
    *,
    mesh: Mesh,
    axis: str = "shard",
    capacity_factor: float = 1.5,
    overlap_exchange: bool = False,
    partition: str = "range",
):
    """Shuffle-then-local GROUP BY, finished entirely inside the mesh.

    The shuffle range-partitions rows by the group key; each device then
    segment-reduces its resident rows in a single ``shard_map`` (sum/count
    via the cumsum-difference trick, min/max via a value-keyed local sort),
    and groups that straddle a device boundary — possible when the shuffle
    rank-splits a single-key bucket — are combined with an all_gather of
    per-device first-group partials (see :func:`_agg_body`). numpy appears
    only at the API boundary to densify the per-device outputs.
    Returns (Table of group rows, n_groups).

    ``partition="hash"`` shuffles by a leading 32-bit key hash instead
    of key range (BASELINE config 5's hash-partitioned aggregate):
    distinct group keys spread uniformly regardless of range clustering;
    output group rows arrive hash-ordered rather than key-ordered.
    """
    by_list = [by] if isinstance(by, str) else list(by)
    for out_name, (col, op) in aggs.items():
        if op not in ("sum", "count", "mean", "min", "max", "first", "last"):
            raise ValueError(f"unsupported agg op {op!r}")
    if partition not in ("range", "hash"):
        raise ValueError("partition must be 'range' or 'hash'")
    nkw_shift = 1 if partition == "hash" else 0

    # 1. shuffle rows by group key; value columns ride as payload words.
    # A value column that is ALSO a group key rides under an alias so it
    # still arrives as a decodable payload plane.
    need_cols = sorted({c for c, _ in aggs.values() if c is not None})
    alias = {c: (c + "\0v" if c in by_list else c) for c in need_cols}
    sub_cols = {c: table.column(c) for c in by_list}
    for c in need_cols:
        sub_cols[alias[c]] = table.column(c)
    sub = Table(sub_cols)
    by2, nk, other, enc, payload_words = _encode_table(sub, by_list)
    shuffle_words = list(nk.words)
    if nkw_shift:
        shuffle_words = [_hash_plane(nk.words)] + shuffle_words
    words, payloads, counts = distributed_sort(
        shuffle_words, payload_words, mesh=mesh, axis=axis,
        capacity_factor=capacity_factor, stable=True,
        overlap_exchange=overlap_exchange,
    )
    cnts = np.asarray(counts)
    D = cnts.shape[0]
    cap = words[0].shape[0] // D
    if (cnts > cap).any():
        raise OverflowError("shuffle capacity exceeded; raise capacity_factor")

    # 2. decode value planes (traceable decoders) & build the static plan
    dec_cols = {}
    i = 0
    for name, (ws, decode) in enc:
        k = len(ws)
        dec_cols[name] = decode(list(payloads[i : i + k]))
        i += k
    x64 = jax.config.jax_enable_x64
    val_specs, val_arrays, norm_planes, norm_widths, sentinels = (
        [], [], [], [], []
    )
    for out_name, (col, op) in aggs.items():
        if col is None or op == "count":
            c = jnp.zeros((words[0].shape[0],), jnp.int32)
        else:
            c = dec_cols[alias[col]]
        dt = np.dtype(c.dtype)
        if op in ("sum", "mean"):
            if jnp.issubdtype(c.dtype, jnp.integer) or dt == np.bool_:
                acc = jnp.int64 if x64 else jnp.uint32
            else:
                acc = jnp.float64 if x64 else jnp.float32
        else:
            acc = jnp.int32
        val_specs.append((out_name, op, np.dtype(acc).name))
        val_arrays.append(c)
        if op in ("min", "max"):
            vnk = _keys.normalize(c)
            norm_planes.extend(vnk.words)
            norm_widths.append(vnk.n_words)
            if dt == np.bool_:
                sentinels.append((1, 0))
            elif dt.kind in "iu":
                info = np.iinfo(dt)
                sentinels.append((int(info.max), int(info.min)))
            else:
                info = np.finfo(dt)
                sentinels.append((float(info.max), float(info.min)))
        else:
            norm_widths.append(0)
            sentinels.append((0, 0))
    plan = _AggPlan(
        [(n_, o_, a_) for n_, o_, a_ in val_specs], norm_widths,
        tuple(map(tuple, sentinels)),
    )

    # 3. in-mesh segment reduction + boundary combine (jitted; the plan
    # tuple is the static cache key so repeated calls with equal shapes
    # reuse the compiled program)
    sharding = NamedSharding(mesh, P(axis))
    args = tuple(
        jax.device_put(a, sharding)
        for a in list(words) + val_arrays + norm_planes
    ) + (jax.device_put(jnp.asarray(counts).astype(jnp.int32), sharding),)
    nkw_a = nk.n_words + nkw_shift  # group-key planes incl. hash lead
    out = _agg_jit(args, mesh, axis, nkw_a, plan,
                   nkw_a + len(val_specs) + 1)
    out_kw = out[nkw_shift:nkw_a]
    out_aggs = out[nkw_a : nkw_a + len(val_specs)]
    gcounts = np.asarray(out[-1])

    # 4. API boundary: densify per-device valid group rows (numpy)
    def dens(plane):
        p = np.asarray(plane).reshape(D, -1)
        return np.concatenate([p[d, : gcounts[d]] for d in range(D)])

    dense_kw = [dens(w) for w in out_kw]
    out_nk = _keys.NormalizedKeys(
        tuple(jnp.asarray(w) for w in dense_kw), nk.n_bytes, nk.meta
    )
    if _has_64bit_keys(nk) and not _x64_enabled():
        key_vals = _keys.denormalize_host(out_nk)
    else:
        key_vals = _keys.denormalize(out_nk)
    if len(by_list) == 1:
        key_vals = (key_vals,)
    cols = dict(zip(by_list, key_vals))
    for (out_name, op, _), plane in zip(plan.val_specs, out_aggs):
        v = dens(plane)
        if op == "count":
            v = v.astype(np.int32)
        cols[out_name] = v
    n_groups = int(gcounts.sum())
    return Table(cols), jnp.int32(n_groups)


def _join_body(axis, nkw, n_lpay, n_rpay, out_cap, how, *arrs):
    """shard_map body: per-device sort-merge join of co-partitioned sides.

    ``arrs`` = left key words (nkw) + left payload words (n_lpay) +
    left count (1,) + right key words (nkw) + right payload words
    (n_rpay) + right count (1,). Both sides arrive from the exchange with
    their valid prefix sorted by key. Probe = bounded lexicographic
    binary search (tops._lex_searchsorted with the valid-prefix bound);
    inner joins expand duplicate right matches into a static
    ``out_cap``-row buffer (overflow detectable from the returned count —
    same contract as the shuffle's capacity).
    """
    arrs = list(arrs)
    lw = arrs[:nkw]
    lpay = arrs[nkw : nkw + n_lpay]
    lcnt = arrs[nkw + n_lpay][0].astype(jnp.int32)
    roff = nkw + n_lpay + 1
    rw = arrs[roff : roff + nkw]
    rpay = arrs[roff + nkw : roff + nkw + n_rpay]
    rcnt = arrs[roff + nkw + n_rpay][0].astype(jnp.int32)
    lcap = lw[0].shape[0]
    rcap = rw[0].shape[0]

    lo = tops._lex_searchsorted(rw, lw, side="left", bound=rcnt)
    hi = tops._lex_searchsorted(rw, lw, side="right", bound=rcnt)
    pos = jax.lax.broadcasted_iota(jnp.int32, (lcap, 1), 0).squeeze(-1)
    lvalid = pos < lcnt
    matched = lvalid & (hi > lo)

    if how == "left":
        ri = jnp.clip(lo, 0, max(rcap - 1, 0))
        outs = list(lw) + list(lpay) + [
            jnp.where(matched, jnp.take(p, ri, mode="clip"), p.dtype.type(0))
            for p in rpay
        ] + [matched.astype(jnp.uint32)]
        n_matched = jnp.sum(matched.astype(jnp.int32))
        return tuple(outs) + (lcnt[None], n_matched[None])

    mult = jnp.where(matched, hi - lo, 0)
    offs = jnp.cumsum(mult)
    total = offs[lcap - 1]
    j = jax.lax.broadcasted_iota(jnp.int32, (out_cap, 1), 0).squeeze(-1)
    li = jnp.searchsorted(offs, j, side="right").astype(jnp.int32)
    li = jnp.clip(li, 0, lcap - 1)
    k = j - jnp.take(offs - mult, li)
    ri = jnp.clip(jnp.take(lo, li) + k, 0, max(rcap - 1, 0))
    ovalid = j < total
    outs = [
        jnp.where(ovalid, jnp.take(p, li, mode="clip"),
                  p.dtype.type(0xFFFFFFFF))
        for p in list(lw)
    ] + [
        jnp.where(ovalid, jnp.take(p, li, mode="clip"), p.dtype.type(0))
        for p in list(lpay)
    ] + [
        jnp.where(ovalid, jnp.take(p, ri, mode="clip"), p.dtype.type(0))
        for p in rpay
    ]
    return tuple(outs) + (total[None], total[None])


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "nkw", "n_lpay", "n_rpay", "out_cap", "how", "n_out"
    ),
)
def _join_jit(arrs, mesh, axis, nkw, n_lpay, n_rpay, out_cap, how, n_out):
    body = functools.partial(
        _join_body, axis, nkw, n_lpay, n_rpay, out_cap, how
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in range(len(arrs))),
        out_specs=tuple(P(axis) for _ in range(n_out)),
    )
    return fn(*arrs)


def distributed_join(
    left: Table,
    right: Table,
    on,
    *,
    mesh: Mesh,
    axis: str = "shard",
    how: str = "inner",
    suffix: str = "_r",
    capacity_factor: float = 1.5,
    right_capacity_factor: float | None = None,
    join_capacity_factor: float = 1.0,
    overlap_exchange: bool = False,
    partition: str = "range",
):
    """Distributed sort-merge equi-join, finished entirely inside the mesh
    (duplicate right keys expand for ``how="inner"``; ``how="left"`` takes
    the first match — :func:`rdst_tpu.table.ops.join` semantics).

    Both sides are co-partitioned by the SAME range partition (SURVEY.md
    §7 step 7: "partition both sides by the same MSB shuffle"): the left
    table's shuffle derives an entropy-adaptive partition with
    device-atomic buckets (``split_uniform=False`` — equal keys must not
    straddle devices), the right table routes through
    ``partition_exchange`` with that partition, and every device joins its
    resident slices in one ``shard_map`` (:func:`_join_body`). numpy
    appears only at the API boundary to densify/decode.

    ``join_capacity_factor`` sizes each device's inner-join output buffer
    as a multiple of its left capacity; 1.0 covers any unique-right-key
    (pk-fk) join, duplicates may need more (OverflowError signals it).

    Skew note: co-partitioning requires device-ATOMIC buckets (equal
    keys of both sides must meet on one device), so the shuffle's
    single-key rank-splitting and hot-bucket refinement are disabled
    here by construction; a heavily skewed join key concentrates its
    bucket on one device and needs ``capacity_factor`` headroom (the
    OverflowError demand signal still applies). Small right sides are
    immune: they get full-table per-device capacity
    (config.replicate_capacity_max).

    ``partition="hash"`` prepends a deterministic 32-bit key hash as the
    leading shuffle word on BOTH sides: distinct keys spread uniformly
    across devices even when they cluster in one key range (the atomic-
    bucket concentration above), at the cost of hash-ordered rather than
    key-ordered per-device residency. Equal keys still meet (equal
    hash), and the local sort-merge matches on the (hash, key)
    composite.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if partition not in ("range", "hash"):
        raise ValueError("partition must be 'range' or 'hash'")
    on_list = [on] if isinstance(on, str) else list(on)
    if right_capacity_factor is None:
        right_capacity_factor = capacity_factor
    nkw_shift = 1 if partition == "hash" else 0

    by, nk, other, enc, payload_words = _encode_table(left, on_list)
    shuffle_words = list(nk.words)
    if nkw_shift:
        shuffle_words = [_hash_plane(nk.words)] + shuffle_words
    words, payloads, counts, part = distributed_sort(
        shuffle_words, payload_words, mesh=mesh, axis=axis,
        capacity_factor=capacity_factor, stable=True,
        split_uniform=False, return_partition=True,
        overlap_exchange=overlap_exchange,
    )

    rby, rnk, rother, renc, rpayload_words = _encode_table(right, on_list)
    if rnk.n_words != nk.n_words:
        raise TypeError(
            "join key dtypes must normalize to the same width on both sides"
        )
    rshuffle_words = list(rnk.words)
    if nkw_shift:
        rshuffle_words = [_hash_plane(rnk.words)] + rshuffle_words
    rwords, rpayloads, rcounts = partition_exchange(
        rshuffle_words, rpayload_words, part, mesh=mesh, axis=axis,
        capacity_factor=right_capacity_factor, stable=True,
        overlap_exchange=overlap_exchange,
    )

    D = mesh.devices.size
    lcap = words[0].shape[0] // D
    rcap = rwords[0].shape[0] // D
    if (np.asarray(counts) > lcap).any() or (np.asarray(rcounts) > rcap).any():
        raise OverflowError("shuffle capacity exceeded; raise capacity_factor")
    out_cap = max(int(np.ceil(join_capacity_factor * lcap)), 16)
    # the join body matches on every arriving key plane — including the
    # leading hash plane under partition="hash" (equal keys <=> equal
    # (hash, key) composite)
    nkw = nk.n_words + nkw_shift
    n_lpay, n_rpay = len(payloads), len(rpayloads)
    sharding = NamedSharding(mesh, P(axis))
    args = tuple(
        list(words) + list(payloads)
        + [jax.device_put(jnp.asarray(counts).astype(jnp.int32), sharding)]
        + list(rwords) + list(rpayloads)
        + [jax.device_put(jnp.asarray(rcounts).astype(jnp.int32), sharding)]
    )
    n_out = nkw + n_lpay + n_rpay + (1 if how == "left" else 0) + 2
    out = _join_jit(args, mesh, axis, nkw, n_lpay, n_rpay, out_cap, how,
                    n_out)
    out = list(out)
    jcounts = np.asarray(out[-2])  # rows per device in the output buffer
    matches = int(np.asarray(out[-1]).sum())
    planes = out[:-2]
    if how == "inner" and (jcounts > out_cap).any():
        raise OverflowError(
            f"join output overflow: a device produced {int(jcounts.max())} "
            f"rows > capacity {out_cap}; raise join_capacity_factor"
        )

    def dens(plane):
        p = np.asarray(plane).reshape(D, -1)
        return np.concatenate([p[d, : jcounts[d]] for d in range(D)])

    out_kw = [jnp.asarray(dens(w)) for w in planes[nkw_shift:nkw]]
    out_nk = _keys.NormalizedKeys(tuple(out_kw), nk.n_bytes, nk.meta)
    if _has_64bit_keys(nk) and not _x64_enabled():
        key_vals = _keys.denormalize_host(out_nk)
    else:
        key_vals = _keys.denormalize(out_nk)
    if len(on_list) == 1:
        key_vals = (key_vals,)
    cols = dict(zip(on_list, key_vals))
    i = nkw
    for name, (ws, decode) in enc:  # left non-key columns
        kws = len(ws)
        cols[name] = decode([jnp.asarray(dens(p))
                             for p in planes[i : i + kws]])
        i += kws
    for name, (ws, decode) in renc:  # right non-key columns
        kws = len(ws)
        out_name = name + (suffix if name in left.column_names else "")
        cols[out_name] = decode([jnp.asarray(dens(p))
                                 for p in planes[i : i + kws]])
        i += kws
    if how == "left":
        cols["_matched"] = dens(planes[i]).astype(bool)
    order = [c for c in left.column_names] + [
        (name + (suffix if name in left.column_names else ""))
        for name, _ in renc
    ] + (["_matched"] if how == "left" else [])
    return Table({c: cols[c] for c in order}), matches

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

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rdst_tpu import keys as _keys
from rdst_tpu.builder import _encode_payload, _has_64bit_keys, _x64_enabled
from rdst_tpu.parallel.shuffle import distributed_sort, partition_exchange
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
    capacity_factor: float = 2.0,
    stable: bool = True,
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


def distributed_group_aggregate(
    table: Table,
    by,
    aggs: Mapping[str, tuple[str, str]],
    *,
    mesh: Mesh,
    axis: str = "shard",
    capacity_factor: float = 2.0,
):
    """Shuffle-then-local GROUP BY.

    The shuffle range-partitions rows by the group key, so each group is
    wholly resident on one device and no combine step is needed (exactly
    one output row per group globally). v1 densifies the shuffled table on
    the host before the final segment reduction — the expensive phase
    (sort + exchange) is fully distributed; the boundary reduction is a
    single-device pass. Returns (Table of group rows, n_groups).
    """
    sorted_t, counts = distributed_sort_table(
        table,
        by,
        mesh=mesh,
        axis=axis,
        capacity_factor=capacity_factor,
        stable=True,
    )
    # densify per-device valid slices (host), then aggregate locally —
    # rows are globally sorted by group key so groups are contiguous.
    by_list = [by] if isinstance(by, str) else list(by)
    cols = {}
    cnts = np.asarray(counts)
    D = cnts.shape[0]
    for name in sorted_t.column_names:
        col = np.asarray(sorted_t.column(name)).reshape(D, -1)
        if (cnts > col.shape[1]).any():
            raise OverflowError(
                "shuffle capacity exceeded; raise capacity_factor"
            )
        cols[name] = np.concatenate(
            [col[d, : cnts[d]] for d in range(D)]
        )
    dense = Table(cols)
    out, n_groups = tops.group_aggregate(dense, by_list, aggs)
    return out, n_groups


def _densify(table: Table, counts) -> list[Table]:
    """Per-device dense Table slices from capacity-padded columns."""
    cnts = np.asarray(counts)
    D = cnts.shape[0]
    cols = {}
    for name in table.column_names:
        col = np.asarray(table.column(name)).reshape(D, -1)
        if (cnts > col.shape[1]).any():
            raise OverflowError(
                "shuffle capacity exceeded; raise capacity_factor"
            )
        cols[name] = col
    return [
        Table({k: v[d, : cnts[d]] for k, v in cols.items()}) for d in range(D)
    ]


def distributed_join(
    left: Table,
    right: Table,
    on,
    *,
    mesh: Mesh,
    axis: str = "shard",
    how: str = "inner",
    suffix: str = "_r",
    capacity_factor: float = 2.0,
    right_capacity_factor: float | None = None,
):
    """Distributed sort-merge equi-join (``right`` keys unique, pk-fk).

    Both sides are co-partitioned by the SAME range partition (SURVEY.md
    §7 step 7: "partition both sides by the same MSB shuffle"): the left
    table's shuffle derives an entropy-adaptive partition with
    device-atomic buckets (``split_uniform=False`` — equal keys must not
    straddle devices), the right table is routed through
    ``partition_exchange`` with that partition, and per-device local
    joins concatenate to the exact global join. v1 densifies per-device
    slices on the host for the local joins, like
    :func:`distributed_group_aggregate` — the expensive phases (two sorts
    + two exchanges) are fully distributed.

    Returns ``(Table, match_count)`` with :func:`rdst_tpu.table.ops.join`
    semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on_list = [on] if isinstance(on, str) else list(on)
    if right_capacity_factor is None:
        right_capacity_factor = capacity_factor

    by, nk, other, enc, payload_words = _encode_table(left, on_list)
    words, payloads, counts, part = distributed_sort(
        list(nk.words), payload_words, mesh=mesh, axis=axis,
        capacity_factor=capacity_factor, stable=True,
        split_uniform=False, return_partition=True,
    )
    left_cols = _decode_table(by, nk, other, enc, words, payloads)
    left_sh = Table({c: left_cols[c] for c in left.column_names})
    left_parts = _densify(left_sh, counts)

    rby, rnk, rother, renc, rpayload_words = _encode_table(right, on_list)
    if rnk.n_words != nk.n_words:
        raise TypeError(
            "join key dtypes must normalize to the same width on both sides"
        )
    rwords, rpayloads, rcounts = partition_exchange(
        list(rnk.words), rpayload_words, part, mesh=mesh, axis=axis,
        capacity_factor=right_capacity_factor, stable=True,
    )
    right_cols = _decode_table(rby, rnk, rother, renc, rwords, rpayloads)
    right_sh = Table({c: right_cols[c] for c in right.column_names})
    right_parts = _densify(right_sh, rcounts)

    pieces: list[Table] = []
    total = 0
    for lt, rt in zip(left_parts, right_parts):
        if lt.n_rows == 0:
            continue
        if rt.n_rows == 0:
            if how == "inner":
                continue
            # left join against an empty right shard: fill right columns
            cols = {c: np.asarray(lt.column(c)) for c in lt.column_names}
            for name in right.column_names:
                if name in on_list:
                    continue
                out_name = name + (
                    suffix if name in left.column_names else ""
                )
                cols[out_name] = np.zeros(
                    lt.n_rows, dtype=np.asarray(right.column(name)).dtype
                )
            cols["_matched"] = np.zeros(lt.n_rows, dtype=bool)
            pieces.append(Table(cols))
            continue
        jt, cnt = tops.join(lt, rt, on_list, how=how, suffix=suffix)
        total += int(cnt)
        if how == "inner":
            # tops.join keeps static length (matched rows packed first);
            # truncate so the concatenation is densely packed
            jt = Table(
                {
                    c: np.asarray(jt.column(c))[: int(cnt)]
                    for c in jt.column_names
                }
            )
        pieces.append(jt)
    if not pieces:
        # empty result with the joined schema
        jt, _ = tops.join(left, right, on_list, how=how, suffix=suffix)
        schema = jt.column_names
        return Table(
            {c: np.asarray(jt.column(c))[:0] for c in schema}
        ), 0
    names = pieces[0].column_names
    out = Table(
        {
            c: np.concatenate([np.asarray(p.column(c)) for p in pieces])
            for c in names
        }
    )
    return out, total

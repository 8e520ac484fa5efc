"""MSB bucketed plans: partition by the top byte, then batched bucket sorts.

TPU re-design of the reference's MSB family — ``Ska`` (in-place bucket
scatter, ska_sort.rs:72-112), ``MtOop`` (one out-of-place MSB pass then
recursion, mt_lsb_sort.rs:197-235), ``Recombinating`` (tile sorts + bucket
gather, recombinating_sort.rs:44-112) and ``Scanning`` (huge-input MSB
scatter, scanning_sort.rs:91-241). Their shared shape: one most-significant
partition, then independent per-bucket work.

On TPU the data-dependent per-bucket recursion becomes a static-shape
batched program:

  1. stable partition by the top byte (a one-operand-key sorting-network
     pass) — bucket boundaries come from the already-known histogram,
  2. pad buckets to the max bucket size via vmapped dynamic slices
     ((256, cap) layout, cheap static-size extraction),
  3. ONE batched sort over all bucket rows — rows of n/256 elements sort
     ~2-5x faster per element than one big sort (measured: 0.47 ns/el at
     4096 rows vs 2.44 ns/el full, scripts/probe3.py),
  4. ragged DMA writeback of the valid prefixes (ops/ragged_concat).

Stability: row pads start at the row tail and the batched sort is stable,
so pads stay behind equal real keys; valid prefixes are exact.

Skew: a dominant bucket makes cap ~ n and the padding blows up — the
tuners already route skewed inputs elsewhere (standard_tuner.rs:20-43);
``bucketed_sort`` also self-checks and falls back to the comparative plan
when padding would exceed ``max_expansion``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rdst_tpu import config
from rdst_tpu.ops.ragged_concat import ragged_concat_multi
from rdst_tpu.sorts.comparative import comparative_sort

__all__ = ["bucketed_sort"]

RADIX = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _trace_fallback(reason: str) -> None:
    # the sorter's pick trace has already printed the bucketed algorithm
    # name; make the degrade visible under work_profiles so nobody
    # benchmarks the wrong plan (reference trace style, sorter.rs:78-79)
    if config.work_profiles_enabled():
        print(f"(msb) FALLBACK: Comparative ({reason})")


def bucketed_sort(
    words: Sequence[jax.Array],
    payloads: Sequence[jax.Array],
    counts: np.ndarray | None,
    *,
    stable: bool = False,
    max_expansion: float = 1.8,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Top-byte partition + batched per-bucket sorts + ragged writeback."""
    words = list(words)
    payloads = list(payloads)
    n = int(words[0].shape[0])
    if counts is None:
        return comparative_sort(words, payloads, stable=stable)
    if n > config.max_bucketed_elements:
        # compile-time guard: the padded-bucket graph's compile cost grows
        # steeply with n (config.max_bucketed_elements)
        _trace_fallback(
            f"n={n} > max_bucketed_elements={config.max_bucketed_elements}"
        )
        return comparative_sort(words, payloads, stable=stable)
    top = counts[-1]  # most significant level histogram
    cap = _round_up(max(int(top.max()), 8), 8)
    if cap * RADIX > max_expansion * n:
        # skewed / tiny buckets: padding too costly — comparative fallback
        _trace_fallback(f"padding {cap * RADIX}/{n} > {max_expansion}x")
        return comparative_sort(words, payloads, stable=stable)

    # 1. stable partition by top byte (a 1-key-operand network pass; the
    # remaining planes ride as payloads). The MSB level sits at byte
    # (L-1) % 4 of the first word (keys are right-aligned in words).
    L = counts.shape[0]
    shift = np.uint32(((L - 1) % 4) * 8)
    top_byte = ((words[0] >> shift) & np.uint32(0xFF)).astype(jnp.uint8)
    part = jax.lax.sort(
        (top_byte,) + tuple(words) + tuple(payloads),
        num_keys=1,
        is_stable=True,
    )
    part_planes = list(part[1:])

    # 2. pad buckets into (256, cap) rows
    lengths = jnp.asarray(top.astype(np.int32))
    starts = jnp.asarray(
        (np.cumsum(top) - top).astype(np.int32)
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, (RADIX, cap), 1)
    valid = pos < lengths[:, None]

    def extract(plane, fill):
        padded = jnp.concatenate(
            [plane, jnp.full((cap,), fill, plane.dtype)]
        )

        def row(s):
            return jax.lax.dynamic_slice(padded, (s,), (cap,))

        rows = jax.vmap(row)(starts)
        return jnp.where(valid, rows, fill)

    n_words = len(words)
    bucket_rows = [
        extract(p, np.uint32(0xFFFFFFFF) if i < n_words else np.uint32(0))
        for i, p in enumerate(part_planes)
    ]

    # 3. one batched stable sort over all bucket rows (stability keeps row
    # pads behind equal real all-ones keys)
    srt = jax.lax.sort(
        tuple(bucket_rows), num_keys=n_words, dimension=1, is_stable=True
    )

    # 4. ragged writeback of valid prefixes (bucket-major = sorted order)
    out = ragged_concat_multi(list(srt), lengths, n)
    return out[:n_words], out[n_words:]

"""Comparative sort plan: XLA's variadic sort over normalized word planes.

Role-equivalent of the reference's comparison fallback (reference:
src/sorts/comparative_sort.rs:5-51): the reference packs up to 16 radix
levels into accumulator integers and calls ``sort_unstable_by``; we hand the
normalized word planes to ``jax.lax.sort`` as multiple keys (most
significant first). XLA lowers this to its tuned TPU sorting network — the
right tool below the sizes where radix passes win, and the correctness
anchor for every other plan.

Unlike the reference (which only uses this for <=128 items, sorter.rs:35-38)
this plan is usable at any size — and at large unstable sizes it routes
through the chunked fused-merge executor (sorts/fused_merge.py): the
network's cost grows with log^2(n), so capping it at chunk size and
merging with the Pallas fused bitonic kernels is measured faster than one
big network call (probe17/probe18).  Stable sorts and small/CPU cases
stay on the direct lax.sort path.
"""
from __future__ import annotations

from typing import Sequence

import jax

__all__ = ["comparative_sort"]


def comparative_sort(
    words: Sequence[jax.Array],
    payloads: Sequence[jax.Array] = (),
    *,
    stable: bool = False,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Sort word planes (most significant first) + payloads via lax.sort."""
    words = list(words)
    payloads = list(payloads)
    if not stable:
        from rdst_tpu.sorts.fused_merge import (
            fused_merge_sort,
            fused_sort_available,
        )

        if fused_sort_available(words, payloads):
            return fused_merge_sort(words, payloads)
    operands = tuple(words) + tuple(payloads)
    out = jax.lax.sort(operands, num_keys=len(words), is_stable=stable)
    return list(out[: len(words)]), list(out[len(words):])

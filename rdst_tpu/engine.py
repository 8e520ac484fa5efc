"""Jittable static-plan sort entry points.

The Sorter (rdst_tpu.sorter) is the tuner-driven dispatcher with a host
sync for histogram inspection — the reference's architecture. This module
is the fully-jittable path used inside larger jitted programs (distributed
shuffle, table ops, benchmarks): the plan is chosen statically.

``sort_words`` is the single-chip workhorse; the Pallas radix plans
register here as they land and take over from the lax.sort baseline by
size/width heuristics mirroring the tuner ladders.
"""
from __future__ import annotations

from typing import Sequence

import jax

from rdst_tpu.sorts.comparative import comparative_sort

__all__ = ["sort_words"]


def sort_words(
    words: Sequence[jax.Array],
    payloads: Sequence[jax.Array] = (),
    *,
    stable: bool = False,
    plan: str = "auto",
):
    """Sort uint32 word planes (most significant first) + payloads.

    Fully traceable/jittable: no host syncs, static plan selection.
    """
    if plan in ("auto", "comparative"):
        return comparative_sort(words, payloads, stable=stable)
    if plan == "lowmem":
        from rdst_tpu.sorts.regions import chunked_sort

        return chunked_sort(words, payloads, stable=stable)
    raise ValueError(f"unknown plan {plan!r}")

"""Comparative sort plan: XLA's variadic sort over normalized word planes.

Role-equivalent of the reference's comparison fallback (reference:
src/sorts/comparative_sort.rs:5-51): the reference packs up to 16 radix
levels into accumulator integers and calls ``sort_unstable_by``; we hand the
normalized word planes to ``jax.lax.sort`` as multiple keys (most
significant first). XLA lowers this to its tuned TPU sorting network — the
right tool below the sizes where radix passes win, and the correctness
anchor for every other plan.

Unlike the reference (which only uses this for <=128 items, sorter.rs:35-38)
this plan is usable at any size: on TPU the sorting network is a serious
baseline (~350M u32 el/s measured) that the Pallas radix plans must beat.
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
    operands = tuple(words) + tuple(payloads)
    out = jax.lax.sort(operands, num_keys=len(words), is_stable=stable)
    return list(out[: len(words)]), list(out[len(words):])

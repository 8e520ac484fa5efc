"""Chunked network sort + Pallas fused merge tree.

The single-chip dense-sort ceiling was the variadic sorting network:
probe12 established that XLA-level merging loses to direct lax.sort
(7.57 vs 2.18 ns/el) because every bitonic stage materializes through
HBM.  The Pallas fused merge (ops/pallas_merge.py) removes that tax —
measured on v5e (probe17 M1): sorting two 2^23 halves and fused-merging
them costs 0.689 ns/el vs 1.034 for one direct 2^24 lax.sort.  The
network's cost grows with log^2(n); chunking caps the network at
log^2(m) and pays one near-bandwidth merge level per doubling.

Plan shape (the TPU-native answer to the reference's merge-free radix
recursion — role of recombinating_sort.rs's two-phase pipeline):

  1. pad to k equal power-of-two chunks of length m,
  2. ONE batched lax.sort over the (k, m) rows (the measured-fast
     batched row-sort shape, probe7),
  3. log2(k) fused merge levels, each one Pallas pass (+ one reversal
     pass) over the whole array.

Unstable only: a stable variant would thread a tiebreak plane through
every level (extra operand in the chunk sort and every merge); the
stable contract stays on the measured lax.sort path.

Padding rule: pad keys are all-ones sentinels that sort to the tail and
are sliced off.  If payloads ride along AND pads are needed, a 1-word
marker plane (0=real, 1=pad) is appended as the least-significant key so
real elements with all-ones keys cannot trade payloads with pads; the
marker costs one extra operand only in that case.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rdst_tpu import config
from rdst_tpu.ops.pallas_merge import LANES, merge_level

__all__ = ["fused_merge_sort", "fused_sort_available", "pick_chunk"]

#: Measured crossover (probe18): below this the direct network wins.
MIN_ELEMS = 1 << 22
#: Chunk length target. log^2 scaling favors small chunks, merge levels
#: cost ~0.1-0.2 ns/el each; 2^21-2^23 is the measured sweet spot.
CHUNK_TARGET = 1 << 22


def fused_sort_available(words, payloads) -> bool:
    import os

    # Default OFF: probe18 S1 measured the end-to-end chunked fused sort
    # at 6.7 ns/el vs 2.4 for the direct network at the headline config
    # (2-word 2^25) — the per-large-stride passes need multi-stage fusion
    # before this can win (probe18b decomposition). The fused MERGE is
    # already the default inside merge_sorted (it wins 10x there); this
    # flag only controls replacing whole network sorts.
    if os.environ.get("RDST_TPU_FUSED_SORT", "0") in ("0", "", "false"):
        return False
    n = int(words[0].shape[0])
    if n < MIN_ELEMS:
        return False
    if any(
        np.dtype(p.dtype).itemsize > 4 for p in list(words) + list(payloads)
    ):
        return False
    import os

    if os.environ.get("RDST_TPU_FORCE_INTERPRET") not in (None, "0", "", "false"):
        return True
    return config.on_tpu() and not config.pallas_interpret()


def pick_chunk(n: int) -> int:
    """Largest power-of-two m <= CHUNK_TARGET with at least 2 chunks."""
    m = CHUNK_TARGET
    while m * 2 > n:
        m //= 2
    return max(m, LANES * 2)


def fused_merge_sort(
    words: Sequence[jax.Array],
    payloads: Sequence[jax.Array] = (),
    *,
    m: int | None = None,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Unstable sort of word planes (most significant first) + payloads."""
    words = list(words)
    payloads = list(payloads)
    n = int(words[0].shape[0])
    m = m or pick_chunk(n)
    k = 1 << max(1, (-(-n // m) - 1).bit_length())  # next power of two
    total = k * m
    n_words = len(words)

    planes = words + payloads
    if total > n:
        def pad(p, is_key):
            fill = (
                p.dtype.type(np.iinfo(np.dtype(p.dtype)).max)
                if is_key
                else p.dtype.type(0)
            )
            return jnp.concatenate([p, jnp.full((total - n,), fill, p.dtype)])

        planes = [pad(p, i < n_words) for i, p in enumerate(planes)]
        if payloads:
            marker = jnp.concatenate(
                [
                    jnp.zeros((n,), jnp.uint32),
                    jnp.ones((total - n,), jnp.uint32),
                ]
            )
            planes = planes[:n_words] + [marker] + planes[n_words:]
            nk = n_words + 1
        else:
            nk = n_words
    else:
        nk = n_words

    rows = [p.reshape(k, m) for p in planes]
    srt = jax.lax.sort(
        tuple(rows), dimension=1, num_keys=nk, is_stable=False
    )
    flat = [p.reshape(total) for p in srt]

    run = m
    while run < total:
        flat = merge_level(flat, run, nk)
        run *= 2

    out = [p[:n] for p in flat]
    if nk > n_words:
        out = out[:n_words] + out[n_words + 1 :]
    return out[:n_words], out[n_words:]

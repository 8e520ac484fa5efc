"""Fully-traceable sorting API for use inside ``jax.jit`` programs.

The builder API (rdst_tpu.builder) mirrors the reference's host-driven
dispatch: it syncs histograms to run the tuner, exactly like the
reference's ``handle_chunk`` inspecting counts (sorter.rs:50-76). When a
sort is embedded in a larger jitted computation, that sync is
unavailable — these entry points run a static plan end to end on device:

    @jax.jit
    def pipeline(x, v):
        xs, (vs,) = rdst_tpu.jit_api.sort(x, payloads=[v], stable=True)
        return xs, vs

Key normalization/denormalization are pure bit ops and trace cleanly for
every supported dtype (64-bit dtypes need jax_enable_x64 inside jit).
"""
from __future__ import annotations

from typing import Sequence

import jax

from rdst_tpu import keys as _keys
from rdst_tpu.engine import sort_words

__all__ = ["sort", "argsort"]


def sort(
    x,
    payloads: Sequence = (),
    *,
    stable: bool = False,
    plan: str = "auto",
):
    """Sorted copy of ``x`` (any supported key dtype / composite tuple),
    traceable under jit. Returns keys or ``(keys, payloads_tuple)``.

    Payloads are passed natively (no word encoding), which preserves
    differentiability: gradients flow through payload values along the
    sort permutation (lax.sort's JVP).
    """
    nk = _keys.normalize(x)
    out_words, out_payloads = sort_words(
        list(nk.words), list(payloads), stable=stable, plan=plan
    )
    sorted_keys = _keys.denormalize(
        _keys.NormalizedKeys(tuple(out_words), nk.n_bytes, nk.meta)
    )
    if not payloads:
        return sorted_keys
    return sorted_keys, tuple(out_payloads)


def argsort(x, *, stable: bool = True):
    """Sorting indices, traceable under jit (stable by default).

    Stable mode sorts UNSTABLY on the composite (key, iota) — the same
    one-plane-cheaper encoding as builder.argsort: the iota makes the
    order strict, so the unique result IS the stable permutation."""
    import jax.numpy as jnp

    n = x[0].shape[0] if isinstance(x, (list, tuple)) else x.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    if not stable:
        _, (out,) = sort(x, payloads=[idx], stable=False)
        return out
    fields = list(x) if isinstance(x, (list, tuple)) else [x]
    out = sort(tuple(fields + [idx]))
    return out[-1]

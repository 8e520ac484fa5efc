"""Probe 9: end-to-end plan bake-off at tuner-relevant shapes (real TPU).

The tuner ladders route uniform 4M-50M inputs to the bucketed MSB plan
(reference Recombinating/Scanning thresholds). Measure whether bucketed
actually beats the comparative network on TPU at those shapes, for 1- and
2-word keys, uniform and skewed.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rdst_tpu.sorts.comparative import comparative_sort  # noqa: E402
from rdst_tpu.sorts.msb import bucketed_sort  # noqa: E402

H = np.uint32(2654435761)


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, step, x0, iters=6):
    @jax.jit
    def once(ws):
        return step(ws)

    @jax.jit
    def many(ws):
        return jax.lax.fori_loop(0, iters, lambda i, a: step(a), ws)

    _sync(once(x0))
    t0 = time.perf_counter()
    _sync(once(x0))
    t1 = time.perf_counter() - t0
    _sync(many(x0))
    t0 = time.perf_counter()
    _sync(many(x0))
    tm = time.perf_counter() - t0
    per = (tm - t1) / (iters - 1)
    n = x0[0].shape[0]
    print(f"{label}: {per*1e3:.2f} ms = {per*1e9/n:.3f} ns/el", flush=True)
    return per


def np_counts(words_np, n_bytes):
    """(L, 256) histograms like multi_level_histogram, host-side."""
    L = n_bytes
    n_words = len(words_np)
    out = np.zeros((L, 256), dtype=np.int64)
    for lvl in range(L):
        w = words_np[n_words - 1 - (lvl // 4)]
        d = (w >> np.uint32((lvl % 4) * 8)) & 0xFF
        out[lvl] = np.bincount(d, minlength=256)
    return out


def run(n, n_words, dist, rng):
    if dist == "uniform":
        ws = [rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)
              for _ in range(n_words)]
    else:  # zipf: low-entropy top byte
        z = (rng.zipf(1.3, n) % (2**31)).astype(np.uint32)
        ws = [z] + [rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)
                    for _ in range(n_words - 1)]
    counts = np_counts(ws, 4 * n_words)
    wj = tuple(jnp.asarray(w) for w in ws)

    # no rehash: counts must describe the sorted data exactly, and the
    # sorting network does identical work on sorted inputs
    def comp(a):
        out, _ = comparative_sort(list(a), [])
        return tuple(out)

    def buck(a):
        out, _ = bucketed_sort(list(a), [], counts)
        return tuple(out)

    tag = f"{dist} {n/1e6:.0f}M {n_words}w"
    bench(f"comparative {tag}", comp, wj)
    try:
        bench(f"bucketed    {tag}", buck, wj)
    except Exception as e:
        print(f"bucketed    {tag}: FAIL {repr(e)[:120]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    run(1 << 22, 1, "uniform", rng)   # 4.2M u32
    run(10_000_000, 1, "uniform", rng)
    run(10_000_000, 2, "uniform", rng)
    run(10_000_000, 1, "zipf", rng)


if __name__ == "__main__":
    main()

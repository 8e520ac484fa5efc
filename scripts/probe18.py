"""Probe 18: chunked fused-merge sort vs the direct network (the headline).

probe17 M1 showed split(2)+fused-merge beats direct lax.sort at 2^24 u32
(0.689 vs 1.034 ns/el).  This probe (a) ASSERTS bit-exact correctness of
the fused path on the real chip against numpy, (b) sweeps chunk size at
the headline config (u64 as 2 words, 2^25, unstable) and at 1-word 2^24,
(c) checks the non-power-of-two 10M case where padding costs 1.67x.

  C0  correctness: fused_merge_sort == np.lexsort on real device output
  S1  headline 2-word 2^25: direct vs fused at m in {2^20..2^23}
  S2  1-word 2^24: direct vs fused
  S3  10M 1-word: direct vs fused (pad-to-2^24 overhead test)

Run: python scripts/probe18.py C0 S1 ...

HISTORICAL (round 2): the chunked executor measured here lost 2.8x to the
direct network because of the per-level reversal pass (see probe18c); it
was replaced in round 3 by the reversal-free design in ops/pallas_sort.py
(measured by probe19).  This probe now runs against the new executor via
a shim so the old numbers remain reproducible in spirit.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_sort import fused_sort  # noqa: E402


def fused_merge_sort(words, payloads=(), *, m=None):
    # round-3 shim: m was the round-2 chunk length; the new executor's
    # closest knob is the phase-0 row length (capped at block/2 inside)
    return fused_sort(words, payloads, row=min(m or 4096, 4096))

H = np.uint32(2654435761)


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, fn, x0, iters=8):
    @jax.jit
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

    n = int(jax.tree_util.tree_leaves(x0)[0].shape[0])
    try:
        _sync(once(x0))
        t0 = time.perf_counter()
        _sync(once(x0))
        t1 = time.perf_counter() - t0
        _sync(many(x0))
        t0 = time.perf_counter()
        _sync(many(x0))
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / n:.3f} ns/el",
              flush=True)
        return per
    except Exception as e:  # noqa: BLE001 — probe must survive
        print(f"{label}: FAIL {repr(e)[:400]}", flush=True)
        return None


def c0():
    rng = np.random.default_rng(0)
    for n, nw, npay, m in [
        (1 << 22, 2, 0, 1 << 20),
        (1 << 22, 1, 1, 1 << 20),
        (3_000_000, 1, 1, 1 << 20),
    ]:
        W = rng.integers(0, 2**32, size=(nw, n), dtype=np.uint32)
        P = rng.integers(0, 2**32, size=(npay, n), dtype=np.uint32)
        w, p = jax.jit(
            lambda ws, ps: fused_merge_sort(ws, ps, m=m)
        )([jnp.asarray(x) for x in W], [jnp.asarray(x) for x in P])
        order = np.lexsort(W[::-1])
        ok = all(
            np.array_equal(np.asarray(w[i]), W[i][order]) for i in range(nw)
        )
        if npay:
            got = np.stack([np.asarray(x) for x in list(w) + list(p)], 1)
            want = np.concatenate([W, P]).T[order]
            # unstable: compare as sorted row multisets
            gi = np.lexsort(got.T[::-1])
            wi = np.lexsort(want.T[::-1])
            ok = ok and np.array_equal(got[gi], want[wi])
        print(f"C0 n={n} nw={nw} npay={npay}: {'OK' if ok else 'MISMATCH'}",
              flush=True)
        assert ok


def s1():
    n = 1 << 25
    rng = np.random.default_rng(1)
    w0 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    w1 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    def direct(ws):
        ws = [w * H + np.uint32(i + 1) for i, w in enumerate(ws)]
        return jax.lax.sort(tuple(ws), num_keys=2, is_stable=False)

    bench("S1 direct 2-word 2^25", direct, (w0, w1))
    for m in (1 << 20, 1 << 21, 1 << 22, 1 << 23):
        def fused(ws, m=m):
            ws = [w * H + np.uint32(i + 1) for i, w in enumerate(ws)]
            return tuple(fused_merge_sort(list(ws), m=m)[0])

        bench(f"S1 fused 2-word 2^25 m=2^{m.bit_length()-1}", fused, (w0, w1))


def s2():
    n = 1 << 24
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    def direct(x):
        return jax.lax.sort((x * H + np.uint32(3),), is_stable=False)[0]

    bench("S2 direct 1-word 2^24", direct, x)
    for m in (1 << 20, 1 << 21, 1 << 22):
        def fused(x, m=m):
            return fused_merge_sort([x * H + np.uint32(3)], m=m)[0][0]

        bench(f"S2 fused 1-word 2^24 m=2^{m.bit_length()-1}", fused, x)


def s3():
    n = 10_000_000
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    def direct(x):
        return jax.lax.sort((x * H + np.uint32(3),), is_stable=False)[0]

    def fused(x):
        return fused_merge_sort([x * H + np.uint32(3)], m=1 << 21)[0][0]

    bench("S3 direct 1-word 10M", direct, x)
    bench("S3 fused 1-word 10M (pads to 2^24)", fused, x)


SECTIONS = {"C0": c0, "S1": s1, "S2": s2, "S3": s3}

if __name__ == "__main__":
    for name in (sys.argv[1:] or ["C0"]):
        print(f"--- {name} ---", flush=True)
        SECTIONS[name]()

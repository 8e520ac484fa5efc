"""Probe 18b: decompose the fused-merge sort cost (probe18 S1 lost 3x).

probe17 M1 (two flat half-sorts + fused merge at 2^24 1-op) WON 1.5x,
but probe18 S1 (batched chunk sort + merge tree at 2^25 2-op) LOST 3x.
Isolate which component is mispriced:

  B1  batched (k, m) lax.sort rows vs flat lax.sort, 2-op, 2^25 total
  B2  ONE merge_level at run=2^24 on sorted 2^25 planes (self-sustaining:
      a sorted array is a valid two-sorted-runs input, output is sorted)
  B3  ONE merge_level at run=2^20 (many pairs per pass)
  B4  the reversal pass alone (reshape+flip+reshape)

Run: python scripts/probe18b.py B1 B2 B3 B4
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_merge import merge_level  # noqa: E402

H = np.uint32(2654435761)
N = 1 << 25


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
    n = n if n > 1000 else int(np.prod(jax.tree_util.tree_leaves(x0)[0].shape))
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
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {repr(e)[:400]}", flush=True)
        return None


def _inputs():
    rng = np.random.default_rng(1)
    return tuple(
        jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        for _ in range(2)
    )


def b1():
    ws = _inputs()

    def flat(ws):
        ws = [w * H + np.uint32(i + 1) for i, w in enumerate(ws)]
        return jax.lax.sort(tuple(ws), num_keys=2, is_stable=False)

    bench("B1 flat lax.sort 2^25 2-op", flat, ws)
    for k in (4, 8, 16):
        def rows(ws, k=k):
            ws = [
                (w * H + np.uint32(i + 1)).reshape(k, N // k)
                for i, w in enumerate(ws)
            ]
            out = jax.lax.sort(
                tuple(ws), dimension=1, num_keys=2, is_stable=False
            )
            return tuple(p.reshape(N) for p in out)

        bench(f"B1 batched ({k},{N//k}) rows 2-op", rows, ws)


def _sorted_inputs():
    rng = np.random.default_rng(2)
    w0 = np.sort(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    w1 = rng.integers(0, 2**32, size=N, dtype=np.uint32)
    return jnp.asarray(w0), jnp.asarray(w1)


def b2():
    ws = _sorted_inputs()

    def lvl(ws):
        return tuple(merge_level(list(ws), N // 2, 1))

    bench("B2 merge_level run=2^24 on 2^25 2-plane", lvl, ws)


def b3():
    ws = _sorted_inputs()

    def lvl(ws):
        return tuple(merge_level(list(ws), 1 << 20, 1))

    bench("B3 merge_level run=2^20 on 2^25 2-plane", lvl, ws)


def b4():
    ws = _sorted_inputs()

    def rev(ws):
        out = []
        for p in ws:
            v = p.reshape(-1, 2, 1 << 20)
            out.append(
                jnp.concatenate([v[:, :1], v[:, 1:, ::-1]], 1).reshape(N)
            )
        return tuple(out)

    bench("B4 reversal pass (run=2^20) 2-plane", rev, ws)


SECTIONS = {"B1": b1, "B2": b2, "B3": b3, "B4": b4}

if __name__ == "__main__":
    for name in (sys.argv[1:] or ["B1"]):
        print(f"--- {name} ---", flush=True)
        SECTIONS[name]()

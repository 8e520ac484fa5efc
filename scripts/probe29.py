"""Probe 29: the phase-0 A/B the round-3 verdict demanded (item 2).

``net``  = alternating-direction batched lax.sort rows (4096) + trip-1
           merge tail — the shipped default.
``vmem`` = sort each VMEM block end-to-end inside ONE tail-kernel sweep
           (the full parity-masked in-VMEM bitonic network) — round 2's
           "in-VMEM block sort", buildable since probe24's deep blocks.

Measured at production geometry over 1/2/3 planes and 2^22-2^25; the
loser got DELETED (commit 70f4578; BENCH_NOTES round-4 records the
table).  The A/B is therefore HISTORICAL: the ``phase0`` kwarg no longer
exists, and this probe now re-times only the surviving ``net`` path (the
numbers remain comparable against the frozen vmem column in
BENCH_NOTES).  To re-run the original A/B, check out the tree just
before 70f4578.

Run:  timeout 1150 python scripts/probe29.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdst_tpu.ops.pallas_sort import fused_sort  # noqa: E402


def bench(label, fn, x0, n, iters=6):
    def _sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))

    @jax.jit
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

    try:
        _sync(once(x0))
        t0 = time.perf_counter(); _sync(once(x0))
        t1 = time.perf_counter() - t0
        _sync(many(x0))
        t0 = time.perf_counter(); _sync(many(x0))
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / n:.3f} ns/el",
              flush=True)
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {repr(e)[:200]}", flush=True)
        return None


def main():
    rng = np.random.default_rng(4)
    for logn in (22, 25):
        n = 1 << logn
        for planes in (1, 2, 3):
            ws = [
                jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
                for _ in range(planes)
            ]
            def run(a, planes=planes):
                ks, _ = fused_sort(list(a), [])
                return tuple(ks)
            bench(f"2^{logn} {planes}p net", run, tuple(ws), n)


if __name__ == "__main__":
    main()

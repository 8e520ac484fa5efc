"""Probe 27: narrow-plane fused_sort on real TPU at production geometry.

End-to-end check of the round-4 narrow-plane support (probe25/26 found
Mosaic lacks sub-32-bit rotate but admits narrow refs + in-register
widening): correctness at n=2^22 vs the numpy oracle, then timing of the
c3-shaped (u16,u32)+pay stable sort vs the pre-round-4 all-u32 form, and
the u8-pad-marker question (can unstable+payload+non-pow2 move off the
direct network now that the marker costs 1 byte?).

Run:  timeout 590 python scripts/probe27.py [correct c3 marker]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_sort import fused_sort  # noqa: E402

N = 1 << 22


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


def correct():
    rng = np.random.default_rng(1)
    k0 = rng.integers(0, 2**16, size=N).astype(np.uint16)
    k1 = rng.integers(0, 2**32, size=N, dtype=np.uint32)
    pay = np.arange(N, dtype=np.uint32)
    out_k, out_p = jax.jit(
        lambda a, b, c: fused_sort([a, b], [c], stable=True)
    )(jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(pay))
    order = np.lexsort([k1, k0])
    ok = (
        np.array_equal(np.asarray(out_k[0]), k0[order])
        and np.array_equal(np.asarray(out_k[1]), k1[order])
        and np.array_equal(np.asarray(out_p[0]), pay[order])
    )
    print("correct pow2 (u16,u32)+pay stable:", ok, flush=True)

    n2 = 4_000_000
    k0n, k1n, payn = k0[:n2], k1[:n2], pay[:n2]
    out_k, out_p = jax.jit(
        lambda a, b, c: fused_sort([a, b], [c], stable=True)
    )(jnp.asarray(k0n), jnp.asarray(k1n), jnp.asarray(payn))
    order = np.lexsort([k1n, k0n])
    ok = (
        np.array_equal(np.asarray(out_k[0]), k0n[order])
        and np.array_equal(np.asarray(out_p[0]), payn[order])
    )
    print("correct non-pow2 4M (u16,u32)+pay stable:", ok, flush=True)

    k8 = rng.integers(0, 256, size=N).astype(np.uint8)
    out_k, out_p = jax.jit(
        lambda a, c: fused_sort([a], [c], stable=True)
    )(jnp.asarray(k8), jnp.asarray(pay))
    order = np.argsort(k8, kind="stable")
    ok = (
        np.array_equal(np.asarray(out_k[0]), k8[order])
        and np.array_equal(np.asarray(out_p[0]), pay[order])
    )
    print("correct pow2 u8+pay stable:", ok, flush=True)


def c3():
    rng = np.random.default_rng(2)
    k0_16 = jnp.asarray(rng.integers(0, 2**16, size=N).astype(np.uint16))
    k0_32 = k0_16.astype(jnp.uint32)
    k1 = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    pay = jnp.asarray(np.arange(N, dtype=np.uint32))
    def run(a):
        ks, ps = fused_sort([a[0], a[1]], [a[2]], stable=True)
        return (ks[0], ks[1], ps[0])

    bench("c3-shape stable (u16,u32)+pay fused", run, (k0_16, k1, pay), N)
    bench("c3-shape stable (u32,u32)+pay fused [pre-r4 form]", run,
          (k0_32, k1, pay), N)
    bench("c3-shape stable lax 3key+pay",
          lambda a: jax.lax.sort((a[0], a[1],
                                  jnp.arange(N, dtype=jnp.uint32), a[2]),
                                 num_keys=3, is_stable=False),
          (k0_16, k1, pay), N)


def marker():
    n = 10_000_000
    rng = np.random.default_rng(3)
    hi = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    pay = jnp.asarray(np.arange(n, dtype=np.uint32))
    def run(a):
        ks, ps = fused_sort([a[0], a[1]], [a[2]], stable=False)
        return (ks[0], ks[1], ps[0])

    bench("c2 unstable 10M fused w/ u8 marker", run, (hi, lo, pay), n)
    bench("c2 unstable 10M lax 2key+pay",
          lambda a: jax.lax.sort((a[0], a[1], a[2]), num_keys=2,
                                 is_stable=False),
          (hi, lo, pay), n)


if __name__ == "__main__":
    for s in sys.argv[1:] or ["correct", "c3", "marker"]:
        globals()[s]()

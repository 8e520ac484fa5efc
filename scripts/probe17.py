"""Probe 17: Pallas fused bitonic merge vs XLA merge vs direct sort.

STATUS.md round-2 gap 3: the chunked low-memory plan's merge tree runs at
XLA level and costs ~3.5x a direct sort (probe12 P5) because every
compare-exchange stage materializes through HBM.  ops/pallas_merge.py
fuses the stages (phase-A pairwise kernels + one VMEM-resident tail
kernel).  This probe decides whether the fused merge

  M1  u32 1-plane: sort two 2^23 halves + merge, vs direct 2^24 sort
  M2  3-plane (1 key + 2 riders): same comparison at 2x2^22
  M3  merge-only cost isolation (halves pre-sorted outside timing)

Go criterion: fused split+merge <= direct sort (the low-memory plan then
costs ~nothing extra), ideally fused merge-only << per-stage XLA merge.

Run sections individually (TPU compiles are minutes):
  python scripts/probe17.py M1 M2 M3
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.merge import merge_sorted  # noqa: E402
from rdst_tpu.ops.pallas_merge import bitonic_merge_fused  # noqa: E402

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


def _fused_merge_halves(a_planes, b_planes, nk):
    z = [jnp.concatenate([pa, pb[::-1]]) for pa, pb in zip(a_planes, b_planes)]
    return bitonic_merge_fused(z, nk)


def m1():
    h = 1 << 23
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=2 * h).astype(np.uint32))

    def direct(x):
        return jax.lax.sort((x * H + np.uint32(3),), is_stable=False)[0]

    def split_fused(x):
        x = x * H + np.uint32(3)
        a = jax.lax.sort((x[:h],), is_stable=False)[0]
        b = jax.lax.sort((x[h:],), is_stable=False)[0]
        return _fused_merge_halves([a], [b], 1)[0]

    def split_xla(x):
        x = x * H + np.uint32(3)
        a = jax.lax.sort((x[:h],), is_stable=False)[0]
        b = jax.lax.sort((x[h:],), is_stable=False)[0]
        return jnp.concatenate(merge_sorted([a], [b], 1))

    bench("M1 direct lax.sort 2^24 u32", direct, x)
    bench("M1 split+FUSED-merge 2^24 u32", split_fused, x)
    bench("M1 split+XLA-merge 2^24 u32", split_xla, x)


def m2():
    h = 1 << 22
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.integers(0, 2**32, size=2 * h).astype(np.uint32))
    p1 = jnp.asarray(rng.integers(0, 2**32, size=2 * h).astype(np.uint32))
    p2 = jnp.asarray(rng.integers(0, 2**32, size=2 * h).astype(np.uint32))

    def direct(args):
        k, p1, p2 = args
        return jax.lax.sort((k * H + np.uint32(3), p1, p2), num_keys=1,
                            is_stable=False)

    def split_fused(args):
        k, p1, p2 = args
        k = k * H + np.uint32(3)
        a = jax.lax.sort((k[:h], p1[:h], p2[:h]), num_keys=1, is_stable=False)
        b = jax.lax.sort((k[h:], p1[h:], p2[h:]), num_keys=1, is_stable=False)
        return tuple(_fused_merge_halves(list(a), list(b), 1))

    def split_xla(args):
        k, p1, p2 = args
        k = k * H + np.uint32(3)
        a = jax.lax.sort((k[:h], p1[:h], p2[:h]), num_keys=1, is_stable=False)
        b = jax.lax.sort((k[h:], p1[h:], p2[h:]), num_keys=1, is_stable=False)
        return tuple(merge_sorted(list(a), list(b), 1))

    bench("M2 direct 3-plane 2^23", direct, (k, p1, p2))
    bench("M2 split+FUSED-merge 3-plane 2^23", split_fused, (k, p1, p2))
    bench("M2 split+XLA-merge 3-plane 2^23", split_xla, (k, p1, p2))


def m3():
    """Merge-only: keep halves sorted across iterations by re-merging the
    merged output's even/odd interleave (both stay sorted)."""
    h = 1 << 23
    rng = np.random.default_rng(2)
    x = np.sort(rng.integers(0, 2**32, size=2 * h).astype(np.uint32))
    a0, b0 = jnp.asarray(x[0::2]), jnp.asarray(x[1::2])

    def fused(ab):
        a, b = ab
        m = _fused_merge_halves([a], [b], 1)[0]
        return m[0::2], m[1::2]

    def xla(ab):
        a, b = ab
        m = jnp.concatenate(merge_sorted([a], [b], 1))
        return m[0::2], m[1::2]

    bench("M3 FUSED merge-only 2^24 u32", fused, (a0, b0))
    bench("M3 XLA merge-only 2^24 u32", xla, (a0, b0))


SECTIONS = {"M1": m1, "M2": m2, "M3": m3}

if __name__ == "__main__":
    for name in (sys.argv[1:] or ["M1"]):
        print(f"--- {name} ---", flush=True)
        SECTIONS[name]()

"""Probe 6: table-op primitives — monotone gather, compaction, segments."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, step, x0, iters=6):
    def perturbed(ws, i):
        w0 = ws[0] ^ jnp.asarray(i, ws[0].dtype)
        return (w0,) + tuple(ws[1:])

    @jax.jit
    def once(ws):
        r = step(perturbed(ws, 1))
        leaf = jax.tree_util.tree_leaves(r)[0]
        return jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32))

    @jax.jit
    def many(ws):
        def body(i, acc):
            r = step(perturbed(ws, i))
            leaf = jax.tree_util.tree_leaves(r)[0]
            return acc + jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(once(x0)); float(once(x0))
    t0 = time.perf_counter(); float(once(x0))
    t1 = time.perf_counter() - t0
    float(many(x0))
    t0 = time.perf_counter(); float(many(x0))
    tm = (time.perf_counter() - t0 - t1) / (iters - 1)
    per = max(tm, 1e-9)
    n = jax.tree_util.tree_leaves(x0)[0].shape[0]
    print(f"{label}: {per*1e3:.2f} ms = {per*1e9/n:.3f} ns/el")


def main():
    n = 1 << 24
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    H = np.uint32(2654435761)

    # monotone gather: drop ~half the elements (compaction-style indices)
    keep = np.sort(rng.choice(n, size=n // 2, replace=False)).astype(np.int32)
    keepj = jnp.asarray(keep)
    bench("monotone gather n->n/2", lambda w: (jnp.take(w[0], keepj),), (a,))

    # gather with repeats ±small window (near-identity)
    near = jnp.asarray(
        np.clip(np.arange(n) + rng.integers(-4, 5, n), 0, n - 1).astype(np.int32))
    bench("near-identity gather", lambda w: (jnp.take(w[0], near),), (a,))

    # cumsum over 16M int32
    bench("cumsum 16M", lambda w: (jnp.cumsum(w[0].astype(jnp.int32)),), (a,))

    # segment-sum via sorted segment ids: jax.ops.segment_sum
    nseg = 1 << 16
    seg = jnp.asarray(np.sort(rng.integers(0, nseg, n)).astype(np.int32))
    bench(
        "segment_sum sorted 16M->65K",
        lambda w: (jax.ops.segment_sum(
            w[0].astype(jnp.float32), seg, num_segments=nseg,
            indices_are_sorted=True),),
        (a,),
    )

    # boundary-diff alternative: cumsum + gather at 65K boundaries
    bnd = jnp.asarray(
        np.searchsorted(np.asarray(seg), np.arange(nseg + 1)).astype(np.int32))
    def seg_via_cumsum(w):
        c = jnp.cumsum(w[0].astype(jnp.float64))
        ends = jnp.take(jnp.pad(c, (1, 0)), bnd)
        return (ends[1:] - ends[:-1],)
    bench("segment via cumsum+small gather", seg_via_cumsum, (a,))

    # searchsorted: 65K sorted splitters in 16M sorted data
    srt = jnp.sort(a)
    spl = jnp.asarray(rng.integers(0, 2**32, size=nseg, dtype=np.uint32))
    spl = jnp.sort(spl)
    bench("searchsorted 65K in 16M", lambda w: (jnp.searchsorted(w[0], spl),),
          (srt,))

    # where/select + two compactions via sort trick: partition by predicate
    def partition_sort(w):
        pred = (w[0] & 1).astype(jnp.uint8)
        r = jax.lax.sort((pred, w[0]), num_keys=1, is_stable=True)
        return (r[1],)
    bench("stable partition via 1bit sort", partition_sort, (a,))

    # dynamic_slice based padded bucket extract: 4096 slices of 4096+pad
    starts = jnp.asarray((np.arange(4096) * 4096).astype(np.int32))
    def extract(w):
        def get(s):
            return jax.lax.dynamic_slice(w[0], (s,), (4352,))
        return (jax.vmap(get)(starts[:4095]),)
    bench("vmap dynamic_slice 4095x4352", extract, (jnp.pad(a, (0, 8192)),))


if __name__ == "__main__":
    main()

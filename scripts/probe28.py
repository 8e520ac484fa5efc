"""Probe 28: where do c6-struct-409k's 4.2 ns/el go? (VERDICT r3 item 7)

bench_suite config 6: 409,600 (u16,f32) structs, 90% presorted, payload,
unstable — plan PresortedMerge[Recombinating] at 0.579x.  The timed step
is: suffix XOR rehash -> plan(suffix 41k) -> merge_sorted(368k | 41k).
This probe times the step and its components in the same harness to find
the dominant term.

  full     the exact dispatcher step bench_suite times
  suffix   plan on the 41k suffix alone
  merge    merge_sorted at the production geometry alone
  sort1    one flat lax.sort of the whole 409k (3 ops) — the "do nothing
           clever" floor
  batch    batched-row sort of the whole 409k (what a sub-2^20 fused
           pipeline would start from)

Run:  timeout 590 python scripts/probe28.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdst_tpu import keys as rkeys  # noqa: E402
from rdst_tpu.ops.histogram import multi_level_histogram  # noqa: E402
from rdst_tpu.sorter import Sorter  # noqa: E402


def bench(label, fn, x0, n, iters=8):
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
    rng = np.random.default_rng(0)
    ns = 409_600
    cut = int(ns * 0.9)
    a16 = rng.integers(0, 2**16, ns).astype(np.uint16)
    b32 = rng.standard_normal(ns).astype(np.float32)
    nk6 = rkeys.normalize((a16, b32))
    w6 = [np.asarray(x).copy() for x in nk6.words]
    order = np.lexsort([w[:cut] for w in w6][::-1])
    for w in w6:
        w[:cut] = w[:cut][order]
    w6[0][cut] = 0
    pay = np.arange(ns, dtype=np.uint32)
    hist = multi_level_histogram(
        [jnp.asarray(w) for w in w6], nk6.n_bytes
    )
    sorter = Sorter()
    C = np.uint32(0xB5A93E6B)

    from rdst_tpu.keys import NormalizedKeys

    def step(a):
        ws, ps = list(a[:2]), list(a[2:])
        ws = [jnp.concatenate([w[:cut], w[cut:] ^ C]) for w in ws]
        nk = NormalizedKeys(tuple(ws), nk6.n_bytes,
                            ("dtype", np.dtype(np.uint32)))
        out_nk, out_ps = sorter.run(nk, ps, stable=False, hist=hist)
        return tuple(out_nk.words) + tuple(out_ps)

    args = tuple(jnp.asarray(w) for w in w6) + (jnp.asarray(pay),)
    bench("full  c6 dispatcher step", step, args, ns)

    # suffix plan alone (41k): what PresortedMerge pays for sorting
    suf = tuple(jnp.asarray(w[cut:] ) for w in w6) + (
        jnp.asarray(pay[cut:]),
    )
    def suffix_step(a):
        ws, ps = list(a[:2]), list(a[2:])
        ws = [w ^ C for w in ws]
        out = jax.lax.sort(tuple(ws) + tuple(ps), num_keys=2,
                           is_stable=False)
        return out
    bench("sufx  41k lax 3-op", suffix_step, suf, ns - cut)

    # the merge alone at production geometry
    from rdst_tpu.ops.merge import merge_sorted
    sw = [np.sort(w) for w in w6]  # shapes only; values irrelevant to cost

    def merge_step(a):
        aw = list(a[:3])
        bw = list(a[3:])
        out = merge_sorted(aw, bw, 3, stable=False)
        return tuple(out)

    T = 1 << 19
    padb = T - cut  # suffix side padded to T - cut? mirror sorter's shapes
    av = [jnp.asarray(w[:cut]) for w in sw] + [jnp.zeros((cut,), jnp.uint32)]
    bv = [
        jnp.concatenate([jnp.asarray(w[cut:]),
                         jnp.full((T - ns,), np.uint32(0xFFFFFFFF))])
        for w in sw
    ] + [
        jnp.concatenate([jnp.zeros((ns - cut,), jnp.uint32),
                         jnp.ones((T - ns,), jnp.uint32)])
    ]
    av = [av[0], av[1], av[2]]
    def merge_step2(x):
        out = merge_sorted([x[0], x[1], x[2]], [x[3], x[4], x[5]], 3,
                           stable=False)
        # chain outputs back into same-shaped inputs (min keeps the
        # a-side sorted, so the next iteration's merge is well-formed)
        a2 = tuple(
            jnp.minimum(x[i], out[i][: x[i].shape[0]]) for i in range(3)
        )
        return a2 + tuple(x[3:])
    bench("merge 368k|73.7k merge_sorted", merge_step2,
          tuple(av) + tuple(bv), ns)

    # floors
    full = tuple(jnp.asarray(w) for w in w6) + (jnp.asarray(pay),)
    def flat(a):
        ws = [w ^ C for w in a[:2]]
        return jax.lax.sort(tuple(ws) + (a[2],), num_keys=2,
                            is_stable=False)
    bench("sort1 409k flat lax 3-op", flat, full, ns)

    m = 4096
    def batch(a):
        ws = [(w ^ C).reshape(100, m) for w in a[:2]]
        ps = [a[2].reshape(100, m)]
        out = jax.lax.sort(tuple(ws) + tuple(ps), dimension=1, num_keys=2,
                           is_stable=False)
        return tuple(p.reshape(ns) for p in out)
    bench("batch 100x4096 rows 3-op", batch, full, ns)


if __name__ == "__main__":
    main()

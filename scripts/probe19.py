"""Probe 19: the reversal-free fused bitonic sort on the real chip.

Measures (TPU v5e, chained-jit timing like probe18):
  C0   correctness vs np.lexsort on device output (bit-exact keys,
       payload association; stable exactness for the stable path)
  P0   phase-0 batched alternating-direction row sort alone, for
       row in {2^11, 2^12, 2^13}, 2 planes @ 2^25
  E1   end-to-end fused_sort at the headline config (2^25, 2 planes,
       unstable) across row/block choices, vs direct lax.sort
  E2   plane-count scaling: 1/3/4-plane unstable, 3-plane stable
       (c2's shape: 2 key words + payload) vs direct lax.sort
  E3   crossover: fused vs direct at 2^20..2^24 (2-plane)

Run:  timeout 590 python scripts/probe19.py [section ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_sort import fused_sort  # noqa: E402

N = 1 << 25


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, fn, x0, n=N, iters=8):
    @jax.jit
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

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
        print(f"{label}: FAIL {repr(e)[:500]}", flush=True)
        return None


def _rehash(ws):
    # shape-preserving XOR rehash (bench.py methodology)
    return tuple(
        w * np.uint32(2654435761) + np.uint32(i + 1)
        for i, w in enumerate(ws)
    )


def planes(rng, k, n=N):
    return tuple(
        jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        for _ in range(k)
    )


def c0():
    rng = np.random.default_rng(0)
    n = (1 << 22) + 12345  # non-pow2 with payload => marker path
    K = rng.integers(0, 2**32, size=(2, n), dtype=np.uint32)
    P = rng.integers(0, 2**32, size=(1, n), dtype=np.uint32)
    kj = [jnp.asarray(x) for x in K]
    pj = [jnp.asarray(x) for x in P]

    ok, op = jax.jit(lambda a, b: fused_sort(a, b))(kj, pj)
    order = np.lexsort(K[::-1])
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(ok[i]), K[i][order])
    got = sorted(map(tuple, np.stack(
        [np.asarray(x) for x in list(ok) + list(op)], 1).tolist()))
    want = sorted(map(tuple, np.concatenate([K, P]).T.tolist()))
    assert got == want
    print("C0 unstable non-pow2 + payload: OK", flush=True)

    K1 = (K[0] % 1000).astype(np.uint32)
    ok, op = jax.jit(lambda a, b: fused_sort(a, b, stable=True))(
        [jnp.asarray(K1)], pj
    )
    order = np.argsort(K1, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok[0]), K1[order])
    np.testing.assert_array_equal(np.asarray(op[0]), P[0][order])
    print("C0 stable heavy-ties: OK", flush=True)


def p0():
    rng = np.random.default_rng(1)
    ws = planes(rng, 2)
    for logm in (11, 12, 13):
        m = 1 << logm

        def phase0(ws, m=m):
            ws = _rehash(ws)
            gid = jnp.arange(N, dtype=jnp.uint32)
            flip = ((gid >> np.uint32(logm)) & np.uint32(1)) == 1
            ps = [jnp.where(flip, ~p, p) for p in ws]
            rows = [p.reshape(N // m, m) for p in ps]
            srt = jax.lax.sort(tuple(rows), dimension=1, num_keys=2,
                               is_stable=False)
            return tuple(p.reshape(N) for p in srt)

        bench(f"P0 row={m} 2-plane flip+sort", phase0, ws)


def e1():
    rng = np.random.default_rng(2)
    ws = planes(rng, 2)

    def direct(ws):
        return jax.lax.sort(_rehash(ws), num_keys=2, is_stable=False)

    bench("E1 direct lax.sort 2-plane 2^25", direct, ws)
    for row, block in [(1 << 12, 1 << 17), (1 << 11, 1 << 17),
                       (1 << 13, 1 << 17), (1 << 12, 1 << 16)]:
        def fs(ws, row=row, block=block):
            k, _ = fused_sort(list(_rehash(ws)), [], row=row, block=block)
            return tuple(k)

        bench(f"E1 fused row={row} block={block}", fs, ws)


def e2():
    rng = np.random.default_rng(3)
    for nk, npay, stable in [(1, 0, False), (2, 1, False), (3, 1, False),
                             (2, 1, True)]:
        ws = planes(rng, nk + npay)

        def fs(ws, nk=nk, stable=stable):
            ws = _rehash(ws)
            k, p = fused_sort(list(ws[:nk]), list(ws[nk:]), stable=stable)
            return tuple(k) + tuple(p)

        def direct(ws, nk=nk, stable=stable):
            out = jax.lax.sort(_rehash(ws), num_keys=nk, is_stable=stable)
            return out

        tag = f"{nk}k+{npay}p{' stable' if stable else ''}"
        bench(f"E2 direct {tag}", direct, ws)
        bench(f"E2 fused  {tag}", fs, ws)


def e3():
    rng = np.random.default_rng(4)
    for logn in (20, 21, 22, 23, 24):
        n = 1 << logn
        ws = planes(rng, 2, n)

        def fs(ws):
            k, _ = fused_sort(list(_rehash(ws)), [])
            return tuple(k)

        def direct(ws):
            return jax.lax.sort(_rehash(ws), num_keys=2, is_stable=False)

        bench(f"E3 direct 2^{logn}", direct, ws, n=n)
        bench(f"E3 fused  2^{logn}", fs, ws, n=n)




def e1b():
    """Decompose the fused pipeline: trip-1 multi-level tail, one span
    trip, one single-level tail trip."""
    from rdst_tpu.ops.pallas_sort import _tail_call, _span_call

    rng = np.random.default_rng(5)
    ws = planes(rng, 2)
    B = 1 << 17

    def chain(ws):  # keep a data dep so fori chains
        return tuple(w + np.uint32(1) for w in ws)

    def trip1(ws):
        levels = [(l2r, 1 << (l2r - 1)) for l2r in range(13, 18)]
        out = _tail_call(list(chain(ws)), N, B, 2, levels, 12, False)
        return tuple(out)

    def tail1(ws):
        out = _tail_call(list(chain(ws)), N, B, 2, [(25, B // 2)], None,
                         False)
        return tuple(out)

    def span8(ws):  # level R=2^24: strides 2^24..2^17 in one trip, P=256
        out = _span_call(list(chain(ws)), N, 1 << 24, B, 1 << 25, B, 2,
                         False)
        return tuple(out)

    def span1(ws):  # level R=2^17: single stage, P=2
        out = _span_call(list(chain(ws)), N, B, B, 1 << 18, B, 2, False)
        return tuple(out)

    bench("E1b trip1 tail levels 13..17 (75 stages)", trip1, ws)
    bench("E1b one tail trip (17 stages)", tail1, ws)
    bench("E1b span trip P=256 (8 stages)", span8, ws)
    bench("E1b span trip P=2 (1 stage)", span1, ws)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["c0", "p0", "e1", "e2", "e3"]
    for s in sections:
        globals()[s]()

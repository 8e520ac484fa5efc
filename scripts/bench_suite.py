"""Benchmark suite covering the BASELINE.md driver configs.

  1. 10M uniform u32 (reference basic_sort)
  2. u64 and f64 keys + payload, stable and unstable
  3. composite struct keys (u16, f32, u32 payload — struct_sort)
  4. skewed/Zipfian distributions (tuner selection / low-mem regime)
  5. distributed pipeline — covered by tests/test_dtable.py + dryrun
     (single chip available; mesh scaling runs on the CPU mesh)

Run on the TPU host:  python scripts/bench_suite.py
Prints one JSON line per config (same schema as bench.py).
"""
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def bench_injit(step, args, iters=6):
    """step: tuple -> same-structure tuple. Chained through the loop so
    XLA cannot hoist the loop-invariant body."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def once(a):
        r = step(a)
        return jnp.sum(r[0][:4].astype(jnp.float32)), r

    @jax.jit
    def many(a):
        r = jax.lax.fori_loop(0, iters, lambda i, x: step(x), a)
        return jnp.sum(r[0][:4].astype(jnp.float32))

    s, _ = once(args); float(s)
    t0 = time.perf_counter(); s, _ = once(args); float(s)
    t1 = time.perf_counter() - t0
    float(many(args))
    t0 = time.perf_counter(); float(many(args))
    tm = (time.perf_counter() - t0 - t1) / (iters - 1)
    return max(tm, 1e-9)


def emit(metric, n, seconds):
    print(json.dumps({
        "metric": metric,
        "value": round(n / seconds),
        "unit": "keys/s",
        "vs_baseline": round(n / seconds / 1e9, 4),
    }), flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4",
                    help="comma-separated subset of configs to run")
    opts = ap.parse_args()
    run = set(opts.configs.split(","))

    import jax.numpy as jnp
    from rdst_tpu import keys as rkeys
    from rdst_tpu.engine import sort_words

    rng = np.random.default_rng(0)
    H = np.uint32(2654435761)

    def rehash(ws):
        return [w * H + np.uint32(3) for w in ws]

    # config 1: 10M uniform u32
    n = 10_000_000
    if "1" in run:
        w = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))]
        t = bench_injit(lambda a: tuple(sort_words(rehash(list(a)))[0]), tuple(w))
        emit("c1_u32_10M_uniform", n, t)

    pay = [jnp.asarray(np.arange(n, dtype=np.uint32))]

    def s2(stable):
        def step(a):
            ws, ps = list(a[:2]), list(a[2:])
            ow, op = sort_words(rehash(ws), ps, stable=stable)
            return tuple(ow) + tuple(op)
        return step

    if "2" in run:
        # config 2a: u64 + u32 payload, unstable then stable
        w2 = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))
              for _ in range(2)]
        t = bench_injit(s2(False), tuple(w2 + pay))
        emit("c2_u64_payload_unstable_10M", n, t)
        t = bench_injit(s2(True), tuple(w2 + pay))
        emit("c2_u64_payload_stable_10M", n, t)

        # config 2b: f64 keys + payload (total-order transform fused in)
        f = rng.standard_normal(n)
        nkf = rkeys.normalize(f)
        wf = [jnp.asarray(np.asarray(x)) for x in nkf.words]
        t = bench_injit(s2(True), tuple(wf + pay))
        emit("c2_f64_payload_stable_10M", n, t)

    if "3" in run:
        # config 3: composite struct key (u16, f32) + u32 payload
        a16 = rng.integers(0, 2**16, n).astype(np.uint16)
        b32 = rng.standard_normal(n).astype(np.float32)
        nk3 = rkeys.normalize((a16, b32))
        w3 = [jnp.asarray(np.asarray(x)) for x in nk3.words]
        assert len(w3) == 2  # 6 key bytes -> 2 words
        t = bench_injit(s2(True), tuple(w3 + pay))
        emit("c3_struct_key_payload_10M", n, t)

    # config 4: Zipfian u32 (skew regime)
    if "4" in run:
        # rehash is a bijection: duplicate structure (the skew) is
        # preserved while defeating the sorted-input fast path
        z = (rng.zipf(1.3, n) % (2**31)).astype(np.uint32)
        nz = rkeys.normalize(z)
        wz = [jnp.asarray(np.asarray(x)) for x in nz.words]
        t = bench_injit(lambda a: tuple(sort_words(rehash(list(a)))[0]),
                        tuple(wz))
        emit("c4_zipf_u32_10M", n, t)


if __name__ == "__main__":
    main()

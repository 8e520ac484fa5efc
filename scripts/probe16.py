"""Probe 16: bucketed-plan rematch (round-1 VERDICT item 7 done-criterion:
bucketed <= 2x comparative at 10M uniform, was 5x in probe9).

Round-2 changes under test: 2-byte partition, per-bucket re-tuning path,
static-slice writeback (replacing the 256-step sequential loop).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdst_tpu.ops.histogram import multi_level_histogram
from rdst_tpu.engine import sort_words

C = np.uint32(0xB5A93E6B)


def bench(label, fn, x, iters=6):
    @jax.jit
    def once(a):
        return jnp.sum(fn(a)[0][:4].astype(jnp.float32))

    @jax.jit
    def many(a):
        r = jax.lax.fori_loop(0, iters, lambda i, b: fn(b), a)
        return jnp.sum(r[0][:4].astype(jnp.float32))

    n = x[0].shape[0]
    float(once(x))
    t0 = time.perf_counter(); float(once(x)); t1 = time.perf_counter() - t0
    float(many(x))
    t0 = time.perf_counter(); float(many(x)); tm = time.perf_counter() - t0
    per = (tm - t1) / (iters - 1)
    print(f"{label}: {per*1e3:.2f} ms = {per*1e9/n:.3f} ns/el", flush=True)


def main():
    rng = np.random.default_rng(0)
    n = 10_000_000
    x = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))
    counts = multi_level_histogram([x], 4).counts

    # NOTE: the bucketed plan derives bucket lengths from `counts`
    # statically, so the timed loop must NOT change the top-byte
    # histogram. Chain iterations through a histogram-preserving
    # low-byte XOR.
    def bucketed(a, counts=counts):
        w = a[0] ^ np.uint32(0x3E6B)
        ws, _ = sort_words([w], plan="bucketed", counts=counts)
        return tuple(ws)

    def compar(a):
        w = a[0] ^ np.uint32(0x3E6B)
        ws, _ = sort_words([w], plan="comparative")
        return tuple(ws)

    # correctness first (low-byte xor keeps counts[-1] exact)
    got = np.asarray(jax.jit(bucketed)((x,))[0])
    want = np.sort(np.asarray(x) ^ np.uint32(0x3E6B))
    print("bucketed correct:", bool(np.array_equal(got, want)), flush=True)
    bench("comparative 10M uniform", compar, (x,))
    bench("bucketed    10M uniform", bucketed, (x,))


if __name__ == "__main__":
    main()

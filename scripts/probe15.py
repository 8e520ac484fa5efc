"""Probe 15: the LrLsb-regime question (round-1 VERDICT missing item 5).

The reference's LrLsb is a distinct two-ended scatter for equal-key-heavy
(skewed) inputs <=200K (out_of_place_sort.rs:202-275; picked at
standard_tuner.rs:26-33). On TPU the LrLsb/Ska names execute the packed
compaction plan. Round 1 had no measurement of that regime on record —
this probe supplies it: skewed inputs at the LrLsb (200K) and Ska (800K)
sizes, comparing the packed plan against the raw comparative network,
with and without payload.

Skew comes in two flavors with different compaction behavior:
  lowent  — values span 16 bits (constant high bytes): compaction packs
            the key into ONE uint16 operand.
  hotkey  — 50% one hot key over full-entropy background: nothing is
            constant; packed falls back to the network (identical code).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdst_tpu.ops.histogram import multi_level_histogram
from rdst_tpu.sorts.lsb import packed_sort
from rdst_tpu.sorts.comparative import comparative_sort

C = np.uint32(0xB5A93E6B)


def bench(label, fn, x, iters=32):
    @jax.jit
    def once(a):
        r = fn(a)
        return jnp.sum(r[0][:4].astype(jnp.float32))

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
    print(f"{label}: {per*1e6:.1f} us = {per*1e9/n:.3f} ns/el", flush=True)


def main():
    rng = np.random.default_rng(0)
    for n, regime in ((200_000, "LrLsb"),):
        lowent = jnp.asarray(
            rng.integers(0, 2**16, n, dtype=np.int64).astype(np.uint32))
        hot = rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)
        hot[: n // 2] = 0x1234ABCD
        rng.shuffle(hot)
        hot = jnp.asarray(hot)
        pay = jnp.asarray(np.arange(n, dtype=np.uint32))
        for name, x in (("lowent", lowent), ("hotkey", hot)):
            counts = multi_level_histogram([x], 4).counts

            def packed(a, counts=counts):
                # XOR only the low bytes so constant planes stay constant
                w = a[0] ^ np.uint32(0x00003E6B)
                ws, ps = packed_sort([w], [a[1]], counts, stable=True)
                return tuple(ws) + tuple(ps)

            def compar(a):
                w = a[0] ^ np.uint32(0x00003E6B)
                ws, ps = comparative_sort([w], [a[1]], stable=True)
                return tuple(ws) + tuple(ps)

            bench(f"{regime} {n} {name} packed+pay", packed, (x, pay))
            bench(f"{regime} {n} {name} network+pay", compar, (x, pay))


if __name__ == "__main__":
    main()

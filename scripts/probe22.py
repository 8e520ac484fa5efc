"""probe22: stable lax.sort vs unstable network with an iota tiebreak key.

Question: all 10M BASELINE stable configs run lax.sort(is_stable=True)
(measured stability tax ~2.2x at 1-op). Is (keys..., iota) as an extra
LEAST-significant key with is_stable=False cheaper?  The iota plane makes
the order strict, so the unique unstable output IS the stable permutation
(same argument as the fused executor's stable mode, pallas_sort.py:36-41).

Also probes: contiguous-slice compare-exchange stage cost at 10M (the
XLA half of the non-pow2 split-merge design) — whether a slice+minmax+
concat stage is near-bandwidth (unlike the interleaved reshape stages,
probe12 P5).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", False)


def timeit(fn, args, iters=5):
    @jax.jit
    def once(a):
        r = fn(a)
        return jnp.sum(r[0][:4].astype(jnp.float32)), r

    @jax.jit
    def many(a):
        r = jax.lax.fori_loop(0, iters, lambda i, x: fn(x), a)
        return jnp.sum(r[0][:4].astype(jnp.float32))

    s, _ = once(args); float(s)
    t0 = time.perf_counter(); s, _ = once(args); float(s)
    t1 = time.perf_counter() - t0
    float(many(args))
    t0 = time.perf_counter(); float(many(args))
    tm = (time.perf_counter() - t0 - t1) / (iters - 1)
    return max(tm, 1e-9)


C = np.uint32(0xB5A93E6B)
n = 10_000_000
rng = np.random.default_rng(0)
w0 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))
w1 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))
pay = jnp.arange(n, dtype=jnp.uint32)


def stable2(a):
    o = jax.lax.sort((a[0] ^ C, a[1] ^ C, a[2]), num_keys=2, is_stable=True)
    return o


def iota3(a):
    it = jnp.arange(n, dtype=jnp.uint32)
    o = jax.lax.sort(
        (a[0] ^ C, a[1] ^ C, it, a[2]), num_keys=3, is_stable=False
    )
    return (o[0], o[1], o[3])


def stable1(a):
    o = jax.lax.sort((a[0] ^ C, a[2]), num_keys=1, is_stable=True)
    return (o[0], a[1], o[1])


def iota2(a):
    it = jnp.arange(n, dtype=jnp.uint32)
    o = jax.lax.sort((a[0] ^ C, it, a[2]), num_keys=2, is_stable=False)
    return (o[0], a[1], o[2])


args = (w0, w1, pay)
for name, fn in [
    ("stable 2key+pay", stable2),
    ("iota   2key+pay (3key unstable)", iota3),
    ("stable 1key+pay", stable1),
    ("iota   1key+pay (2key unstable)", iota2),
]:
    t = timeit(fn, args)
    print(f"{name:36s} {t*1e9/n:7.3f} ns/el  {n/t/1e6:8.1f} M/s", flush=True)

# --- slice-stage probe: one compare-exchange stage over contiguous
# ranges, formulated as static slices + minmax + concat ---
s = 1 << 23  # active range [0, n-s), partner at +s


def slice_stage(a):
    outs = []
    for p in a[:2]:
        p = p ^ C
        lo, hi = p[: n - s], p[s:]
        swap = None
        nl = jnp.minimum(lo, hi)
        nh = jnp.maximum(lo, hi)
        outs.append(jnp.concatenate([nl, p[n - s : s], nh]))
    return tuple(outs) + (a[2],)


t = timeit(slice_stage, args)
print(f"{'slice stage s=2^23 (2 planes)':36s} {t*1e9/n:7.3f} ns/el",
      flush=True)

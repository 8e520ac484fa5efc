"""Probe raw XLA primitive throughput on the real TPU chip.

block_until_ready appears unreliable over the axon tunnel, so every timing
chains iterations through data dependencies and fetches a scalar to host.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chain(f, x0, iters=10, warmup=2):
    """f: x -> x (same shape/dtype). Chains to defeat async overlap."""
    x = x0
    for _ in range(warmup):
        x = f(x)
    float(jnp.sum(x[:8]).astype(jnp.float32))  # sync
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = f(x)
    float(jnp.sum(x[:8]).astype(jnp.float32))  # sync
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    n = 10_000_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    cp = jax.jit(lambda a: a + np.uint32(1))
    t = timeit_chain(cp, x)
    print(f"elementwise copy: {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s "
          f"({2*4*n/t/1e9:.0f} GB/s)")

    sort1 = jax.jit(lambda a: jnp.sort(a))
    t = timeit_chain(sort1, x)
    print(f"lax.sort u32 (sorted after 1st): {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    # sort random each time: xor with a counter-ish value to unsort
    sort_rnd = jax.jit(lambda a: jnp.sort(a * np.uint32(2654435761) + np.uint32(1)))
    t = timeit_chain(sort_rnd, x)
    print(f"lax.sort u32 (rehashed input): {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    sort2 = jax.jit(
        lambda a: jax.lax.sort(
            (a * np.uint32(2654435761), a), num_keys=1, is_stable=True
        )[1]
    )
    t = timeit_chain(sort2, x)
    print(f"lax.sort stable key+1payload: {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    sort3 = jax.jit(
        lambda a: jax.lax.sort(
            (a * np.uint32(2654435761), a + np.uint32(7), a, a ^ np.uint32(3)),
            num_keys=2, is_stable=True,
        )[2]
    )
    t = timeit_chain(sort3, x)
    print(f"lax.sort stable 2keys+2payloads: {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    scat = jax.jit(lambda a: jnp.zeros_like(a).at[perm].set(a, unique_indices=True))
    t = timeit_chain(scat, x)
    print(f"scatter(perm): {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    gath = jax.jit(lambda a: jnp.take(a, perm, axis=0, unique_indices=True))
    t = timeit_chain(gath, x)
    print(f"gather(perm): {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    # gather from small table (256) by per-element index
    tbl = jnp.asarray(rng.integers(0, 2**31, size=256, dtype=np.int32))
    gsmall = jax.jit(lambda a: jnp.take(tbl, (a & 0xFF).astype(jnp.int32)).astype(jnp.uint32) + a)
    t = timeit_chain(gsmall, x)
    print(f"gather small table[d]: {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")

    # scatter-add histogram via bincount
    hist = jax.jit(lambda a: jnp.zeros(256, jnp.int32).at[(a & 0xFF).astype(jnp.int32)].add(1))
    xx = x
    for _ in range(2):
        h = hist(xx)
    float(jnp.sum(h).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(10):
        h = hist(xx)
    float(jnp.sum(h).astype(jnp.float32))
    t = (time.perf_counter() - t0) / 10
    print(f"xla scatter-add 256-bin hist: {t*1e3:.3f} ms = {n/t/1e6:.0f} M el/s")


if __name__ == "__main__":
    main()

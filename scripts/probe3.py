"""Probe 3: strategy bake-off for the single-chip engine (real TPU).

All timings chained inside one jit via fori_loop; per-iter cost reported.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, step, x0, iters=6):
    @jax.jit
    def once(ws):
        return step(ws)

    @jax.jit
    def many(ws):
        return jax.lax.fori_loop(0, iters, lambda i, a: step(a), ws)

    r = once(x0)
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf[:4]).astype(jnp.float32))
    t0 = time.perf_counter()
    r = once(x0)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][:4]).astype(jnp.float32))
    t1 = time.perf_counter() - t0
    r = many(x0)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][:4]).astype(jnp.float32))
    t0 = time.perf_counter()
    r = many(x0)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][:4]).astype(jnp.float32))
    tm = time.perf_counter() - t0
    per = (tm - t1) / (iters - 1)
    n = x0[0].shape[0] if isinstance(x0, tuple) else x0.shape[0]
    print(f"{label}: {per*1e3:.2f} ms = {n/per/1e6:.0f} M el/s = {per*1e9/n:.2f} ns/el")
    return per


H = np.uint32(2654435761)


def main():
    n = 1 << 24  # 16.7M
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    d = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    # 1. plain 1-word sort
    bench("sort u32 16M", lambda w: (jnp.sort(w[0] * H + 1),), (a,))

    # 2. 2-word (u64) sort
    bench(
        "sort 2w (u64) 16M",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1]), num_keys=2, is_stable=False)),
        (a, b),
    )

    # 3. 2-word + 2 payloads stable (table row sort)
    bench(
        "sort 2w+2p stable 16M",
        lambda w: tuple(jax.lax.sort(
            (w[0] * H, w[1], w[2], w[3]), num_keys=2, is_stable=True
        )),
        (a, b, c, d),
    )

    # 4. u8-key stable sort with 1 payload (one LSD pass on XLA sort)
    bench(
        "sort u8key+1p stable 16M",
        lambda w: (lambda r: (r[1], r[0].astype(jnp.uint32) * 0 + r[1]))(jax.lax.sort(
            ((w[0] * H & 0xFF).astype(jnp.uint8), w[1]),
            num_keys=1, is_stable=True,
        )),
        (a, b),
    )

    # 4b. u8-key + 3 payloads
    bench(
        "sort u8key+3p stable 16M",
        lambda w: (lambda r: (r[1], r[2], r[3], r[1] ^ r[2]))(jax.lax.sort(
            ((w[0] * H & 0xFF).astype(jnp.uint8), w[1], w[2], w[3]),
            num_keys=1, is_stable=True,
        )),
        (a, b, c, d),
    )

    # 5. u16-key + 1 payload (one wide LSD pass)
    bench(
        "sort u16key+1p stable 16M",
        lambda w: (lambda r: (r[1], r[1] ^ np.uint32(1)))(jax.lax.sort(
            ((w[0] * H & 0xFFFF).astype(jnp.uint16), w[1]),
            num_keys=1, is_stable=True,
        )),
        (a, b),
    )

    # 6. vmapped bucket sorts: (256, 65536) 2-word
    m = n // 256

    def vsort(w):
        x0 = (w[0] * H).reshape(256, m)
        x1 = w[1].reshape(256, m)
        r = jax.lax.sort((x0, x1), num_keys=2, dimension=1, is_stable=False)
        return (r[0].reshape(-1), r[1].reshape(-1))

    bench("sort 256x65K 2w (bucketed)", vsort, (a, b))

    # 6b. vmapped (4096, 4096)
    m2 = n // 4096

    def vsort2(w):
        x0 = (w[0] * H).reshape(4096, m2)
        x1 = w[1].reshape(4096, m2)
        r = jax.lax.sort((x0, x1), num_keys=2, dimension=1, is_stable=False)
        return (r[0].reshape(-1), r[1].reshape(-1))

    bench("sort 4096x4K 2w (bucketed)", vsort2, (a, b))

    # 7. sort u32 at 2^26 (bigger n scaling)
    n2 = 1 << 26
    big = jnp.asarray(rng.integers(0, 2**32, size=n2, dtype=np.uint32))
    bench("sort u32 67M", lambda w: (jnp.sort(w[0] * H + 1),), (big,))


if __name__ == "__main__":
    main()

"""Probe 7: headline headroom — native-u64 operand vs 2xu32 words, and
bucketed pipeline stage costs at 16M (real TPU).

Questions:
  1. Does lax.sort of ONE uint64 operand beat num_keys=2 over 2 uint32
     operands (same bytes, simpler comparator)?
  2. What does the u8-key partition (1 key + 2 riding planes) cost — the
     gate for any MSB bucketed plan on 2-word keys?
  3. End-to-end bucketed_sort vs comparative at 16M, 2 words.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

H = np.uint32(2654435761)


def _sync(r):
    # On the axon tunnel backend block_until_ready does not wait; force a
    # host transfer (same trick as probe3/bench.py).
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, step, x0, iters=6):
    @jax.jit
    def once(ws):
        return step(ws)

    @jax.jit
    def many(ws):
        return jax.lax.fori_loop(0, iters, lambda i, a: step(a), ws)

    r = once(x0)
    _sync(r)
    t0 = time.perf_counter()
    _sync(once(x0))
    t1 = time.perf_counter() - t0
    _sync(many(x0))
    t0 = time.perf_counter()
    _sync(many(x0))
    tm = time.perf_counter() - t0
    per = (tm - t1) / (iters - 1)
    n = x0[0].shape[0]
    print(f"{label}: {per*1e3:.2f} ms = {per*1e9/n:.3f} ns/el", flush=True)
    return per


def main():
    n = 1 << 24
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    # 1. two u32 words, num_keys=2 (current engine path)
    bench(
        "2xu32 nk=2 16M",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1]), num_keys=2,
                                     is_stable=False)),
        (a, b),
    )

    # 2. one native u64 operand
    a64 = (a.astype(jnp.uint64) << np.uint64(32)) | b.astype(jnp.uint64)

    def u64sort(w):
        k = w[0] * np.uint64(0x9E3779B97F4A7C15)
        return (jnp.sort(k),)

    bench("1xu64 native 16M", u64sort, (a64,))

    # 2b. u64 + u32 payload (config-2 shape) vs 3xu32
    bench(
        "1xu64+1xu32 payload 16M",
        lambda w: tuple(jax.lax.sort(
            (w[0] * np.uint64(0x9E3779B97F4A7C15), w[1]),
            num_keys=1, is_stable=False)),
        (a64, c),
    )
    bench(
        "3xu32 nk=2 (u64+payload) 16M",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1], w[2]), num_keys=2,
                                     is_stable=False)),
        (a, b, c),
    )

    # 3. u8 key + 2 riding planes (MSB partition cost for 2-word keys)
    bench(
        "u8key+2planes stable 16M",
        lambda w: tuple(jax.lax.sort(
            (((w[0] * H) >> np.uint32(24)).astype(jnp.uint8), w[0] * H, w[1]),
            num_keys=1, is_stable=True))[1:],
        (a, b),
    )

    # 4. u16 key + 2 planes
    bench(
        "u16key+2planes stable 16M",
        lambda w: tuple(jax.lax.sort(
            (((w[0] * H) >> np.uint32(16)).astype(jnp.uint16), w[0] * H, w[1]),
            num_keys=1, is_stable=True))[1:],
        (a, b),
    )

    # 5. batched (4096, 4096) 2-word sort (bucket-sort stage cost)
    m = n // 4096

    def vsort(w):
        x0 = (w[0] * H).reshape(4096, m)
        x1 = w[1].reshape(4096, m)
        r = jax.lax.sort((x0, x1), num_keys=2, dimension=1, is_stable=False)
        return (r[0].reshape(-1), r[1].reshape(-1))

    bench("4096x4096 2w batched 16M", vsort, (a, b))

    # 5b. batched (2048, 8192) 2-word
    def vsort2(w):
        x0 = (w[0] * H).reshape(2048, 8192)
        x1 = w[1].reshape(2048, 8192)
        r = jax.lax.sort((x0, x1), num_keys=2, dimension=1, is_stable=False)
        return (r[0].reshape(-1), r[1].reshape(-1))

    bench("2048x8192 2w batched 16M", vsort2, (a, b))

    # 5c. batched (256, 65536) 2-word
    def vsort3(w):
        x0 = (w[0] * H).reshape(256, 65536)
        x1 = w[1].reshape(256, 65536)
        r = jax.lax.sort((x0, x1), num_keys=2, dimension=1, is_stable=False)
        return (r[0].reshape(-1), r[1].reshape(-1))

    bench("256x65536 2w batched 16M", vsort3, (a, b))


if __name__ == "__main__":
    main()

"""Probe 11: lax.sort cost surface — n sweep x operand count (real TPU).

probe9 saw 0.905 ns/el for 1-op u32 at 10M; probe10 saw 1.854 ns/el for
1-op i32 at 2^24. log2^2 scaling explains ~8%, not 2x. Map the cliff:
n in {10M, 2^23, 2^24, 2^25} x {1op/nk1, 2op/nk1, 2op/nk2, 3op/nk2},
all uint32, identical harness.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H = np.uint32(2654435761)


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, step, x0, iters=6):
    @jax.jit
    def once(ws):
        return step(ws)

    @jax.jit
    def many(ws):
        return jax.lax.fori_loop(0, iters, lambda i, a: step(a), ws)

    n = int(x0[0].shape[0])
    try:
        r = once(x0); _sync(r)
        t0 = time.perf_counter(); r = once(x0); _sync(r)
        t1 = time.perf_counter() - t0
        r = many(x0); _sync(r)
        t0 = time.perf_counter(); r = many(x0); _sync(r)
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(f"{label}: {per*1e3:.2f} ms = {per*1e9/n:.3f} ns/el")
    except Exception as e:
        print(f"{label}: FAIL {repr(e)[:160]}")


def make(n, k, rng):
    return tuple(
        jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.int64)
                    .astype(np.uint32))
        for _ in range(k)
    )


def rehash(ws):
    return tuple(w * H + np.uint32(i + 1) for i, w in enumerate(ws))


def main():
    rng = np.random.default_rng(0)
    for n, tag in ((10_000_000, "10M"), (1 << 23, "2^23"),
                   (1 << 24, "2^24"), (1 << 25, "2^25")):
        for k, nk in ((1, 1), (2, 1), (2, 2), (3, 2)):
            x0 = make(n, k, rng)
            bench(
                f"{tag} {k}op nk={nk}",
                lambda ws, nk=nk: jax.lax.sort(rehash(ws), num_keys=nk),
                x0,
            )


if __name__ == "__main__":
    main()

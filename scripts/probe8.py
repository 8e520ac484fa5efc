"""Probe 8: decompose bench_suite config-2 overhead at n=10M.

The raw 3-operand sort measures ~2.8 ns/el (scaled from probe7 16M) but
c2_u64_payload_unstable_10M records 3.79 ns/el. Find the missing ~1 ns/el:
raw lax.sort at 10M / + rehash / via engine.sort_words / stable / the
bench_injit harness shape itself.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rdst_tpu.engine import sort_words

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

    _sync(once(x0))
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
    n = 10_000_000
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))  # noqa: E731
    a, b, p = mk(), mk(), jnp.asarray(np.arange(n, dtype=np.uint32))

    # 1. raw 3-operand unstable sort, single rehash of w0
    bench(
        "raw 3op nk=2 unstable 10M",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1], w[2]), num_keys=2,
                                     is_stable=False)),
        (a, b, p),
    )

    # 2. + rehash both words (bench_suite's rehash)
    bench(
        "3op rehash-both 10M",
        lambda w: tuple(jax.lax.sort(
            (w[0] * H + np.uint32(3), w[1] * H + np.uint32(3), w[2]),
            num_keys=2, is_stable=False)),
        (a, b, p),
    )

    # 3. via engine.sort_words (the bench_suite path)
    def via_engine(w):
        ws = [w[0] * H + np.uint32(3), w[1] * H + np.uint32(3)]
        ow, op = sort_words(ws, [w[2]], stable=False)
        return tuple(ow) + tuple(op)

    bench("sort_words 3op 10M", via_engine, (a, b, p))

    # 4. stable variant raw
    bench(
        "raw 3op nk=2 stable 10M",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1], w[2]), num_keys=2,
                                     is_stable=True)),
        (a, b, p),
    )

    # 5. power-of-two n comparison (2^23 = 8.4M)
    n2 = 1 << 23
    a2, b2, p2 = a[:n2], b[:n2], p[:n2]
    bench(
        "raw 3op nk=2 unstable 8.4M(pow2)",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1], w[2]), num_keys=2,
                                     is_stable=False)),
        (a2, b2, p2),
    )

    # 6. 2-operand at 10M for reference (c1-adjacent)
    bench(
        "raw 2op nk=2 unstable 10M",
        lambda w: tuple(jax.lax.sort((w[0] * H, w[1]), num_keys=2,
                                     is_stable=False)),
        (a, b),
    )

    # 7. u32 keys-only at 10M (c1 shape)
    bench(
        "raw 1op u32 10M",
        lambda w: (jnp.sort(w[0] * H + np.uint32(1)),),
        (a,),
    )


if __name__ == "__main__":
    main()

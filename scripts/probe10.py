"""Probe 10: is TPU's custom top_k kernel faster than lax.sort at k=n?

TPU carries a hand-optimized TopK custom call (beam-search/MoE path).
If top_k(x, n) beats the variadic sort network it becomes a plan for
descending (bit-flipped) 1-word sorts, and (values, indices) gives an
argsort for payload recovery.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

HI = np.int32(-1640531535)  # 2654435761 as int32 (odd -> bijective)


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, step, x0, iters=6):
    # step: tuple -> tuple with IDENTICAL dtypes/shapes (fori carry)
    @jax.jit
    def once(ws):
        return step(ws)

    @jax.jit
    def many(ws):
        return jax.lax.fori_loop(0, iters, lambda i, a: step(a), ws)

    n = int(np.prod(x0[0].shape))
    try:
        r = once(x0)
        _sync(r)
        t0 = time.perf_counter(); r = once(x0); _sync(r)
        t1 = time.perf_counter() - t0
        r = many(x0); _sync(r)
        t0 = time.perf_counter(); r = many(x0); _sync(r)
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(f"{label}: {per*1e3:.2f} ms = {per*1e9/n:.3f} ns/el")
    except Exception as e:
        print(f"{label}: FAIL {repr(e)[:200]}")


def main():
    rng = np.random.default_rng(0)
    n = 1 << 24
    xi = jnp.asarray(
        rng.integers(0, 2**32, size=n, dtype=np.int64).astype(np.uint32)
        .view(np.int32))

    def rehash(w):
        return w * HI + np.int32(1)

    bench("lax.sort 1op i32 2^24",
          lambda ws: (jax.lax.sort((rehash(ws[0]),))[0],), (xi,))

    def via_topk(ws):
        return (jax.lax.top_k(rehash(ws[0]), n)[0],)
    bench("top_k k=n i32 2^24 (values only)", via_topk, (xi,))

    xf = jnp.asarray(rng.random(n, dtype=np.float32))
    bench("top_k k=n f32",
          lambda ws: (jax.lax.top_k(ws[0] * np.float32(1.0000001), n)[0],),
          (xf,))
    bench("lax.sort 1op f32",
          lambda ws: (jax.lax.sort((ws[0] * np.float32(1.0000001),))[0],),
          (xf,))

    xb = jnp.asarray(
        rng.integers(0, 2**32, size=(4096, 4096), dtype=np.int64)
        .astype(np.uint32).view(np.int32))
    bench("batched sort rows 4096x4096",
          lambda ws: (jnp.sort(rehash(ws[0]), axis=-1),), (xb,))
    bench("batched top_k rows 4096x4096",
          lambda ws: (jax.lax.top_k(rehash(ws[0]), 4096)[0],), (xb,))


if __name__ == "__main__":
    main()

"""Probe 13: data-dependence of XLA TPU sort + scramble choice.

NOTE (hard-won): jax.block_until_ready does NOT synchronize on the axon
tunnel backend — only a host transfer (float(...)) forces completion.
Every timing here syncs by pulling a scalar.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

H = np.uint32(2654435761)
C = np.uint32(0xB5A93E6B)


def bench(label, fn, x, iters=6):
    @jax.jit
    def once(a):
        return jnp.sum(fn(a)[:4].astype(jnp.float32))

    @jax.jit
    def many(a):
        r = jax.lax.fori_loop(0, iters, lambda i, b: fn(b), a)
        return jnp.sum(r[:4].astype(jnp.float32))

    n = x.shape[0]
    float(once(x))
    t0 = time.perf_counter(); float(once(x)); t1 = time.perf_counter() - t0
    float(many(x))
    t0 = time.perf_counter(); float(many(x)); tm = time.perf_counter() - t0
    per = (tm - t1) / (iters - 1)
    print(f"{label}: {per*1e9/n:.3f} ns/el", flush=True)


def main():
    rng = np.random.default_rng(0)
    n = 10_000_000
    z = (rng.zipf(1.3, n) % (2**31)).astype(np.uint32)
    u = rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)
    bench("zipf xor-scramble", lambda a: jax.lax.sort((a ^ C,))[0], jnp.asarray(z))
    bench("zipf mul-scramble", lambda a: jax.lax.sort((a * H + np.uint32(1),))[0], jnp.asarray(z))
    bench("uniform xor-scramble", lambda a: jax.lax.sort((a ^ C,))[0], jnp.asarray(u))
    bench("uniform mul-scramble", lambda a: jax.lax.sort((a * H + np.uint32(1),))[0], jnp.asarray(u))


if __name__ == "__main__":
    main()

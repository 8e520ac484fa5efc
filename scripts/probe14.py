"""Probe 14: harness A/B — bench_suite.bench_injit vs probe13-style bench
on the IDENTICAL bare lax.sort step, same process, same input. Decides
which c1 number is real (0.90 vs 2.5 ns/el)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from scripts.bench_suite import bench_injit

C = np.uint32(0xB5A93E6B)


def probe_style(fn, x, iters=6):
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
    return t1, (tm - t1) / (iters - 1)


def main():
    rng = np.random.default_rng(0)
    n = 10_000_000
    u = (jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)),)

    def step(a):
        return (jax.lax.sort((a[0] ^ C,))[0],)

    t1, per = probe_style(step, u)
    print(f"probe-style: once={t1*1e3:.2f}ms per-iter={per*1e9/n:.3f} ns/el",
          flush=True)
    t = bench_injit(step, u)
    print(f"bench_injit: per-iter={t*1e9/n:.3f} ns/el", flush=True)
    # and a longer loop for a subtraction-free figure
    iters = 24

    @jax.jit
    def many24(a):
        r = jax.lax.fori_loop(0, iters, lambda i, b: step(b), a)
        return jnp.sum(r[0][:4].astype(jnp.float32))

    float(many24(u))
    t0 = time.perf_counter(); float(many24(u)); tm = time.perf_counter() - t0
    print(f"24-iter total={tm*1e3:.1f}ms -> {tm/iters*1e9/n:.3f} ns/el "
          "(incl. dispatch/24)", flush=True)


if __name__ == "__main__":
    main()

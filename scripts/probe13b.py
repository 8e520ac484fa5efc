"""Probe 13b: harness integrity — does chained fori_loop sort time scale
with iteration count? (If not, something caches/elides and every chained
bench number is suspect.)"""
import time
import jax
import jax.numpy as jnp
import numpy as np

C = np.uint32(0xB5A93E6B)
H = np.uint32(2654435761)


def main():
    rng = np.random.default_rng(0)
    n = 10_000_000
    u = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32))
    z = jnp.asarray((rng.zipf(1.3, n) % (2**31)).astype(np.uint32))

    def mk(iters, scr):
        f = {"xor": lambda b: jax.lax.sort((b ^ C,))[0],
             "mul": lambda b: jax.lax.sort((b * H + np.uint32(1),))[0]}[scr]
        return jax.jit(lambda a: jax.lax.fori_loop(0, iters, lambda i, b: f(b), a))

    for scr in ("xor", "mul"):
        for name, x in (("uniform", u), ("zipf", z)):
            f2, f12 = mk(2, scr), mk(12, scr)
            jax.block_until_ready(f2(x)); jax.block_until_ready(f12(x))
            t0 = time.perf_counter(); jax.block_until_ready(f2(x)); a = time.perf_counter() - t0
            t0 = time.perf_counter(); jax.block_until_ready(f12(x)); b = time.perf_counter() - t0
            per = (b - a) / 10
            print(f"{name} {scr}: iters2={a*1e3:.2f}ms iters12={b*1e3:.2f}ms "
                  f"-> {per*1e9/n:.3f} ns/el", flush=True)


if __name__ == "__main__":
    main()

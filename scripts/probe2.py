"""Probe 2: Pallas DMA + kernel costs, timed with in-jit loops."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_injit(make_step, x0, iters=20, label=""):
    """Compile fn that runs step() `iters` times inside one jit via fori_loop."""
    step = make_step()

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: step(a), x)

    @jax.jit
    def once(x):
        return step(x)

    r = once(x0)
    jnp.sum(r.reshape(-1)[:4]).astype(jnp.float32).item()
    t0 = time.perf_counter()
    r1 = once(x0)
    jnp.sum(r1.reshape(-1)[:4]).astype(jnp.float32).item()
    t_once = time.perf_counter() - t0
    r = many(x0)
    jnp.sum(r.reshape(-1)[:4]).astype(jnp.float32).item()
    t0 = time.perf_counter()
    r = many(x0)
    jnp.sum(r.reshape(-1)[:4]).astype(jnp.float32).item()
    t_many = time.perf_counter() - t0
    per = (t_many - t_once) / (iters - 1)
    print(f"{label}: {per*1e3:.3f} ms/iter (once={t_once*1e3:.2f} ms incl dispatch)")
    return per


def main():
    print("backend:", jax.devices())
    n = 1 << 23  # 8.4M
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    # 0) baselines inside jit
    bench_injit(lambda: (lambda a: a + np.uint32(1)), x, label=f"copy {n}")
    bench_injit(lambda: (lambda a: jnp.sort(a ^ np.uint32(0x9E3779B9))), x,
                label=f"lax.sort u32 {n}")
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    bench_injit(lambda: (lambda a: jnp.take(a, perm, unique_indices=True)), x,
                label=f"xla gather perm {n}")

    # 1) Pallas: histogram kernel throughput (one-hot 256)
    TILE = 1 << 17
    CHUNK = 1024
    T = n // TILE

    def hist_kernel(p_ref, h_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256), 1)

        def body(c, hist):
            w = p_ref[0, pl.ds(c * CHUNK, CHUNK)]
            d = (w.astype(jnp.int32) & 0xFF).reshape(CHUNK, 1)
            return hist + jnp.sum((d == lanes).astype(jnp.int32), axis=0,
                                  keepdims=True)

        h = jax.lax.fori_loop(0, TILE // CHUNK, body,
                              jnp.zeros((1, 256), jnp.int32))
        h_ref[0:1, :] = h

    def make_hist():
        f = pl.pallas_call(
            hist_kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, TILE), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 256), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 256), jnp.int32),
        )
        def step(a):
            h = f(a.reshape(T, TILE))
            return a + h[0, 0].astype(jnp.uint32)  # dependency
        return step

    try:
        per = bench_injit(make_hist, x, label=f"pallas hist256 {n}")
        print(f"   = {n/per/1e6:.0f} M el/s")
    except Exception as e:
        print("hist kernel fail:", repr(e)[:300])

    # 2) manual cumsum rank kernel (log-step shifts along sublanes)
    def rank_kernel(p_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256), 1)

        def body(c, carry):
            w = p_ref[0, pl.ds(c * CHUNK, CHUNK)]
            d = (w.astype(jnp.int32) & 0xFF).reshape(CHUNK, 1)
            oh = (d == lanes).astype(jnp.int32)
            cum = oh
            k = 1
            while k < CHUNK:
                rolled = pltpu.roll(cum, k, 0)
                mask = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256), 0)
                        >= k).astype(jnp.int32)
                cum = cum + rolled * mask
                k *= 2
            rank = jnp.sum(oh * (cum + carry.reshape(1, 256)), axis=1) - 1
            o_ref[0, pl.ds(c * CHUNK, CHUNK)] = rank
            return carry + jnp.sum(oh, axis=0)

        jax.lax.fori_loop(0, TILE // CHUNK, body, jnp.zeros((256,), jnp.int32))

    def make_rank():
        f = pl.pallas_call(
            rank_kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, TILE), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TILE), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.int32),
        )
        def step(a):
            r = f(a.reshape(T, TILE))
            return a + r[0, 0].astype(jnp.uint32)
        return step

    try:
        per = bench_injit(make_rank, x, iters=5, label=f"pallas rank256 {n}")
        print(f"   = {n/per/1e6:.0f} M el/s")
    except Exception as e:
        print("rank kernel fail:", repr(e)[:300])

    # 3) DMA issue overhead: HBM->HBM small copies
    for QLOG in (9, 11):
        Q = 1 << QLOG
        NCOPY = 2048

        def dma_kernel(src_ref, dst_ref):
            def body(sem):
                def one(i, _):
                    cp = pltpu.make_async_copy(
                        src_ref.at[0, pl.ds(i * Q, Q)],
                        dst_ref.at[0, pl.ds(((i * 7919) % NCOPY) * Q, Q)],
                        sem,
                    )
                    cp.start()
                    cp.wait()
                    return 0
                jax.lax.fori_loop(0, NCOPY, one, 0)
            pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))

        def make_dma():
            f = pl.pallas_call(
                dma_kernel,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct((1, NCOPY * Q), jnp.uint32),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )
            def step(a):
                r = f(a[None, : NCOPY * Q])
                return a + r[0, 0]
            return step

        try:
            per = bench_injit(make_dma, x, iters=5,
                              label=f"serial DMA Q={Q} x{NCOPY}")
            print(f"   = {per/NCOPY*1e9:.0f} ns/DMA, "
                  f"{NCOPY*Q/per/1e6:.0f} M el/s")
        except Exception as e:
            print("dma kernel fail:", repr(e)[:300])

    # 4) dynamic-size DMA support?
    def dyn_kernel(sz_ref, src_ref, dst_ref):
        def body(sem):
            sz = sz_ref[0]
            cp = pltpu.make_async_copy(
                src_ref.at[0, pl.ds(0, sz)], dst_ref.at[0, pl.ds(0, sz)], sem)
            cp.start()
            cp.wait()
        pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))

    try:
        f = pl.pallas_call(
            dyn_kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
        out = f(jnp.array([512], jnp.int32), x[None, :1024])
        jnp.sum(out).item()
        print("dynamic-size DMA: SUPPORTED")
    except Exception as e:
        print("dynamic-size DMA: FAIL", repr(e)[:200])


if __name__ == "__main__":
    main()

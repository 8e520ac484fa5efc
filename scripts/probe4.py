"""Probe 4: does Mosaic support dynamic gather in-kernel, and how fast?"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(label, kernel, out_shape, *args, check=None):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(*args)
        ok = check(out) if check else True
        print(f"{label}: COMPILES ok={ok}")
        return f
    except Exception as e:
        print(f"{label}: FAIL {repr(e)[:160]}")
        return None


def main():
    rng = np.random.default_rng(0)
    C = 2048
    vals = jnp.asarray(rng.integers(0, 2**31, size=(1, C), dtype=np.int32))
    perm = rng.permutation(C).astype(np.int32)
    idx = jnp.asarray(perm[None, :])
    want = np.asarray(vals)[0][perm]

    # 1. jnp.take_along_axis along lanes
    def k1(v_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(v_ref[:, :], i_ref[:, :], axis=1)

    try_kernel("take_along_axis lanes (1,C)", k1,
               jax.ShapeDtypeStruct((1, C), jnp.int32), vals, idx,
               check=lambda o: np.array_equal(np.asarray(o)[0], want))

    # 2. jnp.take flat
    def k2(v_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take(v_ref[0, :], i_ref[0, :])[None, :]

    try_kernel("jnp.take flat", k2,
               jax.ShapeDtypeStruct((1, C), jnp.int32), vals, idx,
               check=lambda o: np.array_equal(np.asarray(o)[0], want))

    # 3. take_along_axis on (8, 256) along axis 0 (sublanes)
    v8 = jnp.asarray(rng.integers(0, 2**31, size=(8, 256), dtype=np.int32))
    i8 = jnp.asarray(rng.integers(0, 8, size=(8, 256), dtype=np.int32))

    def k3(v_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(v_ref[:, :], i_ref[:, :], axis=0)

    try_kernel("take_along_axis sublanes (8,256)", k3,
               jax.ShapeDtypeStruct((8, 256), jnp.int32), v8, i8,
               check=lambda o: np.array_equal(
                   np.asarray(o),
                   np.take_along_axis(np.asarray(v8), np.asarray(i8), 0)))

    # 4. big version for timing: grid over many chunks
    T = 2048  # tiles of (1, C) -> 4M elements
    valsT = jnp.asarray(rng.integers(0, 2**31, size=(T, C), dtype=np.int32))
    idxT = jnp.asarray(
        np.stack([rng.permutation(C) for _ in range(8)])[
            rng.integers(0, 8, T)
        ].astype(np.int32)
    )

    def k4(v_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(v_ref[:, :], i_ref[:, :], axis=1)

    try:
        f = pl.pallas_call(
            k4,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, C), jnp.int32),
        )
        g = jax.jit(lambda v: f(v, idxT))
        r = g(valsT)
        float(jnp.sum(r[0, :4]).astype(jnp.float32))
        iters = 6

        @jax.jit
        def many(v):
            return jax.lax.fori_loop(0, iters, lambda i, a: f(a, idxT), v)

        r = many(valsT); float(jnp.sum(r[0, :4]).astype(jnp.float32))
        t0 = time.perf_counter()
        r = many(valsT); float(jnp.sum(r[0, :4]).astype(jnp.float32))
        tm = (time.perf_counter() - t0) / iters
        nel = T * C
        print(f"gather lanes timing: {tm*1e3:.2f} ms = {nel/tm/1e6:.0f} M el/s"
              f" = {tm*1e9/nel:.3f} ns/el")
    except Exception as e:
        print("timing fail:", repr(e)[:200])


if __name__ == "__main__":
    main()

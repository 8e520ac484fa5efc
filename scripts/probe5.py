"""Probe 5: envelope + speed of Mosaic take_along_axis."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_shape(rows, cols, axis, dtype=np.int32):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(0, 2**31, size=(rows, cols)).astype(dtype))
    i = jnp.asarray(
        rng.integers(0, rows if axis == 0 else cols, size=(rows, cols)
                     ).astype(np.int32))

    def k(v_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(v_ref[:, :], i_ref[:, :], axis=axis)

    try:
        f = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((rows, cols), v.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(v, i)
        ok = np.array_equal(
            np.asarray(out),
            np.take_along_axis(np.asarray(v), np.asarray(i), axis))
        print(f"({rows},{cols}) axis={axis} {np.dtype(dtype).name}: ok={ok}")
        return ok
    except Exception as e:
        print(f"({rows},{cols}) axis={axis}: FAIL {repr(e)[:110]}")
        return False


def main():
    try_shape(8, 256, 0)
    try_shape(32, 128, 0)
    try_shape(256, 128, 0)
    try_shape(2048, 128, 0)
    try_shape(2048, 256, 0)
    try_shape(8, 128, 1)
    try_shape(8, 256, 1)
    try_shape(16, 1024, 1)
    try_shape(8, 256, 0, np.uint32)
    try_shape(8, 256, 0, np.float32)

    # speed: (1024, 128) axis-0 gather per grid step, many steps
    rows, cols = 1024, 128
    T = 32  # 4M elements
    rng = np.random.default_rng(1)
    v = jnp.asarray(
        rng.integers(0, 2**31, size=(T, rows, cols), dtype=np.int32))
    i = jnp.asarray(
        rng.integers(0, rows, size=(T, rows, cols), dtype=np.int32))

    def k(v_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(v_ref[0], i_ref[0], axis=0)

    try:
        f = pl.pallas_call(
            k,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, rows, cols), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1, rows, cols), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, rows, cols), jnp.int32),
        )
        iters = 8

        @jax.jit
        def many(vv):
            return jax.lax.fori_loop(0, iters, lambda j, a: f(a, i), vv)

        r = jax.jit(f)(v, i)
        ok = np.array_equal(
            np.asarray(r[0]),
            np.take_along_axis(np.asarray(v[0]), np.asarray(i[0]), 0))
        float(jnp.sum(r[0, 0, :4]).astype(jnp.float32))
        r = many(v); float(jnp.sum(r[0, 0, :4]).astype(jnp.float32))
        t0 = time.perf_counter()
        r = many(v); float(jnp.sum(r[0, 0, :4]).astype(jnp.float32))
        tm = (time.perf_counter() - t0) / iters
        nel = T * rows * cols
        print(f"gather (1024,128) axis0: ok={ok} {tm*1e3:.2f} ms "
              f"= {nel/tm/1e6:.0f} M el/s = {tm*1e9/nel:.3f} ns/el")
    except Exception as e:
        print("speed test fail:", repr(e)[:300])


if __name__ == "__main__":
    main()

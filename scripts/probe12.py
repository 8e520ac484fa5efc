"""Probe 12: the Mosaic radix-scatter reality check (VERDICT round-1 item 1).

The round-1 verdict demanded the multi-operand question be settled "with a
kernel, not an emulation": a real Pallas/Mosaic scatter kernel, measured
against HBM speed-of-light. This probe builds and times the three component
kernels any TPU radix partition+scatter pass must be assembled from, plus the
XLA-side levers that could change the plan economics:

  P1  pallas_copy       pipelined HBM->VMEM->HBM pass-through (the bandwidth
                        ceiling every pass is judged against)
  P2  pallas_runs       REAL dynamic-offset DMA run-writeback kernel: each
                        tile's data leaves VMEM as D contiguous runs DMA'd to
                        scalar-prefetched HBM offsets (the scatter half of
                        mt_lsb_sort.rs:40-133's private-range math). Sweeps
                        run length to expose the ~20ns-per-descriptor issue
                        floor.
  P3  pallas_bin256     REAL stable within-block binning kernel: 8-bit digit,
                        one-hot histogram, exclusive prefix via triangular
                        f32 matmul (Mosaic has no cumsum), stable rank via
                        masked equality matmul, one-hot placement by
                        select-accumulate (the binning half; runs it needs
                        to produce for P2 are avg block/256 elements long).
  P4  xla_levers        u16 vs u32 operand cost in lax.sort; 16-byte row
                        gather; batched row-sort with riding operands.
  P5  merge_cost        bitonic merge of two sorted 2^23 halves (ops/merge)
                        vs direct lax.sort at 10M / 2^24 — the config-1
                        split+merge plan's go/no-go.

Run sections individually (TPU compiles are minutes):
  python scripts/probe12.py P1 P2 ...
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, fn, x0, iters=8, bytes_per_el=None):
    """fn: x -> x-like. Times a chained fori_loop, reports ns/el."""

    @jax.jit
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

    n = int(jax.tree_util.tree_leaves(x0)[0].shape[0])
    try:
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
        gbs = ""
        if bytes_per_el:
            gbs = f"  ({bytes_per_el * n / per / 1e9:.0f} GB/s eff)"
        print(f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / n:.3f} ns/el{gbs}",
              flush=True)
        return per
    except Exception as e:  # noqa: BLE001 — probe must survive
        print(f"{label}: FAIL {repr(e)[:300]}", flush=True)
        return None


# ---------------------------------------------------------------- P1: copy
def p1_copy():
    TILE = 1 << 19
    n = 1 << 25
    R = TILE // 128

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)  # +1 defeats copy-elision

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // TILE, R, 128), jnp.uint32),
        )(x.reshape(n // TILE, R, 128)).reshape(n)

    x = jnp.arange(n, dtype=jnp.uint32)
    bench("P1 pallas passthrough 2^25 u32", run, x, bytes_per_el=8)


# ------------------------------------------------------- P2: DMA run scatter
# Layout: elements grouped into 128-lane rows; offsets are in ROW units so
# every DMA is a (rows,128) slab — the 128-lane-aligned shape DMA wants.
def _runs_kernel(off_ref, x_ref, o_hbm, sems, *, d_runs, rrows):
    t = pl.program_id(0)
    for d in range(d_runs):
        off = pl.multiple_of(off_ref[t * d_runs + d], rrows)
        pltpu.make_async_copy(
            x_ref.at[0, pl.ds(d * rrows, rrows), :],
            o_hbm.at[pl.ds(off, rrows), :],
            sems.at[d % 8],
        ).start()
        if d % 8 == 7 or d == d_runs - 1:
            lo = (d // 8) * 8
            for s in range(lo, d + 1):
                pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(0, rrows), :],
                    o_hbm.at[pl.ds(0, rrows), :],
                    sems.at[s % 8],
                ).wait()


def p2_runs(d_list=(8, 32, 128, 256)):
    n = 1 << 24
    TILE = 1 << 15  # 32K elements per tile in VMEM
    nrows = n // 128
    trows = TILE // 128
    for d_runs in d_list:
        run = TILE // d_runs
        rrows = run // 128
        if rrows == 0:
            print(f"P2 D={d_runs}: run < 128, skip", flush=True)
            continue
        tiles = n // TILE
        # offsets (in rows): run-granular transpose —
        # dst[t,d] = d*(tiles*rrows) + t*rrows
        off = (
            np.arange(d_runs)[None, :] * (tiles * rrows)
            + np.arange(tiles)[:, None] * rrows
        ).astype(np.int32).reshape(-1)
        off = jnp.asarray(off)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tiles,),
            in_specs=[pl.BlockSpec((1, trows, 128), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
        )

        def run_fn(x, off=off, d_runs=d_runs, rrows=rrows,
                   grid_spec=grid_spec):
            return pl.pallas_call(
                functools.partial(_runs_kernel, d_runs=d_runs, rrows=rrows),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.uint32),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(off, x.reshape(tiles, trows, 128)).reshape(n)

        x = jnp.arange(n, dtype=jnp.uint32)
        # correctness: run-granular transpose
        try:
            got = np.asarray(jax.jit(run_fn)(x))
            want = (
                np.arange(n, dtype=np.uint32)
                .reshape(tiles, d_runs, run)
                .transpose(1, 0, 2)
                .reshape(-1)
            )
            okmsg = "ok" if np.array_equal(got, want) else "WRONG"
        except Exception as e:  # noqa: BLE001
            print(f"P2 D={d_runs} run={run}: FAIL {repr(e)[:300]}", flush=True)
            continue
        bench(
            f"P2 run-scatter D={d_runs} run={run}el ({run*4}B) [{okmsg}]",
            run_fn, x, bytes_per_el=8,
        )


# --------------------------------------------------- P3: stable block binning
def _bin_kernel(x_ref, o_ref, *, blocks, shift):
    # operates on int32 planes (Mosaic lacks unsigned reductions/bitcasts);
    # logical shifts keep digit extraction exact for any bit pattern
    bins_col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)  # bin id
    lower = (
        jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    ).astype(jnp.float32)  # strictly-lower-triangular ones
    for b in range(blocks):
        x = x_ref[b, :].reshape(1, 256)
        d = jax.lax.shift_right_logical(x, jnp.int32(shift)) & 0xFF
        oh = (bins_col == d).astype(jnp.float32)  # (256 bins, 256 elems)
        hist = jnp.sum(oh, axis=1, keepdims=True)  # (256,1)
        prefix = jnp.dot(lower, hist,
                         preferred_element_type=jnp.float32)  # excl prefix
        # rank_i = #{j<i : d_j == d_i} ; E = oh^T @ oh has E[i,j]=[d_i==d_j]
        eq = jnp.dot(oh.T, oh, preferred_element_type=jnp.float32)
        rank = jnp.sum(eq * lower, axis=1, keepdims=True)  # (256 elems,1)
        base = jnp.dot(oh.T, prefix,
                       preferred_element_type=jnp.float32)  # prefix[d_i]
        pos = (base + rank).astype(jnp.int32).reshape(1, 256)  # (1,256 elems)
        posoh = bins_col == pos  # (256 out, 256 elems)
        out = jnp.sum(jnp.where(posoh, x, jnp.int32(0)), axis=1)
        o_ref[b, :] = out.reshape(256)


def p3_bin256():
    n = 1 << 23
    BLOCKS = 16  # blocks per grid step
    step_elems = BLOCKS * 256

    def run(x):
        xi = jax.lax.bitcast_convert_type(x, jnp.int32)
        out = pl.pallas_call(
            functools.partial(_bin_kernel, blocks=BLOCKS, shift=0),
            grid=(n // step_elems,),
            in_specs=[pl.BlockSpec((BLOCKS, 256), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLOCKS, 256), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // 256, 256), jnp.int32),
        )(xi.reshape(n // 256, 256)).reshape(n)
        return jax.lax.bitcast_convert_type(out, jnp.uint32)

    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.integers(0, 2**32, size=(4096,)).astype(np.uint32))
    try:
        got = np.asarray(jax.jit(run)(jnp.tile(small, n // 4096)))[:4096]
        want = np.concatenate([
            blk[np.argsort(blk & 0xFF, kind="stable")]
            for blk in np.asarray(small).reshape(16, 256)
        ])
        okmsg = "ok" if np.array_equal(got, want) else "WRONG"
    except Exception as e:  # noqa: BLE001
        print(f"P3 bin256: FAIL {repr(e)[:300]}", flush=True)
        return
    x = jnp.asarray(rng.integers(0, 2**32, size=(n,)).astype(np.uint32))
    bench(f"P3 block-256 stable bin (1 plane) [{okmsg}]", run, x,
          bytes_per_el=8)


# ------------------------------------------------------------ P4: XLA levers
def p4_xla():
    rng = np.random.default_rng(0)
    n = 1 << 23
    H = np.uint32(2654435761)

    def mk(dtype=np.uint32, k=1, n=n):
        return tuple(
            jnp.asarray(rng.integers(0, np.iinfo(dtype).max, size=n)
                        .astype(dtype))
            for _ in range(k)
        )

    def rh(ws):
        return tuple(
            (w.astype(jnp.uint32) * H + np.uint32(i)).astype(w.dtype)
            for i, w in enumerate(ws)
        )

    # u16 vs u32 rider cost: key u32 + k riders of each width
    for nr, rdt in ((1, np.uint32), (1, np.uint16), (2, np.uint16)):
        x0 = mk() + mk(rdt, nr)
        bench(
            f"P4 sort 1xu32key + {nr}x{np.dtype(rdt).name} rider",
            lambda ws: jax.lax.sort(rh(ws), num_keys=1), x0,
        )
    # 3op u32 reference point at this n
    bench("P4 sort 2xu32key(nk2) + u32 rider",
          lambda ws: jax.lax.sort(rh(ws), num_keys=2), mk(k=3))
    # 2xu32key + 2xu16 riders (c2 with split payload)
    bench("P4 sort 2xu32key(nk2) + 2xu16 riders",
          lambda ws: jax.lax.sort(rh(ws), num_keys=2),
          mk(k=2) + mk(np.uint16, 2))

    # 16-byte row gather (AoS movement primitive)
    rows = jnp.asarray(
        rng.integers(0, 2**32, size=(n // 4, 4)).astype(np.uint32))
    idx = jnp.asarray(rng.permutation(n // 4).astype(np.int32))

    def rowgather(c):
        rows, idx = c
        out = jnp.take(rows, idx, axis=0)
        return out, (idx + 1) % (n // 4)

    bench("P4 16B-row gather (per LOGICAL row of 4xu32)", rowgather,
          (rows, idx))

    # batched row sorts with riders: (2048, 4096)
    m = (2048, 4096)
    for k, nk in ((1, 1), (2, 1), (3, 1), (4, 1)):
        ws = tuple(
            jnp.asarray(rng.integers(0, 2**32, size=m).astype(np.uint32))
            for _ in range(k)
        )
        bench(
            f"P4 row-sort (2048x4096) {k}op nk={nk}",
            lambda ws, nk=nk: jax.lax.sort(
                tuple((w * H + np.uint32(i)) for i, w in enumerate(ws)),
                num_keys=nk, dimension=1),
            ws,
        )


# ------------------------------------------------------------ P5: merge cost
def p5_merge():
    sys.path.insert(0, "/root/repo")
    from rdst_tpu.ops.merge import merge_sorted

    rng = np.random.default_rng(0)
    H = np.uint32(2654435761)
    h = 1 << 23

    def split_merge(x):
        x = x * H + np.uint32(3)
        a = jax.lax.sort((x[:h],))[0]
        b = jax.lax.sort((x[h:],))[0]
        return jnp.concatenate(merge_sorted([a], [b], 1))

    def direct(x):
        return jax.lax.sort((x * H + np.uint32(3),))[0]

    x = jnp.asarray(rng.integers(0, 2**32, size=2 * h).astype(np.uint32))
    bench("P5 direct lax.sort 2^24 u32", direct, x)
    bench("P5 split(2x2^23)+bitonic-merge 2^24 u32", split_merge, x)

    x10 = jnp.asarray(rng.integers(0, 2**32, size=10_000_000)
                      .astype(np.uint32))
    bench("P5 direct lax.sort 10M u32", direct, x10)

    def split_merge_10m(x):
        x = x * H + np.uint32(3)
        a = jax.lax.sort((x[:h],))[0]
        rest = jnp.concatenate([
            x[h:], jnp.full((2 * h - 10_000_000,), np.uint32(0xFFFFFFFF))])
        b = jax.lax.sort((rest,))[0]
        return jnp.concatenate(merge_sorted([a], [b], 1))[:10_000_000]

    bench("P5 split+merge 10M u32 (pad tail to 2^23)", split_merge_10m, x10)


SECTIONS = {"P1": p1_copy, "P2": p2_runs, "P3": p3_bin256, "P4": p4_xla,
            "P5": p5_merge}

if __name__ == "__main__":
    which = sys.argv[1:] or list(SECTIONS)
    print(f"devices: {jax.devices()}", flush=True)
    for s in which:
        print(f"=== {s} ===", flush=True)
        SECTIONS[s]()

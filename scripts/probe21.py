"""Probe 21: can multiple bitonic stages retire per VMEM sweep?

probe20 found the tail kernel is VMEM-streaming bound: roll-form,
pair-split and even pure minmax all cost ~0.0064-0.0076 ns/el/stage —
each jnp-level stage streams the block through VMEM.  If stages whose
strides fit inside one (8, 128) vreg can run back-to-back in registers,
the 10 small-stride stages of every merge level collapse to ~one sweep.

  A1  10 in-vreg stages (strides 512..1 within a 1024-element window),
      grid cell = (8, 128) = ONE vreg per plane, 2 planes
  A2  same 10 stages, one grid cell per 2^17 block (the production
      shape) — Mosaic sees the same rolls on a (1024, 128) block
  B1  CEIL 1-plane minmax x17 (traffic 8 B/el/stage)   } separate
  B2  CEIL 2-plane minmax x34 stages                   } traffic from
      (if per-stage cost halves at 1 plane and doubles at 34 stages,
      the bound is traffic, not fixed overhead)
  C1  ONE stage only at the production block (lower bound per sweep)

Run:  timeout 590 python scripts/probe21.py [a1 a2 b1 b2 c1]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_merge import LANES, _lex_gt, _roll  # noqa: E402
from rdst_tpu.ops.pallas_sort import _dir_stage  # noqa: E402

N = 1 << 25
BLOCK = 1 << 17
ROWS = BLOCK // LANES


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, fn, x0, n=N, iters=8, stages=1):
    @jax.jit
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

    try:
        _sync(once(x0))
        t0 = time.perf_counter()
        _sync(once(x0))
        t1 = time.perf_counter() - t0
        _sync(many(x0))
        t0 = time.perf_counter()
        _sync(many(x0))
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(
            f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / n:.3f} ns/el"
            f"  ({per * 1e9 / n / stages:.4f} ns/el/stage)",
            flush=True,
        )
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {repr(e)[:300]}", flush=True)
        return None


def planes(k=2):
    rng = np.random.default_rng(1)
    return tuple(
        jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        for _ in range(k)
    )


def _chain(ws):
    return [w + np.uint32(1) for w in ws]


def _ten_stages(v, n_keys):
    """Strides 512..128 on the sublane axis (rows 4, 2, 1), then 64..1 on
    the lane axis — all within one (8, 128) vreg when rows == 8."""
    for k in (4, 2, 1):
        v = _dir_stage(v, n_keys, k, 0)
    for k in (64, 32, 16, 8, 4, 2, 1):
        v = _dir_stage(v, n_keys, k, 1)
    return v


def _a_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    v = _ten_stages(v, n_keys)
    for p, o in zip(v, outs):
        o[0] = p


def _run_grid(kernel, ws, rows):
    shaped = [p.reshape(N // (rows * LANES), rows, LANES)
              for p in _chain(ws)]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(kernel, n_keys=2),
        grid=(N // (rows * LANES),),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def a1():
    ws = planes()
    bench("A1 10 in-vreg stages, (8,128) cells",
          lambda w: _run_grid(_a_kernel, w, 8), ws, stages=10)


def a2():
    ws = planes()
    bench("A2 same 10 stages, (1024,128) cells",
          lambda w: _run_grid(_a_kernel, w, ROWS), ws, stages=10)


def _ceil_kernel(*refs, n_keys, reps):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    for _ in range(reps):
        sw = _lex_gt(v[:n_keys], [p + np.uint32(1) for p in v[:n_keys]])
        v = [jnp.where(sw, p + np.uint32(1), p) for p in v]
    for p, o in zip(v, outs):
        o[0] = p


def b1():
    ws = planes(1)
    def run(w):
        shaped = [p.reshape(N // BLOCK, ROWS, LANES) for p in _chain(w)]
        spec = lambda: pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))
        out = pl.pallas_call(
            functools.partial(_ceil_kernel, n_keys=1, reps=17),
            grid=(N // BLOCK,),
            in_specs=[spec()],
            out_specs=[spec()],
            out_shape=[jax.ShapeDtypeStruct(shaped[0].shape,
                                            shaped[0].dtype)],
        )(*shaped)
        return (out[0].reshape(N),)
    bench("B1 CEIL 1-plane x17", run, ws, stages=17)


def b2():
    ws = planes()
    def run(w):
        shaped = [p.reshape(N // BLOCK, ROWS, LANES) for p in _chain(w)]
        spec = lambda: pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))
        out = pl.pallas_call(
            functools.partial(_ceil_kernel, n_keys=2, reps=34),
            grid=(N // BLOCK,),
            in_specs=[spec() for _ in shaped],
            out_specs=[spec() for _ in shaped],
            out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype)
                       for p in shaped],
        )(*shaped)
        return tuple(p.reshape(N) for p in out)
    bench("B2 CEIL 2-plane x34", run, ws, stages=34)


def _one_stage_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    v = _dir_stage(v, n_keys, ROWS // 2, 0)
    for p, o in zip(v, outs):
        o[0] = p


def c1():
    ws = planes()
    bench("C1 one stage, (1024,128) cells",
          lambda w: _run_grid(_one_stage_kernel, w, ROWS), ws, stages=1)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["a1", "a2", "b1", "b2", "c1"]
    for s in sections:
        globals()[s]()

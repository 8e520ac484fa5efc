"""Probe 23: is the per-sweep cost launch/scheduling or bandwidth?

probe21 C1 measured ONE compare-exchange stage at the production block
(2^17 el, 2 planes) at 0.046 ns/el = 348 GB/s of HBM r+w — well under
the v5e's ~820 GB/s.  The 17-stage tail cost is additive (sweep +
stages), suggesting the Mosaic grid pipeline is not hiding compute
behind DMA.  Questions:

  P0  pure-copy kernel at the production block    -> the sweep floor
  P1  pure-copy + dimension_semantics=parallel
  C1  one stage (probe21 C1 re-run, cached)
  C1P one stage + parallel semantics
  T17 17 stages (one merge level) default
  T17P 17 stages + parallel semantics
  B2  copy with 2x bigger block (2^18)            -> launch-overhead test
  B0  copy with 2^15 block

Run:  timeout 590 python scripts/probe23.py [p0 p1 c1 c1p t17 t17p b2 b0]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_merge import LANES  # noqa: E402
from rdst_tpu.ops.pallas_sort import _dir_stage, _level_stages  # noqa: E402

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


def _copy_kernel(*refs):
    half = len(refs) // 2
    for i, o in zip(refs[:half], refs[half:]):
        o[0] = i[0]


def _one_stage_kernel(*refs, n_keys, rows):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    v = _dir_stage(v, n_keys, rows // 2, 0)
    for p, o in zip(v, outs):
        o[0] = p


def _t17_kernel(*refs, n_keys, rows):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    v = _level_stages(v, n_keys, rows * LANES // 2)
    for p, o in zip(v, outs):
        o[0] = p


def _run_grid(kernel, ws, rows, parallel=False, kw=None):
    shaped = [p.reshape(N // (rows * LANES), rows, LANES)
              for p in _chain(ws)]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    params = {}
    if parallel:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    out = pl.pallas_call(
        functools.partial(kernel, **(kw or {})),
        grid=(N // (rows * LANES),),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
        **params,
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def p0():
    ws = planes()
    bench("P0 copy 2^17 default",
          lambda w: _run_grid(_copy_kernel, w, ROWS), ws)


def p1():
    ws = planes()
    bench("P1 copy 2^17 parallel",
          lambda w: _run_grid(_copy_kernel, w, ROWS, parallel=True), ws)


def c1():
    ws = planes()
    bench("C1 one stage default",
          lambda w: _run_grid(_one_stage_kernel, w, ROWS,
                              kw=dict(n_keys=2, rows=ROWS)), ws)


def c1p():
    ws = planes()
    bench("C1P one stage parallel",
          lambda w: _run_grid(_one_stage_kernel, w, ROWS, parallel=True,
                              kw=dict(n_keys=2, rows=ROWS)), ws)


def t17():
    ws = planes()
    bench("T17 17 stages default",
          lambda w: _run_grid(_t17_kernel, w, ROWS,
                              kw=dict(n_keys=2, rows=ROWS)), ws, stages=17)


def t17p():
    ws = planes()
    bench("T17P 17 stages parallel",
          lambda w: _run_grid(_t17_kernel, w, ROWS, parallel=True,
                              kw=dict(n_keys=2, rows=ROWS)), ws, stages=17)


def b2():
    ws = planes()
    bench("B2 copy 2^18 parallel",
          lambda w: _run_grid(_copy_kernel, w, 2 * ROWS, parallel=True), ws)


def b0():
    ws = planes()
    bench("B0 copy 2^15 parallel",
          lambda w: _run_grid(_copy_kernel, w, ROWS // 4, parallel=True), ws)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["p0", "p1", "c1", "c1p", "t17", "t17p",
                                "b2", "b0"]
    for s in sections:
        globals()[s]()

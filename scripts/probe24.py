"""Probe 24: bigger VMEM blocks + parallel semantics on SHORT kernels.

probe23 hinted parallel semantics may hurt short kernels (C1P 0.059 vs
probe21 C1 0.046) while helping long ones (T17 -5%).  And a 2^18 block
(2 planes: 2 MB in + 2 MB out + temporaries) would cut the production
sweep count from ~17 to ~15.

  T18   18-stage tail level at block 2^18, default semantics
  T18P  same, parallel semantics
  S4    4-stage span-shaped kernel (production span: p_dim=16,
        w_rows=64) default
  S4P   same, parallel

Run:  timeout 590 python scripts/probe24.py [t18 t18p s4 s4p]
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


def _tail_lvl_kernel(*refs, n_keys, rows):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    v = _level_stages(v, n_keys, rows * LANES // 2)
    for p, o in zip(v, outs):
        o[0] = p


def _span4_kernel(*refs, n_keys, w_rows):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    p_dim = ins[0].shape[1]
    v = [r[0, :, 0].reshape(p_dim * w_rows, LANES) for r in ins]
    k = (p_dim // 2) * w_rows
    for _ in range(4):
        v = _dir_stage(v, n_keys, k, 0)
        k //= 2
    for p, o in zip(v, outs):
        o[0, :, 0] = p.reshape(p_dim, w_rows, LANES)


def _params(parallel, rank):
    if not parallel:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("parallel",) * rank
        )
    }


def _run_tail(ws, rows, parallel):
    shaped = [p.reshape(N // (rows * LANES), rows, LANES)
              for p in _chain(ws)]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_tail_lvl_kernel, n_keys=2, rows=rows),
        grid=(N // (rows * LANES),),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
        **_params(parallel, 1),
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def _run_span(ws, parallel):
    # production span shape at level log_r=20, blk=2^17: s_hi=2^20,
    # s_lo=2^17, p_dim=16, w=2^13, w_rows=64, w_cells=16, a_dim=16
    p_dim, w_rows, w_cells = 16, 64, 16
    a_dim = N // (p_dim * w_rows * LANES * w_cells)
    shaped = [p.reshape(a_dim, p_dim, w_cells, w_rows, LANES)
              for p in _chain(ws)]
    spec = lambda: pl.BlockSpec(
        (1, p_dim, 1, w_rows, LANES), lambda a, b: (a, 0, b, 0, 0)
    )
    out = pl.pallas_call(
        functools.partial(_span4_kernel, n_keys=2, w_rows=w_rows),
        grid=(a_dim, w_cells),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
        **_params(parallel, 2),
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def t18():
    ws = planes()
    bench("T18 18-stage tail 2^18 default",
          lambda w: _run_tail(w, 1 << 11, False), ws, stages=18)


def t18p():
    ws = planes()
    bench("T18P 18-stage tail 2^18 parallel",
          lambda w: _run_tail(w, 1 << 11, True), ws, stages=18)


def s4():
    ws = planes()
    bench("S4 4-stage span default",
          lambda w: _run_span(w, False), ws, stages=4)


def s4p():
    ws = planes()
    bench("S4P 4-stage span parallel",
          lambda w: _run_span(w, True), ws, stages=4)




def _run_tail_k(ws, rows, n_keys):
    shaped = [p.reshape(N // (rows * LANES), rows, LANES)
              for p in _chain(ws)]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_tail_lvl_kernel, n_keys=n_keys, rows=rows),
        grid=(N // (rows * LANES),),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def t19_1p():
    ws = planes(1)
    bench("T19_1P 19-stage tail 2^19 1-plane default",
          lambda w: _run_tail_k(w, 1 << 12, 1), ws, stages=19)


def t17_4p():
    ws = planes(4)
    bench("T17_4P 17-stage tail 2^17 4-plane default",
          lambda w: _run_tail_k(w, 1 << 10, 2), ws, stages=17)



def t19_2p():
    ws = planes(2)
    bench("T19_2P 19-stage tail 2^19 2-plane default",
          lambda w: _run_tail_k(w, 1 << 12, 2), ws, stages=19)


def t20_1p():
    ws = planes(1)
    bench("T20_1P 20-stage tail 2^20 1-plane default",
          lambda w: _run_tail_k(w, 1 << 13, 1), ws, stages=20)


def t18_4p():
    ws = planes(4)
    bench("T18_4P 18-stage tail 2^18 4-plane default",
          lambda w: _run_tail_k(w, 1 << 11, 2), ws, stages=18)



def _run_tail_prod(ws, rows, vmem_mb=None):
    """The production single-level tail shape: scalar desc from
    program_id parity (the form that tips scoped vmem past 16 MB)."""
    import rdst_tpu.ops.pallas_sort as psort
    shaped = [p.reshape(N // (rows * LANES), rows, LANES)
              for p in _chain(ws)]
    spec = lambda: pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0))
    params = {}
    if vmem_mb is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20
        )
    out = pl.pallas_call(
        functools.partial(
            psort._tail_kernel, n_keys=2, block=rows * LANES,
            levels=((26, rows * LANES // 2),), unflip_shift=None,
        ),
        grid=(N // (rows * LANES),),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
        **params,
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def v32():
    ws = planes(2)
    bench("V32 prod tail 2^18 vmem_limit=32MB",
          lambda w: _run_tail_prod(w, 1 << 11, 32), ws, stages=18)


def v64():
    ws = planes(2)
    bench("V64 prod tail 2^18 vmem_limit=64MB",
          lambda w: _run_tail_prod(w, 1 << 11, 64), ws, stages=18)


def v0():
    ws = planes(2)
    bench("V0 prod tail 2^18 default limit (expect FAIL)",
          lambda w: _run_tail_prod(w, 1 << 11, None), ws, stages=18)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["t18", "t18p", "s4", "s4p"]
    for s in sections:
        globals()[s]()

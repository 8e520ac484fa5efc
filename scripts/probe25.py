"""Probe 25: narrow-plane (u16/u8) stage cost in the fused tail kernels.

probe12 P4 measured lax.sort operand cost as proportional to BYTES (a
u16 rider costs ~half a u32 rider).  The fused kernels currently widen
every sub-32-bit plane to uint32 (_widen), throwing that away.  Question:
does Mosaic run the compare-exchange stage machinery natively on u16/u8
planes, and does a narrow plane cost proportionally less per stage?

Sections (18-stage tail level at block 2^18, N=2^25, per probe24 T18):
  a2     2 x u32 (key,key)                 — baseline, same-process
  b      u32 key + u16 rider              — the stable-index / rider case
  c      u16 key + u32 rider              — narrow MSW compare
  d      2 x u16                           — all-narrow
  a4     4 x u32 (2 keys, 2 riders)        — c2-stable shape baseline
  f4     u32,u32 keys + u16,u16 riders     — narrowed riders
  g4     u32,u32,u16(key3) + u32 rider     — 3-key compare w/ narrow idx
  u8     u32 key + u8 rider               — byte rider
  p0     phase-0 batched lax.sort rows: u32+u32 vs u32+u16 vs u32+u8

Run:  timeout 590 python scripts/probe25.py [a2 b c d a4 f4 g4 u8 p0]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_merge import LANES  # noqa: E402
from rdst_tpu.ops.pallas_sort import _level_stages  # noqa: E402

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


def planes(dtypes):
    rng = np.random.default_rng(1)
    out = []
    for dt in dtypes:
        hi = np.iinfo(dt).max
        out.append(
            jnp.asarray(rng.integers(0, hi, size=N).astype(dt))
        )
    return tuple(out)


def _chain(ws):
    return [w + w.dtype.type(1) for w in ws]


def _tail_lvl_kernel(*refs, n_keys, rows):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    v = _level_stages(v, n_keys, rows * LANES // 2)
    for p, o in zip(v, outs):
        o[0] = p


def _run_tail(ws, rows, n_keys):
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


ROWS = 1 << 10  # block 2^17, 17 stages (2^18 at nk=1 blows scoped vmem)


def a2():
    ws = planes([np.uint32, np.uint32])
    bench("a2 17st u32+u32 nk=1", lambda w: _run_tail(w, ROWS, 1),
          ws, stages=17)


def b():
    ws = planes([np.uint32, np.uint16])
    bench("b  17st u32key+u16rider nk=1", lambda w: _run_tail(w, ROWS, 1),
          ws, stages=17)


def c():
    ws = planes([np.uint16, np.uint32])
    bench("c  17st u16key+u32rider nk=1", lambda w: _run_tail(w, ROWS, 1),
          ws, stages=17)


def d():
    ws = planes([np.uint16, np.uint16])
    bench("d  17st u16+u16 nk=1", lambda w: _run_tail(w, ROWS, 1),
          ws, stages=17)


def a4():
    ws = planes([np.uint32] * 4)
    bench("a4 17st 4xu32 nk=2", lambda w: _run_tail(w, ROWS, 2),
          ws, stages=17)


def f4():
    ws = planes([np.uint32, np.uint32, np.uint16, np.uint16])
    bench("f4 17st u32,u32+u16,u16 nk=2", lambda w: _run_tail(w, ROWS, 2),
          ws, stages=17)


def g4():
    ws = planes([np.uint32, np.uint32, np.uint16, np.uint32])
    bench("g4 17st u32,u32,u16key3+u32 nk=3",
          lambda w: _run_tail(w, ROWS, 3), ws, stages=17)


def u8():
    ws = planes([np.uint32, np.uint8])
    bench("u8 17st u32key+u8rider nk=1", lambda w: _run_tail(w, ROWS, 1),
          ws, stages=17)


def _run_p0(ws, n_keys):
    m = 1 << 12
    rows = [p.reshape(N // m, m) for p in _chain(ws)]
    srt = jax.lax.sort(tuple(rows), dimension=1, num_keys=n_keys,
                       is_stable=False)
    return tuple(p.reshape(N) for p in srt)


def p0():
    for dts, lbl in [
        ([np.uint32, np.uint32], "u32+u32"),
        ([np.uint32, np.uint16], "u32+u16"),
        ([np.uint32, np.uint8], "u32+u8"),
        ([np.uint16, np.uint16], "u16+u16"),
    ]:
        ws = planes(dts)
        bench(f"p0 lax.sort rows4096 {lbl} nk=1",
              lambda w: _run_p0(w, 1), ws)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["a2", "b", "c", "d", "a4", "f4", "g4",
                                "u8", "p0"]
    for s in sections:
        globals()[s]()

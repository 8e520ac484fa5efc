"""Probe 26: what narrow-plane support does Mosaic actually admit?

probe25 answered half of VERDICT item 1: u16/u8 planes through the
roll-form stage kernels FAIL Mosaic compile outright — "not implemented:
Rotate with non-32-bit data" (pltpu.roll has no sub-32-bit lowering).
lax.sort (phase 0) handles narrow operands natively and byte-
proportionally (u32+u16 0.432 vs u32+u32 0.537 ns/el at 4096-rows).

This probe tests the remaining formulations:
  w16   u16 refs, widen to u32 on load, full 17-stage level in u32,
        narrow on store — halves the plane's HBM traffic, VPU cost
        unchanged.  (+w8: same with u8.)
  cat16 native-u16 stages via concat-slice "roll" (no pltpu.roll):
        up/dn built from jnp.concatenate of static slices along the
        sublane axis.
  rsh16 native-u16 sublane stage via pair-split reshape
        (rows,LANES)->(rows/2k,2,k,LANES), compare-exchange between
        [:,0] and [:,1], no roll at all.
  base  u32+u32 17-stage level (same-process baseline).

Run:  timeout 590 python scripts/probe26.py [base w16 w8 cat16 rsh16]
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
from rdst_tpu.ops.pallas_sort import _level_stages  # noqa: E402

N = 1 << 25
ROWS = 1 << 10  # block 2^17


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
        msg = repr(e)
        key = "not implemented"
        if key in msg:
            i = msg.index(key)
            msg = msg[i : i + 120]
        else:
            msg = msg[:200]
        print(f"{label}: FAIL {msg}", flush=True)
        return None


def planes(dtypes):
    rng = np.random.default_rng(1)
    return tuple(
        jnp.asarray(rng.integers(0, np.iinfo(dt).max, size=N).astype(dt))
        for dt in dtypes
    )


def _chain(ws):
    return [w + w.dtype.type(1) for w in ws]


def _mk_call(kernel, shaped, grid):
    spec = lambda: pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
    )(*shaped)


# --- w16 / w8: widen-on-load ------------------------------------------------

def _widen_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    narrow = [p.dtype for p in v]
    v = [p.astype(jnp.uint32) if p.dtype != jnp.uint32 else p for p in v]
    v = _level_stages(v, n_keys, ROWS * LANES // 2)
    for p, o, dt in zip(v, outs, narrow):
        o[0] = p.astype(dt) if dt != jnp.uint32 else p


def _run_widen(ws, n_keys):
    shaped = [p.reshape(N // (ROWS * LANES), ROWS, LANES)
              for p in _chain(ws)]
    out = _mk_call(
        functools.partial(_widen_kernel, n_keys=n_keys), shaped,
        (N // (ROWS * LANES),),
    )
    return tuple(p.reshape(N) for p in out)


def base():
    ws = planes([np.uint32, np.uint32])
    bench("base 17st u32+u32", lambda w: _run_widen(w, 1), ws, stages=17)


def w16():
    ws = planes([np.uint32, np.uint16])
    bench("w16  17st u32key+u16rider widen-on-load",
          lambda w: _run_widen(w, 1), ws, stages=17)


def w8():
    ws = planes([np.uint32, np.uint8])
    bench("w8   17st u32key+u8rider widen-on-load",
          lambda w: _run_widen(w, 1), ws, stages=17)


def w16k():
    ws = planes([np.uint16, np.uint32])
    bench("w16k 17st u16key+u32rider widen-on-load",
          lambda w: _run_widen(w, 1), ws, stages=17)


def w4():
    ws = planes([np.uint32, np.uint32, np.uint16, np.uint32])
    bench("w4   17st u32,u32,u16(k3),u32 widen-on-load nk=3",
          lambda w: _run_widen(w, 3), ws, stages=17)


# --- cat16: native u16, concat-slice roll -----------------------------------

def _cat_roll(p, k, axis):
    if axis == 0:
        return jnp.concatenate([p[k:], p[:k]], axis=0)
    return jnp.concatenate([p[:, k:], p[:, :k]], axis=1)


def _cat_stage(v, n_keys, k, axis):
    iota = jax.lax.broadcasted_iota(jnp.int32, v[0].shape, axis)
    low = (iota & k) == 0
    up = [_cat_roll(p, k, axis) for p in v]
    dn = [_cat_roll(p, (p.shape[axis] - k), axis) for p in v]
    take_up = low & _lex_gt(v[:n_keys], up[:n_keys])
    take_dn = (~low) & _lex_gt(dn[:n_keys], v[:n_keys])
    return [
        jnp.where(take_up, u, jnp.where(take_dn, d_, p))
        for p, u, d_ in zip(v, up, dn)
    ]


def _cat_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    s = ROWS * LANES // 2
    while s >= LANES:
        v = _cat_stage(v, n_keys, s // LANES, 0)
        s //= 2
    while s >= 1:
        v = _cat_stage(v, n_keys, s, 1)
        s //= 2
    for p, o in zip(v, outs):
        o[0] = p


def cat16():
    ws = planes([np.uint16, np.uint16])
    shapedize = lambda w: [p.reshape(N // (ROWS * LANES), ROWS, LANES)
                           for p in _chain(w)]
    def run(w):
        out = _mk_call(functools.partial(_cat_kernel, n_keys=1),
                       shapedize(w), (N // (ROWS * LANES),))
        return tuple(p.reshape(N) for p in out)
    bench("cat16 17st u16+u16 concat-roll", run, ws, stages=17)


def cat32():
    ws = planes([np.uint32, np.uint32])
    shapedize = lambda w: [p.reshape(N // (ROWS * LANES), ROWS, LANES)
                           for p in _chain(w)]
    def run(w):
        out = _mk_call(functools.partial(_cat_kernel, n_keys=1),
                       shapedize(w), (N // (ROWS * LANES),))
        return tuple(p.reshape(N) for p in out)
    bench("cat32 17st u32+u32 concat-roll", run, ws, stages=17)


# --- rsh16: native u16, pair-split reshape (sublane strides only) -----------

def _rsh_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]  # (ROWS, LANES)
    k = ROWS // 2
    while k >= 1:
        vv = [p.reshape(ROWS // (2 * k), 2, k, LANES) for p in v]
        lo = [p[:, 0] for p in vv]
        hi = [p[:, 1] for p in vv]
        swap = _lex_gt(lo[:n_keys], hi[:n_keys])
        v = [
            jnp.stack(
                [jnp.where(swap, h, l), jnp.where(swap, l, h)], axis=1
            ).reshape(ROWS, LANES)
            for l, h in zip(lo, hi)
        ]
        k //= 2
    for p, o in zip(v, outs):
        o[0] = p


def rsh16():
    ws = planes([np.uint16, np.uint16])
    shapedize = lambda w: [p.reshape(N // (ROWS * LANES), ROWS, LANES)
                           for p in _chain(w)]
    def run(w):
        out = _mk_call(functools.partial(_rsh_kernel, n_keys=1),
                       shapedize(w), (N // (ROWS * LANES),))
        return tuple(p.reshape(N) for p in out)
    bench("rsh16 10st(sublane) u16+u16 pair-split", run, ws, stages=10)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["base", "w16", "w8", "w16k", "w4",
                                "cat16", "cat32", "rsh16"]
    for s in sections:
        globals()[s]()

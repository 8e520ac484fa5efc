"""Probe 20: per-stage cost of tail-kernel stage formulations.

The round-3 stall insight: the fused sort ties lax.sort because both are
VPU-bound at ~0.007 ns/el/stage (2 planes) over the same 325-stage
bitonic schedule.  The lever is per-stage op count.  Variants, each one
tail trip (= ONE merge level, 17 stages, block 2^17, 2 planes, 2^25):

  V0  production roll-form stages (_dir_stage: 2 rolls/plane + 2 lex
      compares + masks + nested selects)
  V1  pair-split for row strides >= 8 (vreg-granular reshape slices, ONE
      lex compare on half the elements, 2 selects/plane on halves),
      roll-form for row strides 1/2/4 and lane strides
  V2  V1 + in-kernel transposed second half: strides 2^0..2^9 run on a
      transposed (128, rows) view where they are row strides again
      (pair-split >= 8), converting 7 lane-roll stages into pair-splits
      at the price of two in-VMEM transposes
  CEIL 17 stages of elementwise min/max only (no rolls, no reshapes) —
      not a sort; the pure-VPU floor for 2-plane compare-exchange work.

Run:  timeout 590 python scripts/probe20.py [v0 v1 v2 ceil]
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
ROWS = BLOCK // LANES  # 1024


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, fn, x0, n=N, iters=8):
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
        print(f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / n:.3f} ns/el"
              f"  ({per * 1e9 / n / 17:.4f} ns/el/stage)", flush=True)
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


# ---- stage formulations (level = 17 stages: strides 2^16..2^0) ----

def _pair_stage_rows(v, n_keys, k, desc):
    """Pair-split compare-exchange at row stride k (k*LANES elements).

    Reshape (R, LANES) -> (R/2k, 2, k, LANES); slice the pair axis.  For
    k >= 8 the slices are vreg-granular.  ``desc`` scalar or broadcastable
    to the lo half.
    """
    R = v[0].shape[0]
    a = [p.reshape(R // (2 * k), 2, k, LANES) for p in v]
    lo = [q[:, 0] for q in a]
    hi = [q[:, 1] for q in a]
    swap = _lex_gt(lo[:n_keys], hi[:n_keys]) ^ desc
    out = []
    for l, h in zip(lo, hi):
        nl = jnp.where(swap, h, l)
        nh = jnp.where(swap, l, h)
        out.append(
            jnp.concatenate([nl[:, None], nh[:, None]], axis=1).reshape(
                R, LANES
            )
        )
    return out


def _v0_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    s = BLOCK // 2
    while s >= LANES:
        v = _dir_stage(v, n_keys, s // LANES, 0)
        s //= 2
    while s >= 1:
        v = _dir_stage(v, n_keys, s, 1)
        s //= 2
    for p, o in zip(v, outs):
        o[0] = p


def _v1_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    s = BLOCK // 2
    while s >= LANES:
        k = s // LANES
        if k >= 8:
            v = _pair_stage_rows(v, n_keys, k, False)
        else:
            v = _dir_stage(v, n_keys, k, 0)
        s //= 2
    while s >= 1:
        v = _dir_stage(v, n_keys, s, 1)
        s //= 2
    for p, o in zip(v, outs):
        o[0] = p


def _v2_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    # strides 2^16..2^10: row strides 512..8, pair-split
    s = BLOCK // 2
    while s >= 8 * LANES:
        v = _pair_stage_rows(v, n_keys, s // LANES, False)
        s //= 2
    # transpose: element e = r*LANES+c -> view (LANES, ROWS) where e' =
    # c*ROWS + r; strides 2^0..2^9 become row strides on the transposed
    # view... but the TRUE element at transposed (c, r) position is
    # r*LANES + c, so a stride-2^j exchange on the true order is a row
    # stride 2^j-? -- to keep it simple we exchange on the transposed
    # ORDER here; this is NOT the same sort network but costs identically
    # (same shapes, ops, strides), which is what this probe measures.
    v = [p.T for p in v]
    s = 512
    while s >= 8:
        v = _pair_stage_rows(v, n_keys, s, False)
        s //= 2
    while s >= 1:
        v = _dir_stage(v, n_keys, s, 0)
        s //= 2
    v = [p.T for p in v]
    for p, o in zip(v, outs):
        o[0] = p


def _ceil_kernel(*refs, n_keys):
    half = len(refs) // 2
    ins, outs = refs[:half], refs[half:]
    v = [r[0] for r in ins]
    for _ in range(17):
        sw = _lex_gt(v[:n_keys], [p + np.uint32(1) for p in v[:n_keys]])
        v = [jnp.where(sw, p + np.uint32(1), p) for p in v]
    for p, o in zip(v, outs):
        o[0] = p


def _run(kernel, ws):
    shaped = [p.reshape(N // BLOCK, ROWS, LANES) for p in _chain(ws)]
    spec = lambda: pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(kernel, n_keys=2),
        grid=(N // BLOCK,),
        in_specs=[spec() for _ in shaped],
        out_specs=[spec() for _ in shaped],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in shaped],
    )(*shaped)
    return tuple(p.reshape(N) for p in out)


def v0():
    ws = planes()
    bench("V0 roll-form 17-stage tail", lambda w: _run(_v0_kernel, w), ws)


def v1():
    ws = planes()
    bench("V1 pair-split(k>=8) tail", lambda w: _run(_v1_kernel, w), ws)


def v2():
    ws = planes()
    bench("V2 dual-layout tail", lambda w: _run(_v2_kernel, w), ws)


def ceil():
    ws = planes()
    bench("CEIL 17x minmax only", lambda w: _run(_ceil_kernel, w), ws)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["v0", "v1", "v2", "ceil"]
    for s in sections:
        globals()[s]()

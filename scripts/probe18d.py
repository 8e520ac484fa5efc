"""Probe 18d: fast reversal forms (probe18c R1 showed flat rev = 1.92 ns/el).

A flat reversal equals reversing BOTH axes of the (rows, 128) row-major
view. Candidates at 2^24 elements, 2-plane:
  V1  flat x[::-1] (the slow baseline inside merge_level today)
  V2  lax.rev(x.reshape(-1,128), (0,1)) then reshape back
  V3  the merge_level use: reverse odd runs of (pairs, 2, run) via the
      2D trick per run
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")

N = 1 << 25
RUN = 1 << 24

def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))

def bench(label, fn, x0, iters=8):
    once = jax.jit(fn)
    many = jax.jit(lambda x: jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x))
    try:
        _sync(once(x0)); t0 = time.perf_counter(); _sync(once(x0))
        t1 = time.perf_counter() - t0
        _sync(many(x0)); t0 = time.perf_counter(); _sync(many(x0))
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(f"{label}: {per*1e3:.3f} ms = {per*1e9/N:.3f} ns/el", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {repr(e)[:300]}", flush=True)

rng = np.random.default_rng(4)
ws = tuple(jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32)) for _ in range(2))

def v1(ws):
    return tuple(jnp.concatenate([p[:RUN], p[RUN:][::-1]]) for p in ws)

def v2(ws):
    out = []
    for p in ws:
        b = jax.lax.rev(p[RUN:].reshape(-1, 128), (0, 1)).reshape(RUN)
        out.append(jnp.concatenate([p[:RUN], b]))
    return tuple(out)

def v3(ws):
    out = []
    for p in ws:
        v = p.reshape(-1, 2, RUN // 128, 128)
        r = jax.lax.rev(v[:, 1], (1, 2))
        out.append(jnp.stack([v[:, 0], r], 1).reshape(N))
    return tuple(out)

bench("V1 flat [::-1] run=2^24 2-plane", v1, ws)
bench("V2 2D rev(0,1) run=2^24 2-plane", v2, ws)
bench("V3 (pairs,2,rows,128) rev 2-plane", v3, ws)

"""Probe 18c: what makes a LARGE-run merge level cost 2.2 ns/el (18b B2)?

Separates the three candidate costs at run=2^24 on 2^25 2-plane data:
  R1  the reversal pass alone (XLA rev on a 2^24-long axis)
  R2  ONE pairwise stage kernel at stride 2^24
  R3  ONE pairwise stage kernel at stride 2^17 (control: small stride)

Run: python scripts/probe18c.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rdst_tpu.ops.pallas_merge import _pallas_stage  # noqa: E402

N = 1 << 25


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))


def bench(label, fn, x0, iters=8):
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
        print(f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / N:.3f} ns/el",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {repr(e)[:400]}", flush=True)


def main():
    rng = np.random.default_rng(3)
    ws = tuple(
        jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        for _ in range(2)
    )
    run = N // 2

    def rev(ws):
        out = []
        for p in ws:
            v = p.reshape(-1, 2, run)
            out.append(
                jnp.concatenate([v[:, :1], v[:, 1:, ::-1]], 1).reshape(N)
            )
        return tuple(out)

    def stage_big(ws):
        return tuple(_pallas_stage(list(ws), N, run, 1, False))

    def stage_small(ws):
        return tuple(_pallas_stage(list(ws), N, 1 << 17, 1, False))

    bench("R1 reversal run=2^24 2-plane", rev, ws)
    bench("R2 one stage stride=2^24 2-plane", stage_big, ws)
    bench("R3 one stage stride=2^17 2-plane", stage_small, ws)


if __name__ == "__main__":
    main()

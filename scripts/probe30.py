"""Probe 30: do bigger VMEM blocks pay now that scoped-vmem is 64 MB?

_pick_blocks' sizes were chosen under the default 16 MB scoped-vmem
limit (round 2: "the next doubling fails Mosaic compile" — that failure
was the scoped limit, not physical VMEM).  mosaic_params now grants
64 MB, and probe24 measured per-stage cost DROPPING with block depth.
This probe monkeypatches _pick_blocks and times the full fused sort:

  (small, big) combos x {2-plane 2^25, 1-plane 2^25, 4-plane 2^22}

A bigger ``big`` removes one span+sweep level; a bigger ``small`` lets
trip-1 retire one more level in its single sweep.

Run:  timeout 1150 python scripts/probe30.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import rdst_tpu.ops.pallas_sort as ps  # noqa: E402


def bench(label, fn, x0, n, iters=6):
    def _sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))

    @jax.jit
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

    try:
        _sync(once(x0))
        t0 = time.perf_counter(); _sync(once(x0))
        t1 = time.perf_counter() - t0
        _sync(many(x0))
        t0 = time.perf_counter(); _sync(many(x0))
        tm = time.perf_counter() - t0
        per = (tm - t1) / (iters - 1)
        print(f"{label}: {per * 1e3:.3f} ms = {per * 1e9 / n:.3f} ns/el",
              flush=True)
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {repr(e)[:160]}", flush=True)
        return None


COMBOS = {
    # per plane count: {n_planes: (small, big)}
    "base": None,  # current _pick_blocks
    "bigB": {1: (1 << 17, 1 << 20), 2: (1 << 17, 1 << 19),
             3: (1 << 16, 1 << 18), 4: (1 << 16, 1 << 18),
             5: (1 << 15, 1 << 17)},
    "bigS": {1: (1 << 18, 1 << 19), 2: (1 << 18, 1 << 18),
             3: (1 << 17, 1 << 17), 4: (1 << 17, 1 << 17),
             5: (1 << 16, 1 << 16)},
    "both": {1: (1 << 18, 1 << 20), 2: (1 << 18, 1 << 19),
             3: (1 << 17, 1 << 18), 4: (1 << 17, 1 << 18),
             5: (1 << 16, 1 << 17)},
}

_orig = ps._pick_blocks


def main():
    rng = np.random.default_rng(5)
    cases = [
        ("2p 2^25", 2, 1 << 25, False),
        ("1p 2^25", 1, 1 << 25, False),
        ("4p(stable+pay) 2^22", 2, 1 << 22, True),
    ]
    data = {}
    for label, planes, n, stable in cases:
        ws = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
              for _ in range(planes)]
        pay = [jnp.asarray(np.arange(n, dtype=np.uint32))] if stable else []
        data[label] = (ws, pay, stable, n)

    for cname, combo in COMBOS.items():
        if combo is None:
            ps._pick_blocks = _orig
        else:
            ps._pick_blocks = lambda k, c=combo: c[min(k, 5)]
        for label, (ws, pay, stable, n) in data.items():
            def run(a, np_=len(ws), stable=stable):
                ks, p = ps.fused_sort(list(a[:np_]), list(a[np_:]),
                                      stable=stable)
                return tuple(ks) + tuple(p)
            bench(f"{cname:5s} {label}", run, tuple(ws) + tuple(pay), n)
    ps._pick_blocks = _orig


if __name__ == "__main__":
    main()

"""Floor adjudication (VERDICT r4 item 2): machine floors for every
sub-1.0x BASELINE config, in one auditable table.

Three measurements per operand shape:

* ``fused raw``  — the fused bitonic executor driven DIRECTLY on the
  config's operand planes (same count, width, stability, size), no
  normalization / histogram / dispatch / denormalization. This is the
  raw machine executor the dispatcher routes to; achieved-vs-raw
  quantifies framework overhead.
* ``lax raw``    — ``jax.lax.sort`` on the same operands: XLA's tuned
  network, the independent reference implementation.
* ``VPU bound``  — computed, not measured: bitonic stage count for the
  padded size x the measured pure minmax-chain cost per stage
  (probe20 CEIL: 0.0065 ns/el/stage at 2 planes; per-operand increment
  scaled from probe12 P4's +1.2 ns/el per payload operand at lax 16M,
  0.004/stage, by the chain/lax per-stage ratio 0.0065/0.0081 ->
  0.0032/stage/operand). Piece decomposition scales work by
  total/next_pow2 (pallas_sort.py). No executor that compares and
  selects every operand plane can beat this on this VPU.

The round-5 BENCH_NOTES table joins these columns with the dispatcher's
achieved ns/el (scripts/bench_suite.py) so every 0.2-0.4x vs-1e9 row
carries its floor ratio.

Run on the TPU host:  timeout 1150 python scripts/floor_table.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def vpu_bound_ns(n, n_operands):
    """Computed VPU floor (ns/el) for a dense n-element sort carrying
    ``n_operands`` compare/select planes.

    Stage count mirrors the executor's actual structure (pallas_sort.py):
    power-of-two sizes run the full bitonic L(L+1)/2; non-pow2 sizes run
    the piece decomposition — each binary-decomposition piece pays its
    own bitonic stage count, then right-to-left folds pass the
    accumulated prefix through one virtually-padded bitonic merge level
    (log2(next_pow2(la)) stages) per fold. This is the least work any
    bitonic execution of this shape performs; the chain cost per stage
    is the measured movement-free minmax ceiling (probe20 CEIL 0.0065
    ns/el/stage @ 2 planes, +0.0032 per extra operand scaled from
    probe12 P4's per-operand increment)."""
    T = 1 << (n - 1).bit_length()
    if T <= 1.13 * n or T < (1 << 12):
        pieces, total = [T], T
    else:
        Q = T // 16
        total = -(-n // Q) * Q
        M = total // Q
        pieces = [
            (1 << b) * Q
            for b in range(M.bit_length() - 1, -1, -1)
            if M & (1 << b)
        ]
    stages = sum(
        (p.bit_length() - 1) * p.bit_length() / 2 * p for p in pieces
    ) / total
    la = pieces[0]
    for ln in pieces[1:]:
        la += ln
        stages += (la - 1).bit_length() * la / total  # log2(next_pow2(la))
    c = 0.0065 + 0.0032 * (n_operands - 2)
    return stages * c


def main():
    import jax
    import jax.numpy as jnp

    from rdst_tpu.ops.pallas_sort import fused_sort
    from scripts.bench_suite import bench_injit

    rng = np.random.default_rng(11)
    C = np.uint32(0xB5A93E6B)

    def raw(ws_np, n_pay, stable, use_fused):
        ws = [jnp.asarray(w) for w in ws_np]
        k = len(ws) - n_pay

        def step(a):
            aw = [
                w ^ w.dtype.type(C & np.uint32((1 << (w.dtype.itemsize * 8))
                                               - 1))
                for w in a
            ]
            if use_fused:
                ow, op = fused_sort(aw[:k], aw[k:], stable=stable)
                return tuple(ow) + tuple(op)
            return jax.lax.sort(tuple(aw), num_keys=k, is_stable=stable)

        return bench_injit(step, tuple(ws))

    def u32(n):
        return rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)

    N10 = 10_000_000
    shapes = [
        # (label, key planes, n payload, stable, n)
        ("headline 2^25 x 2key unstable", [u32(1 << 25), u32(1 << 25)],
         0, False),
        ("c1-shape 10M x 1key unstable", [u32(N10)], 0, False),
        ("c2-unstable 10M 2key+pay", [u32(N10), u32(N10), u32(N10)], 1,
         False),
        ("c2-stable 10M 2key+pay", [u32(N10), u32(N10), u32(N10)], 1,
         True),
        ("c3-stable 10M u16+u32key+pay",
         [rng.integers(0, 2**16, N10).astype(np.uint16), u32(N10),
          u32(N10)], 1, True),
    ]
    print("| shape | fused raw ns/el | lax raw ns/el | VPU bound ns/el |"
          " fused/bound |")
    print("|---|---|---|---|---|")
    for label, ws, n_pay, stable in shapes:
        n = len(ws[0])
        # operand planes the executor actually carries: stability adds
        # the iota plane on the fused path / the stable flag tax on lax
        P = len(ws) + (1 if stable else 0)
        tf = raw(ws, n_pay, stable, use_fused=True)
        tl = raw(ws, n_pay, stable, use_fused=False)
        vb = vpu_bound_ns(n, P)
        print(
            f"| {label} | {tf * 1e9 / n:.3f} | {tl * 1e9 / n:.3f} | "
            f"{vb:.3f} | {tf * 1e9 / n / vb:.2f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Large-input acceptance checks on the real TPU.

The reference's comparison suites run to 50M elements in release mode
(test_utils.rs:63-95, CI rust.yml:32); the CPU-mesh pytest suite keeps
sizes small AND runs the Pallas kernels in interpret mode with shrunken
geometry, so this script drives the big sizes — and therefore the
PRODUCTION block/row fused kernels — on the actual chip, asserting
bit-exactness of the full dispatcher (builder -> Sorter -> plan) against
numpy oracles.

    python scripts/tpu_acceptance.py [--json ACCEPT.json]
"""
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

RESULTS = []


def check(name, ok):
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    RESULTS.append({"check": name, "ok": bool(ok)})
    return ok


def main():
    import rdst_tpu as rt
    from rdst_tpu import keys as rkeys

    rng = np.random.default_rng(0)
    all_ok = True

    # 50M u32/u64 through the DEFAULT tuner pipeline (Scanning regime ->
    # comparative network under the measured plan mapping; the bucketed
    # plan additionally self-caps at config.max_bucketed_elements)
    n = 50_000_000
    x = rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)
    t0 = time.perf_counter()
    got = rt.radix_sort_unstable(x)
    dt = time.perf_counter() - t0
    all_ok &= check(f"u32 50M default pipeline ({dt:.1f}s e2e)",
                    np.array_equal(got, np.sort(x)))
    k = rng.integers(0, 2**64, n, dtype=np.uint64)
    got = rt.radix_sort_unstable(k)
    all_ok &= check("u64 50M default pipeline",
                    np.array_equal(got, np.sort(k)))
    del k, got

    # 20M u32 through the DEFAULT pipeline (Recombinating regime)
    m0 = 20_000_000
    x2 = rng.integers(0, 2**32, m0, dtype=np.int64).astype(np.uint32)
    t0 = time.perf_counter()
    got = rt.radix_sort_unstable(x2)
    dt = time.perf_counter() - t0
    all_ok &= check(f"u32 20M default/tuner pipeline ({dt:.1f}s e2e)",
                    np.array_equal(got, np.sort(x2)))
    del x2, got

    # 20M u64 + payload, stable
    m = 20_000_000
    k2 = rng.integers(0, 2**32, m, dtype=np.uint64)  # dup-heavy
    v = np.arange(m, dtype=np.uint32)
    ks, vs = rt.sort_key_value(k2, v, stable=True)
    order = np.argsort(k2, kind="stable")
    all_ok &= check(
        "u64 20M + payload stable",
        np.array_equal(ks, k2[order]) and np.array_equal(vs, v[order]),
    )
    del k2, v, ks, vs

    # 20M f64 total order with specials sprinkled
    f = rng.standard_normal(m)
    f[:: m // 1000] = np.nan
    f[1 :: m // 1000] = -np.inf
    got = rt.radix_sort_unstable(f)
    nk = rkeys.normalize(f)
    hi, lo = (np.asarray(w) for w in nk.words)
    want = f[np.lexsort((lo, hi))]
    all_ok &= check(
        "f64 20M with NaN/Inf", np.array_equal(
            got.view(np.uint64), want.view(np.uint64))
    )

    # 10M Zipf through the full tuner path (skew regime)
    z = (rng.zipf(1.3, 10_000_000) % (2**31)).astype(np.uint32)
    got = rt.radix_sort_unstable(z)
    all_ok &= check("zipf 10M tuner path", np.array_equal(got, np.sort(z)))
    del z, got

    # pow2 2^23: the fused executor's power-of-two core at production
    # block/row, stable + payload, through the dispatcher
    p = 1 << 23
    kp = rng.integers(0, 2**64, p, dtype=np.uint64)
    vp = np.arange(p, dtype=np.uint32)
    ks, vs = rt.sort_key_value(kp, vp, stable=True)
    order = np.argsort(kp, kind="stable")
    all_ok &= check(
        "u64 2^23 pow2 fused core stable+payload",
        np.array_equal(ks, kp[order]) and np.array_equal(vs, vp[order]),
    )
    del kp, vp, ks, vs

    # composite struct key (u16, f32) + payload — the c3/c6 shape; the
    # compaction plan narrows the MSW to u16 and the fused kernels carry
    # it at native width (round-4 narrow-plane support)
    s = 4_000_000
    a16 = rng.integers(0, 2**16, s).astype(np.uint16)
    b32 = rng.standard_normal(s).astype(np.float32)
    vs_in = np.arange(s, dtype=np.uint32)
    builder = rt.radix_sort_builder((a16, b32), [vs_in]).with_stable(True)
    out_keys, out_pays = builder.sort()
    nk = rkeys.normalize((a16, b32))
    w = [np.asarray(x) for x in nk.words]
    order = np.lexsort(w[::-1])
    oa, ob = out_keys
    all_ok &= check(
        "struct (u16,f32) 4M stable+payload",
        np.array_equal(np.asarray(oa), a16[order])
        and np.array_equal(
            np.asarray(ob).view(np.uint32), b32[order].view(np.uint32)
        )
        and np.array_equal(np.asarray(out_pays[0]), vs_in[order]),
    )

    # low-memory REGIONS regime at production size (VERDICT r4 item 3):
    # force the memory-pressure gate so the tuner's Regions pick actually
    # runs chunked_sort -> fused chunk sorts -> Pallas merge tree on the
    # real chip (the only plan family previously without TPU coverage)
    from rdst_tpu import config as rconfig

    lm = 20_000_000
    klm = rng.integers(0, 2**64, lm, dtype=np.uint64)
    old_thresh = rconfig.low_mem_threshold_bytes
    rconfig.low_mem_threshold_bytes = 1  # any working set is "pressure"
    try:
        t0 = time.perf_counter()
        got = (
            rt.radix_sort_builder(klm).with_low_mem_tuner().sort()
        )
        dt = time.perf_counter() - t0
    finally:
        rconfig.low_mem_threshold_bytes = old_thresh
    all_ok &= check(
        f"u64 20M low-mem chunked plan, gate forced ({dt:.1f}s e2e)",
        np.array_equal(np.asarray(got), np.sort(klm)),
    )
    del klm, got

    # dispatcher end-to-end at 2^27 (VERDICT r4 item 6): tuner pick ->
    # Scanning -> compaction -> fused pieces at 134M, the regime where
    # the span fan-in cap and scoped-vmem fixes (51aae43) live
    big = 1 << 27
    kb = rng.integers(0, 2**64, big, dtype=np.uint64)
    t0 = time.perf_counter()
    got = rt.radix_sort_unstable(kb)
    dt = time.perf_counter() - t0
    all_ok &= check(
        f"u64 2^27 (134M) default pipeline e2e ({dt:.1f}s incl transfers)",
        np.array_equal(got, np.sort(kb)),
    )
    del kb, got

    # distributed pipeline on a 1-device TPU mesh: the ragged
    # all-to-all code path AND the fused local sort inside shard_map
    # (parallel/shuffle._local_sort) execute on the real chip
    from rdst_tpu.parallel import distributed_sort, gather_valid, make_mesh

    dn = 1 << 22
    dk = rng.integers(0, 2**64, dn, dtype=np.uint64)
    dpay = np.arange(dn, dtype=np.uint32)
    dhi = (dk >> np.uint64(32)).astype(np.uint32)
    dlo = (dk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    words, pays, counts = distributed_sort(
        [dhi, dlo], [dpay], mesh=make_mesh(1), stable=True
    )
    dense = gather_valid(list(words) + list(pays), counts)
    got = (dense[0].astype(np.uint64) << np.uint64(32)) | dense[1].astype(
        np.uint64
    )
    order = np.argsort(dk, kind="stable")
    all_ok &= check(
        "distributed 1-device mesh 2^22 stable+payload (fused local sort)",
        np.array_equal(got, dk[order]) and np.array_equal(
            dense[2], dpay[order]
        ),
    )

    print("ALL OK" if all_ok else "FAILURES PRESENT", flush=True)
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    if out_path:
        import jax

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "device": str(jax.devices()[0]),
                    "all_ok": bool(all_ok),
                    "checks": RESULTS,
                },
                fh,
                indent=1,
            )
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()

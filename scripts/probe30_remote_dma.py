"""Probe 30: execute the remote-DMA exchange kernel on the real chip.

Multi-chip execution is impossible here (one chip), but a 1-device mesh
exercises the FULL kernel for real — Mosaic lowering of the dynamic
chunk loops, SMEM scalar prefetch, barrier + DMA semaphores with a
collective_id, and self-RDMA data movement — in the degenerate
all-to-self case. Bit-exact output = the strongest single-chip evidence
available for parallel/remote_dma.py (the multi-chip parity run remains
the documented TODO).

Run:  timeout 580 python scripts/probe30_remote_dma.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from rdst_tpu.parallel.remote_dma import CHUNK, remote_dma_exchange

    D = 1
    n_local = 5 * CHUNK + 123  # non-multiple: exercises the tail chunk
    capacity = 8 * CHUNK
    rng = np.random.default_rng(30)
    x = rng.integers(0, 2**32, n_local, dtype=np.int64).astype(np.uint32)
    mesh = Mesh(np.array(jax.devices()[:D]), ("shard",))

    def body(a):
        me = jax.lax.axis_index("shard")
        sizes = jnp.array([n_local], jnp.int32)
        offs = jnp.array([0], jnp.int32)
        size_matrix = jax.lax.all_gather(sizes, "shard")
        out, valid, n_valid = remote_dma_exchange(
            [a], offs, sizes, size_matrix, capacity, "shard", D, me,
        )
        return out[0], valid, n_valid[None]

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P("shard"),),
            out_specs=(P("shard"), P("shard"), P("shard")),
            check_vma=False,
        )
    )
    import time

    xj = jnp.asarray(x)
    out, valid, n_valid = fn(xj)
    # sync BEFORE timing: overlapped kernel launches cross-talk through
    # the shared barrier semaphore (collective_id) — every call must
    # retire before the next is dispatched
    _ = np.asarray(out)[:4]
    # bandwidth of the serialized chunk sends (self-send over the DMA
    # engine, r+w HBM): per-call wall time incl. ~3ms tunnel dispatch
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(xj)
        np.asarray(r[0][:4])  # 4-el transfer: syncs the kernel, not 9MB
    dt = (time.perf_counter() - t0) / reps
    gbs = n_local * 4 * 2 / dt / 1e9
    print(f"self-send: {dt * 1e3:.2f} ms/call for {n_local} rows "
          f"(~{gbs:.1f} GB/s incl dispatch overhead)", flush=True)
    out, valid = np.asarray(out), np.asarray(valid)
    ok_count = int(np.asarray(n_valid)[0]) == n_local
    ok_mask = valid.sum() == n_local and valid[:n_local].all()
    ok_data = np.array_equal(out[:n_local], x)
    print(f"n_valid ok: {ok_count}; mask ok: {ok_mask}; data ok: {ok_data}",
          flush=True)
    if not (ok_count and ok_mask and ok_data):
        raise SystemExit(1)
    print("PASS: remote-DMA kernel executes bit-exactly on 1 real chip")


if __name__ == "__main__":
    main()

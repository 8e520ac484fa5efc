"""Pallas remote-DMA bucket exchange — the SURVEY §5 comm-backend kernel.

The blueprint (SURVEY.md §2.3 row 3, §5 comm-backend bullet, §7 step 6)
prescribes a ``pltpu.make_async_remote_copy``-style exchange so the
bucket shuffle's inter-chip traffic is issued from inside a kernel and
can overlap local passes — the TPU-native analog of the reference's
compute/scatter overlap (scanning_sort.rs:91-218).  This module ships
that kernel, GATED: full execution needs a multi-chip TPU mesh.  On the
one chip this build environment exposes, the kernel is
  * EXECUTED for real in the degenerate all-to-self case
    (scripts/probe30_remote_dma.py — Mosaic lowering, dynamic chunk
    loops, SMEM prefetch, barrier/DMA semaphores, data movement all
    exercised bit-exactly),
  * layout-validated (the planner is pure array math, unit-tested
    against the exchange contract — tests/test_remote_dma.py),
  * traced on the 8-device CPU mesh (shape/plumbing via eval_shape),
  * multi-chip parity UNVERIFIED — marked experimental until a real
    slice runs it (production uses ``jax.lax.ragged_all_to_all``).

Design
------
DMA engines move (row, 128-lane) tiles at STATIC sizes with DYNAMIC row
offsets (the proven probe12-P2 addressing mode, 246-640 GB/s down to
512 B runs).  Ragged element-granular segments map onto that mode by:

* 128-ALIGNED SENDS: destination d's segment is sent from
  ``floor128(offset)``, carrying ``lead = offset % 128`` rows of
  neighbor slack; the receiver knows every sender's ``lead`` from the
  (D, D) size matrix (it is a row prefix-sum), so validity windows are
  exact on both sides with no extra traffic.
* FIXED CHUNKS: each segment goes as ``ceil((lead+size)/CHUNK)`` copies
  of exactly CHUNK = 16 rows x 128 lanes; receivers lay senders out at
  CHUNK-rounded offsets so tail-chunk overrun stays inside its own slot.
* ONE-WAIT COMPLETION: every arrival is the same byte count, so the
  receiver drains its DMA semaphore with ``total_chunks`` equal-size
  ``wait_recv``s; an allocate -> barrier -> send prologue guarantees
  the remote buffers exist before the first descriptor fires.

Sends are chunk-serialized (``start(); wait_send()``) — the
conservative first version; a multi-slot descriptor ring is the known
upgrade once multi-chip execution can be measured.  u32 planes only
(the shuffle's native plane width); other widths fall back to the
ragged_all_to_all backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["CHUNK", "LANES", "dma_layout", "remote_dma_exchange",
           "available"]

LANES = 128
#: Static DMA copy size: 16 rows x 128 lanes x 4 B = 8 KiB per
#: descriptor — well above the ~512 B efficiency floor measured for
#: dynamic-offset DMA (probe12 P2) while keeping worst-case rounding
#: waste (D x CHUNK rows per receiver) small.
CHUNK_ROWS = 16
CHUNK = CHUNK_ROWS * LANES


def available() -> bool:
    """True when the kernel could actually execute: real TPU backend."""
    return jax.default_backend() == "tpu"


def dma_layout(size_matrix, me, cap_elems, chunk=CHUNK):
    """Planner: receiver layout + sender targets, all from the (D, D)
    size matrix (replicated on every device).

    ``size_matrix[s, d]`` = rows sender s sends device d;
    ``cap_elems`` = every receiver's buffer length.  Returns
    (recv_sizes, seg_offsets, leads, out_offsets, src_row_offsets,
    n_chunks_out, total_chunks):

    * ``recv_sizes[s]``   — exact rows I receive from sender s,
    * ``seg_offsets[s]``  — element offset of sender s's slot in MY
      buffer (chunk-rounded; ``seg_offsets[D]`` = my rounded total),
    * ``leads[s]``        — rows of alignment slack preceding sender
      s's real data inside its slot (``= s's send offset % 128``),
    * ``out_offsets[d]``  — element offset of MY slot on receiver d,
    * ``src_row_offsets[d]`` — 128-row-unit offset where my send to d
      starts locally (``floor128`` of my segment offset),
    * ``n_chunks_out[d]`` — chunks I send to d (CLAMPED so no write can
      land past ``cap_elems`` — overflow demand truncates instead of
      corrupting; the exact ``recv_sizes`` still signal it),
    * ``total_chunks``    — chunk arrivals I must wait for (consistent
      with every sender's clamped counts).
    """
    D = size_matrix.shape[0]
    sm = size_matrix.astype(jnp.int32)
    # sender-side element offsets: exclusive prefix along destinations
    off = jnp.cumsum(sm, axis=1) - sm  # (D, D): sender s's offset for d
    lead = off % LANES  # (D, D)
    # zero-size destinations send nothing (no alignment-lead-only chunk)
    padded = jnp.where(
        sm > 0, ((lead + sm + (chunk - 1)) // chunk) * chunk, 0
    )  # (D, D)
    csum = jnp.cumsum(padded, axis=0)  # per destination column
    excl = csum - padded
    # clamp every sender's slot to the buffer end (identical math on
    # every device, so sender counts and receiver waits agree)
    clamped = jnp.clip(padded, 0, jnp.maximum(cap_elems - excl, 0))
    clamped = (clamped // chunk) * chunk
    recv_sizes = sm[:, me]
    seg_offsets = jnp.concatenate(
        [excl[:, me], (excl[D - 1 : D, me] + clamped[D - 1 : D, me])]
    )
    leads = lead[:, me]
    out_offsets = excl[me, :]
    src_row_offsets = (off[me, :] - lead[me, :]) // LANES
    n_chunks_out = clamped[me, :] // chunk
    total_chunks = jnp.sum(clamped[:, me]) // chunk
    return (
        recv_sizes, seg_offsets.astype(jnp.int32),
        leads.astype(jnp.int32), out_offsets.astype(jnp.int32),
        src_row_offsets.astype(jnp.int32),
        n_chunks_out.astype(jnp.int32),
        total_chunks.astype(jnp.int32),
    )


def _exchange_kernel(
    D, chunk_rows,
    n_ch_ref, src_row_ref, out_row_ref, expect_ref,  # SMEM scalars
    src_ref,  # HBM source plane, (rows, 128), padded
    out_ref,  # HBM receive buffer, (cap_rows, 128)
    send_sem, recv_sem,
):
    """One plane's exchange: barrier, chunked RDMA to every destination,
    then drain my expected arrival count."""
    from jax.experimental.pallas import tpu as pltpu

    # allocate -> barrier -> send: every receiver's out_ref exists
    # before any sender writes it
    barrier = pltpu.get_barrier_semaphore()
    for d in range(D):
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=jnp.int32(d),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
    pltpu.semaphore_wait(barrier, D)

    for d in range(D):  # static destination loop
        def chunk_body(i, _, d=d):
            r0 = src_row_ref[d] + i * chunk_rows
            w0 = out_row_ref[d] // LANES + i * chunk_rows
            rdma = pltpu.make_async_remote_copy(
                src_ref=src_ref.at[pl.ds(r0, chunk_rows), :],
                dst_ref=out_ref.at[pl.ds(w0, chunk_rows), :],
                send_sem=send_sem.at[0],
                recv_sem=recv_sem.at[0],
                device_id=jnp.int32(d),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()  # send completion; arrival is the
            return 0  # receiver's drain below

        jax.lax.fori_loop(0, n_ch_ref[d], chunk_body, 0)

    # every arrival is exactly one CHUNK of bytes: drain the DMA recv
    # semaphore with equal-size waits (the descriptor's refs are only
    # used for the byte count)
    def recv_body(i, _):
        pltpu.make_async_remote_copy(
            src_ref=src_ref.at[pl.ds(0, chunk_rows), :],
            dst_ref=out_ref.at[pl.ds(0, chunk_rows), :],
            send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[0],
            device_id=jnp.int32(0),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_recv()
        return 0

    jax.lax.fori_loop(0, expect_ref[0], recv_body, 0)


# guarded so the module imports where pallas is unavailable
try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
except Exception:  # noqa: BLE001
    pl = None


def remote_dma_exchange(
    planes, input_offsets, send_sizes, size_matrix, capacity, axis, D, me,
):
    """Exchange contiguous per-destination segments via remote DMA.

    Call INSIDE ``shard_map`` over a 1-axis TPU mesh (logical device ids
    along ``axis``).  Same contract as the ragged branch of
    ``shuffle._exchange_raw``: returns (received planes, validity mask,
    exact receive count).  Receive buffers are chunk-rounded with
    alignment leads; pad slots carry unspecified bytes and are masked
    (the finish sort orders by the validity plane, not pad values).

    EXPERIMENTAL: multi-chip execution unverified; see module docstring.
    """
    from jax.experimental.pallas import tpu as pltpu

    del input_offsets, send_sizes  # derivable from size_matrix row `me`
    # rounding slack: every sender's slot exceeds its exact size by
    # < CHUNK + LANES (lead + chunk round-up)
    cap_dma = -(-capacity // CHUNK) * CHUNK + D * (CHUNK + LANES)
    cap_rows = cap_dma // LANES
    (recv_sizes, seg_offsets, leads, out_offsets, src_row_offsets,
     n_chunks_out, total_chunks) = dma_layout(size_matrix, me, cap_dma)
    n_local = planes[0].shape[0]
    # pad source to whole rows + one chunk of tail-overrun slack
    pad = (-n_local) % LANES + CHUNK

    out_planes = []
    for a in planes:
        if a.dtype != jnp.uint32:
            raise TypeError(
                "remote_dma_exchange carries u32 planes only; use the "
                "ragged_all_to_all backend for narrow planes"
            )
        src = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        src = src.reshape(-1, LANES)
        kernel = functools.partial(_exchange_kernel, D, CHUNK_ROWS)
        out = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # chunks per dst
                pl.BlockSpec(memory_space=pltpu.SMEM),  # src row offs
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dst elem offs
                pl.BlockSpec(memory_space=pltpu.SMEM),  # expected
                pl.BlockSpec(memory_space=pltpu.HBM),  # src plane
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct((cap_rows, LANES), a.dtype),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((1,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=7, has_side_effects=True,
            ),
        )(
            n_chunks_out,
            src_row_offsets,
            out_offsets,
            total_chunks[None],
            src,
        )
        out_planes.append(out.reshape(-1))

    data_start = seg_offsets[:-1] + leads  # (D,) exact segment starts
    pos = jax.lax.broadcasted_iota(jnp.int32, (D, cap_dma), 1)
    seg_valid = (pos >= data_start[:, None]) & (
        pos < (data_start + recv_sizes)[:, None]
    )
    valid_mask = jnp.any(seg_valid, axis=0)
    n_valid = jnp.sum(recv_sizes)
    return out_planes, valid_mask, n_valid

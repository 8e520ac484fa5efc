"""Remote-DMA exchange (parallel/remote_dma.py) — what one chip CAN pin.

Multi-chip execution needs a real TPU slice (gated; see module
docstring); the degenerate all-to-self case EXECUTES on the single real
chip in scripts/probe30_remote_dma.py.  Here: the 128-aligned chunked
layout planner is checked against the exchange contract, and the kernel
wrapper is abstractly evaluated (traced) on the CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rdst_tpu.parallel.remote_dma import (
    CHUNK,
    LANES,
    dma_layout,
)


def _cap(sm, D):
    capacity = int(np.asarray(sm).sum(axis=0).max()) + CHUNK
    return -(-capacity // CHUNK) * CHUNK + D * (CHUNK + LANES)


@pytest.fixture
def size_matrix(rng):
    D = 8
    m = rng.integers(0, 3 * CHUNK, size=(D, D)).astype(np.int64)
    # exact-multiple, zero, and sub-lane entries (the rounding edges)
    m[0, 1] = 0
    m[2, 3] = CHUNK
    m[4, 5] = 2 * CHUNK
    m[6, 7] = 17
    return jnp.asarray(m.astype(np.int32))


def test_layout_contract(size_matrix):
    D = size_matrix.shape[0]
    sm = np.asarray(size_matrix)
    cap = _cap(sm, D)
    off = np.cumsum(sm, axis=1) - sm  # sender-side element offsets
    for me in range(D):
        recv, seg, leads, out, srows, nch, total = (
            np.asarray(x) for x in dma_layout(size_matrix, me, cap)
        )
        np.testing.assert_array_equal(recv, sm[:, me])
        # leads = each sender's alignment slack for my column
        np.testing.assert_array_equal(leads, off[:, me] % LANES)
        # slots: chunk-aligned, contain lead + data + tail overrun
        # (zero-size senders get zero-width slots and send nothing)
        assert (seg[:-1] % CHUNK == 0).all()
        for s in range(D):
            slot = (
                -(-(leads[s] + sm[s, me]) // CHUNK) * CHUNK
                if sm[s, me] > 0 else 0
            )
            assert seg[s + 1] - seg[s] == slot or s == D - 1
            assert nch_of(sm, s, me) * CHUNK == slot
        # my send chunk counts cover exactly my padded segments
        for d in range(D):
            assert nch[d] == nch_of(sm, me, d)
            # src rows are the floor128 of my element offset
            assert srows[d] == (off[me, d] - off[me, d] % LANES) // LANES
        # arrivals consistent with every sender's counts toward me
        assert total == sum(nch_of(sm, s, me) for s in range(D))


def nch_of(sm, s, d):
    if sm[s, d] == 0:
        return 0  # zero-size destinations send nothing
    off = np.cumsum(sm, axis=1) - sm
    lead = off[s, d] % LANES
    return -(-(lead + sm[s, d]) // CHUNK)


def test_layout_sender_receiver_symmetry(size_matrix):
    """Where sender ME writes on receiver D must equal where receiver D
    expects sender ME — the invariant that makes the RDMA race-free."""
    D = size_matrix.shape[0]
    cap = _cap(np.asarray(size_matrix), D)
    for me in range(D):
        _, _, _, out_me, _, _, _ = dma_layout(size_matrix, me, cap)
        out_me = np.asarray(out_me)
        for d in range(D):
            _, seg_d, _, _, _, _, _ = dma_layout(size_matrix, d, cap)
            assert out_me[d] == np.asarray(seg_d)[me]


def test_layout_writes_stay_in_buffer(size_matrix):
    """Chunk writes never land past the receiver buffer, even when
    demand exceeds it (overflow truncates; the counts still signal)."""
    D = size_matrix.shape[0]
    sm = np.asarray(size_matrix).copy()
    sm[:, 2] = 20 * CHUNK  # overflow device 2's buffer
    cap = _cap(np.asarray(size_matrix), D)  # cap from the ORIGINAL load
    smj = jnp.asarray(sm)
    for me in range(D):
        res = [np.asarray(x) for x in dma_layout(smj, me, cap)]
        out, nch = res[3], res[5]
        for d in range(D):
            if nch[d] > 0:  # zero-chunk senders never write
                assert out[d] + nch[d] * CHUNK <= cap


def test_kernel_traces(rng):
    """Abstract evaluation of the full wrapper inside shard_map — shape
    and plumbing errors surface without TPU lowering."""
    from jax.sharding import Mesh, PartitionSpec as P

    from rdst_tpu.parallel.remote_dma import remote_dma_exchange

    D = 8
    n_local = 4 * CHUNK
    capacity = 6 * CHUNK
    mesh = Mesh(np.array(jax.devices()[:D]), ("shard",))

    def body(a):
        me = jax.lax.axis_index("shard")
        sizes = jnp.full((D,), n_local // D, jnp.int32)
        offs = jnp.cumsum(sizes) - sizes
        size_matrix = jax.lax.all_gather(sizes, "shard")
        out, valid, n_valid = remote_dma_exchange(
            [a], offs, sizes, size_matrix, capacity, "shard", D, me,
        )
        return out[0], valid, n_valid[None]

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P("shard"),),
        out_specs=(P("shard"), P("shard"), P("shard")),
        check_vma=False,
    )
    x = jnp.zeros((D * n_local,), jnp.uint32)
    shapes = jax.eval_shape(fn, x)
    cap_dma = -(-capacity // CHUNK) * CHUNK + D * (CHUNK + LANES)
    assert shapes[0].shape == (D * cap_dma,)
    assert shapes[1].shape == (D * cap_dma,)

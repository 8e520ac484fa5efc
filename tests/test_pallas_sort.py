"""Reversal-free fused bitonic sort (ops/pallas_sort.py) parity suite.

Interpret-mode on CPU with shrunken block/row parameters so every kernel
shape (multi-level tail, span fusion at several P widths, direction
parity masks, the un-flip load path) executes — the same pin-the-
semantics strategy as the fused-merge and exchange parity suites.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import rdst_tpu.ops.pallas_sort as ps


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setenv("RDST_TPU_FORCE_INTERPRET", "1")


def _check_unstable(keys, pays, out_k, out_p):
    """Keys bit-equal to lexsorted; (key, payload) multiset preserved."""
    order = np.lexsort(keys[::-1])
    for i, k in enumerate(keys):
        np.testing.assert_array_equal(np.asarray(out_k[i]), k[order])
    if len(pays):
        got = sorted(
            map(
                tuple,
                np.stack(
                    [np.asarray(x) for x in list(out_k) + list(out_p)], 1
                ).tolist(),
            )
        )
        want = sorted(
            map(tuple, np.concatenate([keys, pays]).T.tolist())
        )
        assert got == want


def _check_stable(keys, pays, out_k, out_p):
    """Exact equality with the stable lexsort permutation."""
    order = np.lexsort(keys[::-1])  # lexsort is stable
    for i, k in enumerate(keys):
        np.testing.assert_array_equal(np.asarray(out_k[i]), k[order])
    for i, p in enumerate(pays):
        np.testing.assert_array_equal(np.asarray(out_p[i]), p[order])


@pytest.mark.parametrize(
    "n,nk,npay,stable,lo",
    [
        (1 << 12, 1, 0, False, False),
        (1 << 12, 2, 1, False, True),
        (1 << 13, 2, 2, True, True),
        (1 << 12, 1, 1, True, False),
        (1 << 13, 3, 0, False, True),
    ],
)
def test_pow2_parity(n, nk, npay, stable, lo):
    rng = np.random.default_rng(n + nk * 7 + npay)
    keys = rng.integers(0, 2**32, size=(nk, n), dtype=np.uint32)
    if lo:
        keys %= 97
    pays = rng.integers(0, 2**32, size=(npay, n), dtype=np.uint32)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(k) for k in keys],
        [jnp.asarray(p) for p in pays],
        stable=stable,
        row=256,
        block=1024,
    )
    if stable:
        _check_stable(keys, pays, out_k, out_p)
    else:
        _check_unstable(keys, pays, out_k, out_p)


@pytest.mark.parametrize(
    "n,stable,npay",
    [(5000, False, 0), (5000, False, 1), (4429, True, 1), (3000, True, 0)],
)
def test_non_pow2_padding(n, stable, npay):
    """Pads (all-ones keys + marker/index plane) slice off cleanly, even
    when real data contains all-ones keys."""
    rng = np.random.default_rng(n)
    keys = rng.integers(0, 2**32, size=(2, n), dtype=np.uint32)
    keys[:, :17] = 0xFFFFFFFF  # collide with the pad sentinel
    pays = rng.integers(0, 2**32, size=(npay, n), dtype=np.uint32)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(k) for k in keys],
        [jnp.asarray(p) for p in pays],
        stable=stable,
        row=256,
        block=1024,
    )
    assert out_k[0].shape[0] == n
    if stable:
        _check_stable(keys, pays, out_k, out_p)
    else:
        _check_unstable(keys, pays, out_k, out_p)


def test_span_multiple_groups():
    """A block small enough that one level needs several span trips
    (P capped at block/LANES) still sorts correctly."""
    rng = np.random.default_rng(3)
    n = 1 << 13
    keys = rng.integers(0, 2**32, size=(1, n), dtype=np.uint32)
    out_k, _ = ps.fused_sort(
        [jnp.asarray(keys[0])], [], row=128, block=256
    )
    np.testing.assert_array_equal(np.asarray(out_k[0]), np.sort(keys[0]))


def test_degenerate_inputs():
    rng = np.random.default_rng(5)
    n = 1 << 12
    for arr in [
        np.zeros(n, np.uint32),                      # all equal
        np.arange(n, dtype=np.uint32),               # presorted
        np.arange(n, dtype=np.uint32)[::-1].copy(),  # reversed
        rng.integers(0, 2, size=n, dtype=np.uint32), # two values
    ]:
        out_k, _ = ps.fused_sort(
            [jnp.asarray(arr)], [], row=256, block=1024
        )
        np.testing.assert_array_equal(np.asarray(out_k[0]), np.sort(arr))


def test_narrow_and_float_payloads_round_trip():
    """u16 keys widen/narrow; f32 payloads ride bit-exactly; i16 payloads
    sign-extend and truncate back."""
    rng = np.random.default_rng(9)
    n = 1 << 12
    k16 = rng.integers(0, 2**16, size=n).astype(np.uint16)
    pf = rng.standard_normal(n).astype(np.float32)
    pi = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(k16)],
        [jnp.asarray(pf), jnp.asarray(pi)],
        stable=True,
        row=256,
        block=1024,
    )
    assert out_k[0].dtype == jnp.uint16
    assert out_p[0].dtype == jnp.float32
    assert out_p[1].dtype == jnp.int16
    order = np.argsort(k16, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k[0]), k16[order])
    np.testing.assert_array_equal(np.asarray(out_p[0]), pf[order])
    np.testing.assert_array_equal(np.asarray(out_p[1]), pi[order])


@pytest.mark.parametrize("stable", [False, True])
def test_mixed_width_keys_pow2(stable):
    """(u16 MSW, u32 LSW) key — the packed struct shape (lsb.py narrows
    a 6-byte key to exactly this).  Narrow planes ride the kernels at
    native width since round 4; parity masks and piece flips must use
    the narrow-width complement (pallas_sort._ones)."""
    rng = np.random.default_rng(21)
    n = 1 << 13
    k0 = rng.integers(0, 2**16, size=n).astype(np.uint16)
    k1 = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(k0), jnp.asarray(k1)], [jnp.asarray(pay)],
        stable=stable, row=256, block=1024,
    )
    assert out_k[0].dtype == jnp.uint16
    keys = [k0.astype(np.uint32), k1]
    if stable:
        _check_stable(keys, [pay], out_k, out_p)
    else:
        _check_unstable(keys, [pay], out_k, out_p)


@pytest.mark.parametrize("n,stable", [(4429, True), (5000, False)])
def test_mixed_width_keys_non_pow2(n, stable):
    """Narrow key planes through the piece decomposition: odd pieces
    sort descending via the NATIVE-width complement in XLA-land while
    the kernels complement widened values via the width mask — the two
    domains must agree bit-exactly."""
    rng = np.random.default_rng(n)
    k0 = rng.integers(0, 2**16, size=n).astype(np.uint16)
    k1 = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    k0[:9] = 0xFFFF  # collide with the narrow pad sentinel
    pay = np.arange(n, dtype=np.uint32)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(k0), jnp.asarray(k1)],
        [jnp.asarray(pay)] if stable else [],
        stable=stable, row=256, block=1024,
    )
    assert out_k[0].shape[0] == n
    keys = [k0.astype(np.uint32), k1]
    if stable:
        _check_stable(keys, [pay], out_k, out_p)
    else:
        _check_unstable(keys, [], out_k, out_p)


def test_u8_planes():
    """u8 key + u8 rider: quarter-width planes through every kernel."""
    rng = np.random.default_rng(23)
    n = 1 << 13
    k = rng.integers(0, 256, size=n).astype(np.uint8)
    p8 = rng.integers(0, 256, size=n).astype(np.uint8)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(k)], [jnp.asarray(p8)], stable=True,
        row=256, block=1024,
    )
    assert out_k[0].dtype == jnp.uint8 and out_p[0].dtype == jnp.uint8
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k[0]), k[order])
    np.testing.assert_array_equal(np.asarray(out_p[0]), p8[order])


def test_stable_exactness_on_heavy_ties():
    """Zipf-like duplicates: stable output must be the exact stable
    permutation, not just key-equal."""
    rng = np.random.default_rng(11)
    n = 1 << 12
    keys = (rng.zipf(1.3, size=n) % 50).astype(np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    out_k, out_p = ps.fused_sort(
        [jnp.asarray(keys)], [jnp.asarray(pay)], stable=True,
        row=256, block=1024,
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k[0]), keys[order])
    np.testing.assert_array_equal(np.asarray(out_p[0]), pay[order])


def test_availability_gate():
    n = ps.MIN_ELEMS
    u32 = jnp.zeros((n,), jnp.uint32)
    small = jnp.zeros((n - 1,), jnp.uint32)
    i32 = jnp.zeros((n,), jnp.int32)
    b = jnp.zeros((n,), jnp.bool_)
    u64 = jnp.zeros((n,), jnp.uint64)
    assert ps.fused_sort_available([u32], [])
    assert ps.fused_sort_available([u32], [i32])          # signed payload ok
    assert not ps.fused_sort_available([small], [])       # below crossover
    assert not ps.fused_sort_available([i32], [])         # signed key
    assert not ps.fused_sort_available([u64], [])         # 8-byte plane
    assert not ps.fused_sort_available([u32], [b])        # bool payload
    assert not ps.fused_sort_available([u32] * 4, [u32] * 4)  # VMEM bound
    odd = jnp.zeros((n + 5,), jnp.uint32)
    # unstable+payload+non-pow2 admitted since round 4 (late u8 marker)
    assert ps.fused_sort_available([odd], [odd], stable=False)


def test_tiny_fallback():
    """Below the kernel minima the module falls back to lax.sort."""
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 2**32, size=100, dtype=np.uint32)
    out_k, _ = ps.fused_sort([jnp.asarray(arr)], [], row=256, block=1024)
    np.testing.assert_array_equal(np.asarray(out_k[0]), np.sort(arr))

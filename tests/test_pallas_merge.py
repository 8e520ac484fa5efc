"""Fused Pallas bitonic merge (ops/pallas_merge.py) vs the XLA stage loop.

Interpret-mode parity pins the kernel semantics on CPU (the same strategy
as the exchange branch-parity suite); sizes are kept small because the
Pallas interpreter executes per-grid-cell.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import rdst_tpu.ops.pallas_merge as pm
from rdst_tpu.ops import merge as xmerge


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setenv("RDST_TPU_FORCE_INTERPRET", "1")


def _sorted_run(rng, n, n_keys, n_planes, lo_entropy=False):
    planes = rng.integers(0, 2**32, size=(n_planes, n), dtype=np.uint32)
    if lo_entropy:
        planes[:n_keys] %= 53
    order = np.lexsort(planes[:n_keys][::-1])
    return [p[order] for p in planes]


def _reference_merge(a, b, n_keys):
    allc = [np.concatenate([pa, pb]) for pa, pb in zip(a, b)]
    order = np.lexsort(allc[:n_keys][::-1])
    return [p[order] for p in allc]


@pytest.mark.parametrize(
    "m,n_keys,n_planes,lo",
    [
        (128, 1, 1, False),
        (512, 1, 2, True),
        (2048, 2, 3, False),
        (2048, 2, 4, True),
    ],
)
def test_fused_matches_reference(m, n_keys, n_planes, lo):
    rng = np.random.default_rng(m + n_planes)
    a = _sorted_run(rng, m, n_keys, n_planes, lo)
    b = _sorted_run(rng, m, n_keys, n_planes, lo)
    z = [jnp.asarray(np.concatenate([pa, pb[::-1]]))
         for pa, pb in zip(a, b)]
    out = [np.asarray(p) for p in pm.bitonic_merge_fused(z, n_keys)]
    exp = _reference_merge(a, b, n_keys)
    for i in range(n_keys):
        np.testing.assert_array_equal(out[i], exp[i])
    got = sorted(map(tuple, np.stack(out, 1).tolist()))
    want = sorted(map(tuple, np.stack(exp, 1).tolist()))
    assert got == want


def test_phase_a_stages(monkeypatch):
    """Shrink BLOCK/CHUNK so the large-stride pairwise kernels run."""
    monkeypatch.setattr(pm, "BLOCK", 2048)
    monkeypatch.setattr(pm, "CHUNK", 512)
    rng = np.random.default_rng(7)
    m = 8192
    a = _sorted_run(rng, m, 1, 3, lo_entropy=True)
    b = _sorted_run(rng, m, 1, 3, lo_entropy=True)
    z = [jnp.asarray(np.concatenate([pa, pb[::-1]]))
         for pa, pb in zip(a, b)]
    out = [np.asarray(p) for p in pm.bitonic_merge_fused(z, 1)]
    exp = _reference_merge(a, b, 1)
    np.testing.assert_array_equal(out[0], exp[0])
    got = sorted(map(tuple, np.stack(out, 1).tolist()))
    want = sorted(map(tuple, np.stack(exp, 1).tolist()))
    assert got == want


def test_u16_planes_round_trip():
    """Sub-32-bit integer planes widen for the kernel and narrow back."""
    rng = np.random.default_rng(11)
    m = 256
    keys = np.sort(rng.integers(0, 2**16, size=(2, m)).astype(np.uint16), 1)
    z = [jnp.asarray(np.concatenate([keys[0], keys[1][::-1]]))]
    out = pm.bitonic_merge_fused(z, 1)
    assert out[0].dtype == jnp.uint16
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.sort(keys.reshape(-1))
    )


def test_merge_sorted_routes_through_fused(monkeypatch):
    """merge_sorted takes the fused path (incl. the stable tiebreak
    plane) when the gate opens, and agrees with the XLA stage loop."""
    monkeypatch.setattr(xmerge, "_FUSED_MIN", 256)
    rng = np.random.default_rng(3)
    m = 512
    a = _sorted_run(rng, m, 1, 2, lo_entropy=True)
    b = _sorted_run(rng, m, 1, 2, lo_entropy=True)
    aj = [jnp.asarray(p) for p in a]
    bj = [jnp.asarray(p) for p in b]
    called = {}
    real = pm.bitonic_merge_fused

    def spy(z, nk):
        called["nk"] = nk
        return real(z, nk)

    monkeypatch.setattr(xmerge, "_FUSED_MIN", 256)
    import rdst_tpu.ops.pallas_merge as pmod
    monkeypatch.setattr(pmod, "bitonic_merge_fused", spy)
    # merge.py imports inside the function, so patch the source module
    fused = xmerge.merge_sorted(aj, bj, 1, stable=True)
    assert called.get("nk") == 2  # key + synthetic tiebreak plane
    monkeypatch.setenv("RDST_TPU_FORCE_INTERPRET", "0")
    plain = xmerge.merge_sorted(aj, bj, 1, stable=True)
    for f, p in zip(fused, plain):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(p))

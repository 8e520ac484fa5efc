"""Traceable API: sorts embedded inside jax.jit computations."""
import jax
import jax.numpy as jnp
import numpy as np

from rdst_tpu import jit_api


def test_sort_inside_jit(rng):
    x = jnp.asarray(rng.standard_normal(10_000).astype(np.float32))

    @jax.jit
    def f(a):
        s = jit_api.sort(a)
        return s, jnp.diff(s)  # consumer op fused in the same program

    s, d = f(x)
    from rdst_tpu import keys as rk

    order = np.argsort(np.asarray(rk.normalize(np.asarray(x)).words[0]),
                       kind="stable")
    np.testing.assert_array_equal(
        np.asarray(s).view(np.uint32),
        np.asarray(x)[order].view(np.uint32),
    )


def test_sort_with_payload_inside_jit(rng):
    k = jnp.asarray(rng.integers(0, 100, 5_000).astype(np.int32))
    v = jnp.asarray(np.arange(5_000, dtype=np.uint32))

    @jax.jit
    def f(kk, vv):
        ks, (vs,) = jit_api.sort(kk, payloads=[vv], stable=True)
        return ks, vs

    ks, vs = f(k, v)
    order = np.argsort(np.asarray(k), kind="stable")
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(k)[order])
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(v)[order])


def test_argsort_inside_jit(rng):
    x = jnp.asarray(rng.integers(0, 50, 3_000).astype(np.uint16))
    idx = jax.jit(jit_api.argsort)(x)
    np.testing.assert_array_equal(
        np.asarray(idx), np.argsort(np.asarray(x), kind="stable")
    )


def test_grad_through_payload(rng):
    """Payloads keep differentiability when sorted by detached keys."""
    k = jnp.asarray(rng.integers(0, 100, 1_000).astype(np.int32))

    def loss(v):
        _, (vs,) = jit_api.sort(k, payloads=[v], stable=True)
        return jnp.sum(vs * vs)

    v = jnp.asarray(rng.standard_normal(1_000).astype(np.float32))
    g = jax.grad(loss)(v)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(v), rtol=1e-5)

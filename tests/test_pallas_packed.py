"""Pallas packed-SpMM kernel vs XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shadow_gnn_tpu.ops import pallas_packed as pp
from shadow_gnn_tpu.sampling.cache import pack_bits


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode (CPU test env)."""
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _rand_case(rng, b=2, n=16, f=8):
    adj = (rng.random((b, n, n)) < 0.3).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    bits = np.asarray(pack_bits(jnp.asarray(adj)))
    return jnp.asarray(bits), jnp.asarray(x), jnp.asarray(adj)


@pytest.mark.parametrize("norm", ["none", "rw", "sym"])
def test_packed_spmm_matches_reference(norm):
    rng = np.random.default_rng(0)
    bits, x, adj = _rand_case(rng)
    got = pp.packed_spmm(bits, x, 0, norm, 0.0)
    want = pp.packed_spmm_reference(bits, x, norm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_spmm_bf16_close():
    """bf16 MXU variant: same result up to bf16 rounding."""
    rng = np.random.default_rng(4)
    bits, x, adj = _rand_case(rng)
    got = pp.packed_spmm(bits, x, 0, "rw", 0.0, True)
    want = pp.packed_spmm_reference(bits, x, "rw")
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    g1 = jax.grad(lambda x: (pp.packed_spmm(bits, x, 0, "rw", 0.0, True)
                             ** 2).sum())(x)
    g2 = jax.grad(lambda x: (pp.packed_spmm_reference(bits, x, "rw")
                             ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-2,
                               atol=5e-2)


def test_packed_spmm_grad():
    rng = np.random.default_rng(1)
    bits, x, adj = _rand_case(rng)

    def f(x):
        return (pp.packed_spmm(bits, x, 0, "rw", 0.0) ** 2).sum()

    def f_ref(x):
        return (pp.packed_spmm_reference(bits, x, "rw") ** 2).sum()

    g1 = jax.grad(f)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)

"""Fused GAT attention kernel vs the dense XLA chain (interpret mode)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shadow_gnn_tpu.ops import pallas_gat as pg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _case(seed, b=2, n=16, h=2, dh=8, empty_row=True, dropedge=True):
    rng = np.random.default_rng(seed)
    adj = (rng.random((b, n, n)) < 0.3).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    np.einsum("bii->bi", adj)[:] = 1.0
    if empty_row:
        adj[:, -3:, :] = 0.0          # padded / isolated tail nodes
        adj[:, :, -3:] = 0.0
    adj_norm = adj.copy()
    if dropedge:                       # zero some kept edges (GAT raw-drop)
        adj_norm *= (rng.random(adj.shape) < 0.8).astype(np.float32)
    a_s = rng.normal(size=(b, h, n)).astype(np.float32) * 2.0
    a_n = rng.normal(size=(b, h, n)).astype(np.float32) * 2.0
    v = rng.normal(size=(b, n, h, dh)).astype(np.float32)
    return (jnp.asarray(a_s), jnp.asarray(a_n), jnp.asarray(v),
            jnp.asarray(adj_norm), jnp.asarray(adj))


def test_forward_matches_reference():
    args = _case(0)
    got = pg.gat_attention(*args)
    want = pg.gat_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_forward_no_dropedge_no_empty():
    args = _case(1, b=1, n=8, h=1, dh=4, empty_row=False, dropedge=False)
    got = pg.gat_attention(*args)
    want = pg.gat_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_grads_match_reference():
    a_s, a_n, v, adj_norm, adj = _case(2)
    cot = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, 16, 2, 8)).astype(np.float32))

    def loss(fn, a_s, a_n, v):
        return (fn(a_s, a_n, v, adj_norm, adj) * cot).sum()

    g1 = jax.grad(functools.partial(loss, pg.gat_attention),
                  argnums=(0, 1, 2))(a_s, a_n, v)
    g2 = jax.grad(functools.partial(loss, pg.gat_attention_reference),
                  argnums=(0, 1, 2))(a_s, a_n, v)
    for got, want, name in zip(g1, g2, ("att_self", "att_neigh", "values")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_att_self_grad_is_row_shift_invariant():
    """Softmax rows are invariant to a per-row score shift, so the
    att_self cotangent must vanish (matches autodiff of the dense chain
    up to the 1e-10 denominator clip on fully-dropped rows)."""
    a_s, a_n, v, adj_norm, adj = _case(3, empty_row=False, dropedge=False)
    g = jax.grad(lambda a: (pg.gat_attention(a, a_n, v, adj_norm, adj)
                            ** 2).sum())(a_s)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-4)


def test_bf16_close():
    args = _case(4)
    got = pg.gat_attention(*args, True)
    want = pg.gat_attention_reference(*args)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_gatconv_fused_matches_dense(tmp_path):
    """GATConv with fused attention == dense GATConv, params shared."""
    from shadow_gnn_tpu.nn.layers import GATConv
    rng = np.random.default_rng(5)
    b, n, f = 2, 16, 12
    adj = (rng.random((b, n, n)) < 0.35).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    np.einsum("bii->bi", adj)[:] = 1.0
    adj[:, -2:, :] = 0.0
    adj[:, :, -2:] = 0.0
    mask = (adj.sum(-1) > 0).astype(np.float32)
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    dense = GATConv(dim_out=8, mulhead=2, fused_att=False)
    fused = GATConv(dim_out=8, mulhead=2, fused_att=True)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                        jnp.asarray(adj), jnp.asarray(adj),
                        jnp.asarray(mask), train=False)
    out_d = dense.apply(params, jnp.asarray(feat), jnp.asarray(adj),
                        jnp.asarray(adj), jnp.asarray(mask), train=False)
    out_f = fused.apply(params, jnp.asarray(feat), jnp.asarray(adj),
                        jnp.asarray(adj), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)


def test_gatscatter_fused_matches_dense(tmp_path):
    from shadow_gnn_tpu.nn.layers import GATScatterConv
    rng = np.random.default_rng(6)
    b, n, f = 2, 16, 12
    adj = (rng.random((b, n, n)) < 0.35).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    np.einsum("bii->bi", adj)[:] = 1.0
    mask = np.ones((b, n), np.float32)
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    dense = GATScatterConv(dim_out=8, mulhead=2, fused_att=False)
    fused = GATScatterConv(dim_out=8, mulhead=2, fused_att=True)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                        jnp.asarray(adj), jnp.asarray(adj),
                        jnp.asarray(mask), train=False)
    out_d = dense.apply(params, jnp.asarray(feat), jnp.asarray(adj),
                        jnp.asarray(adj), jnp.asarray(mask), train=False)
    out_f = fused.apply(params, jnp.asarray(feat), jnp.asarray(adj),
                        jnp.asarray(adj), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)


def test_bf16_scores_close():
    """The bf16 score-chain level (exp/mask in bf16, f32 row-sum
    denominator): bounded by bf16 rounding of exp in [0, 1]."""
    args = _case(6)
    got = pg.gat_attention(*args, True, True)
    want = pg.gat_attention_reference(*args)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)
    # grads stay close too (flash-style recompute shares _scores)
    a_s, a_n, v, adj_norm, adj = args
    cot = jnp.asarray(np.random.default_rng(11).normal(
        size=got.shape).astype(np.float32))

    def loss(fn, a_s, a_n, v, **kw):
        return (fn(a_s, a_n, v, adj_norm, adj, **kw) * cot).sum()

    g1 = jax.grad(lambda *a: loss(pg.gat_attention, *a, bf16=True,
                                  bf16_scores=True),
                  argnums=(0, 1, 2))(a_s, a_n, v)
    g2 = jax.grad(functools.partial(loss, pg.gat_attention_reference),
                  argnums=(0, 1, 2))(a_s, a_n, v)
    for got_g, want_g, name in zip(g1, g2, ("att_self", "att_neigh", "v")):
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=6e-2, atol=6e-2, err_msg=name)


def test_per_head_grid_fallback_matches_reference(monkeypatch):
    """Large-N shapes fall back to one head per grid step (VMEM budget,
    _head_block); force that path at test size and check fwd + grads."""
    monkeypatch.setattr(pg, "_head_block", lambda h, n, dh, bwd: 1)
    args = _case(12, h=4)
    got = pg.gat_attention(*args)
    want = pg.gat_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    cot = jnp.asarray(np.random.default_rng(13).normal(
        size=got.shape).astype(np.float32))
    g1 = jax.grad(lambda *a: (pg.gat_attention(*a) * cot).sum(),
                  argnums=(0, 1, 2))(*args[:3], *args[3:])
    g2 = jax.grad(lambda *a: (pg.gat_attention_reference(*a) * cot).sum(),
                  argnums=(0, 1, 2))(*args[:3], *args[3:])
    for a, b_, nm in zip(g1, g2, ("att_self", "att_neigh", "v")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=nm)


def test_pair_head_block_matches_reference(monkeypatch):
    """The papers100M shape blocks heads in PAIRS (2 of 4); force that
    intermediate block size at test scale and check fwd + grads."""
    monkeypatch.setattr(pg, "_head_block", lambda h, n, dh, bwd: 2)
    args = _case(14, h=4)
    got = pg.gat_attention(*args)
    want = pg.gat_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    cot = jnp.asarray(np.random.default_rng(15).normal(
        size=got.shape).astype(np.float32))
    g1 = jax.grad(lambda *a: (pg.gat_attention(*a) * cot).sum(),
                  argnums=(0, 1, 2))(*args[:3], *args[3:])
    g2 = jax.grad(lambda *a: (pg.gat_attention_reference(*a) * cot).sum(),
                  argnums=(0, 1, 2))(*args[:3], *args[3:])
    for a, b_, nm in zip(g1, g2, ("att_self", "att_neigh", "v")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=nm)


def test_head_block_budget():
    """papers100M bwd shape (H=4, N=408, dh=200): all 4 heads measured
    17.87 MB scoped VMEM — an OOM — but PAIRS fit, halving the
    adjacency refetch vs a per-head grid; products (N=152, dh=128)
    keeps full head-blocking.  A hypothetical huge block degrades all
    the way to per-head."""
    assert pg._head_block(4, 408, 200, bwd=True) == 2
    assert pg._head_block(4, 408, 200, bwd=False) == 2
    assert pg._head_block(4, 152, 128, bwd=True) == 4
    assert pg._head_block(4, 152, 128, bwd=False) == 4
    assert pg._head_block(4, 1024, 256, bwd=True) == 1

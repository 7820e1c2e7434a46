"""Layer numerics vs independent numpy oracles of the reference formulas."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shadow_gnn_tpu.nn.layers import (
    GATConv, GCNConv, GINConv, SAGEConv, MLPLayer, norm_feat,
)
from shadow_gnn_tpu.nn.respool import ResPool
from shadow_gnn_tpu.nn.model import DeepGNN, ModelConfig, loss_fn, predict_fn
from shadow_gnn_tpu.ops.normalize import adj_norm_rw, adj_norm_sym
from shadow_gnn_tpu.ops.segment import masked_sort_pool
from shadow_gnn_tpu.sampling.batch import SubgraphBatch


def np_norm_feat(x, scale, offset):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True) + 1e-9   # unbiased=False
    return (x - mean) * scale / np.sqrt(var) + offset


def rand_block(rng, n_valid, n_pad, f):
    """one padded subgraph block with random adjacency"""
    adj = np.zeros((n_pad, n_pad), np.float32)
    a = (rng.random((n_valid, n_valid)) < 0.3).astype(np.float32)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 1.0)
    adj[:n_valid, :n_valid] = a
    feat = np.zeros((n_pad, f), np.float32)
    feat[:n_valid] = rng.normal(size=(n_valid, f)).astype(np.float32)
    mask = np.zeros(n_pad, bool)
    mask[:n_valid] = True
    return adj, feat, mask


def test_norm_feat_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    s = rng.normal(size=8).astype(np.float32)
    o = rng.normal(size=8).astype(np.float32)
    got = np.asarray(norm_feat(jnp.asarray(x), jnp.asarray(s), jnp.asarray(o)))
    np.testing.assert_allclose(got, np_norm_feat(x, s, o), rtol=1e-4, atol=1e-6)


def test_adj_norms_oracle():
    rng = np.random.default_rng(1)
    adj, _, _ = rand_block(rng, 6, 8, 4)
    a = jnp.asarray(adj[None])
    # sym: D^-1/2 A D^-1/2, deg clipped at 1
    deg = np.clip(adj.sum(1), 1, None)
    want_sym = adj / np.sqrt(deg)[:, None] / np.sqrt(deg)[None, :]
    np.testing.assert_allclose(np.asarray(adj_norm_sym(a))[0], want_sym, rtol=1e-6)
    want_rw = adj / deg[:, None]
    np.testing.assert_allclose(np.asarray(adj_norm_rw(a))[0], want_rw, rtol=1e-6)


def _single(layer, adj_n, adj_s, feat, mask):
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(feat[None]),
                        jnp.asarray(adj_n[None]), jnp.asarray(adj_s[None]),
                        jnp.asarray(mask[None]), train=False)
    out = layer.apply(params, jnp.asarray(feat[None]), jnp.asarray(adj_n[None]),
                      jnp.asarray(adj_s[None]), jnp.asarray(mask[None]),
                      train=False)
    return params, np.asarray(out)[0]


def test_gcn_forward_oracle():
    rng = np.random.default_rng(2)
    adj, feat, mask = rand_block(rng, 6, 8, 4)
    deg = np.clip(adj.sum(1), 1, None)
    adj_n = adj / np.sqrt(deg)[:, None] / np.sqrt(deg)[None, :]
    params, got = _single(GCNConv(dim_out=5, act="relu"), adj_n, adj, feat, mask)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    w, b = p["TorchLinear_0"]["kernel"], p["TorchLinear_0"]["bias"]
    want = np_norm_feat(np.maximum(adj_n @ feat @ w + b, 0), p["scale"], p["offset"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sage_forward_oracle():
    rng = np.random.default_rng(3)
    adj, feat, mask = rand_block(rng, 6, 8, 4)
    deg = np.clip(adj.sum(1), 1, None)
    adj_n = adj / deg[:, None]
    params, got = _single(SAGEConv(dim_out=5, act="elu"), adj_n, adj, feat, mask)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    def elu(x): return np.where(x > 0, x, np.exp(x) - 1)
    h_self = elu(feat @ p["TorchLinear_0"]["kernel"] + p["TorchLinear_0"]["bias"])
    h_neigh = elu(adj_n @ feat @ p["TorchLinear_1"]["kernel"] + p["TorchLinear_1"]["bias"])
    want = (np_norm_feat(h_self, p["scale"][0], p["offset"][0])
            + np_norm_feat(h_neigh, p["scale"][1], p["offset"][1]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gin_forward_oracle():
    rng = np.random.default_rng(4)
    adj, feat, mask = rand_block(rng, 6, 8, 4)
    params, got = _single(GINConv(dim_out=5, act="relu"), adj, adj, feat, mask)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    aggr = adj @ feat + (1 + p["eps"][0]) * feat
    h = aggr @ p["TorchLinear_0"]["kernel"] + p["TorchLinear_0"]["bias"]
    h = np.maximum(h, 0) @ p["TorchLinear_1"]["kernel"] + p["TorchLinear_1"]["bias"]
    want = np_norm_feat(np.maximum(h, 0), p["scale"], p["offset"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gat_forward_oracle():
    rng = np.random.default_rng(5)
    n_valid, n_pad, f, dim, heads = 6, 8, 4, 6, 2
    adj, feat, mask = rand_block(rng, n_valid, n_pad, f)
    params, got = _single(GATConv(dim_out=dim, act="relu", mulhead=heads),
                          adj, adj, feat, mask)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    dh = dim // heads
    def leaky(x): return np.where(x > 0, x, 0.2 * x)
    h_self = np.maximum(feat @ p["TorchLinear_0"]["kernel"] + p["TorchLinear_0"]["bias"], 0)
    h_neigh = np.maximum(feat @ p["TorchLinear_1"]["kernel"] + p["TorchLinear_1"]["bias"], 0)
    att = p["attention"]
    out_heads_self, out_heads_neigh = [], []
    for k in range(heads):
        hs = h_self[:, k * dh:(k + 1) * dh]
        hn = h_neigh[:, k * dh:(k + 1) * dh]
        a_s = leaky(hs @ att[0, k])
        a_n = leaky(hn @ att[1, k])
        # reference _aggregate_attention (layers.py:560-582)
        val = a_s[:, None] + a_n[None, :]
        aggr = np.zeros_like(hn)
        for i in range(n_pad):
            nbr = np.where(adj[i] > 0)[0]
            if nbr.size == 0:
                continue
            vmax = val[i, nbr].max()
            e = np.exp(val[i, nbr] - vmax)
            denom = max(e.sum(), 1e-10)
            aggr[i] = (e[:, None] * hn[nbr]).sum(0) / denom
        out_heads_neigh.append(np_norm_feat(aggr, p["scale"][0, k], p["offset"][0, k]))
        out_heads_self.append(np_norm_feat(hs, p["scale"][1, k], p["offset"][1, k]))
    want = (np.concatenate(out_heads_self, 1) + np.concatenate(out_heads_neigh, 1)) / 2
    np.testing.assert_allclose(got[:n_valid], want[:n_valid], rtol=1e-4, atol=1e-5)


def test_sort_pool_oracle():
    rng = np.random.default_rng(6)
    feat = rng.normal(size=(2, 7, 3)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]], bool)
    k = 4
    got = np.asarray(masked_sort_pool(jnp.asarray(feat), jnp.asarray(mask), k))
    for b in range(2):
        valid = np.where(mask[b])[0]
        order = valid[np.argsort(-feat[b, valid, -1], kind="stable")][:k]
        want = feat[b][order]
        if order.size < k:
            want = np.vstack([want, np.zeros((k - order.size, 3), np.float32)])
        np.testing.assert_allclose(got[b], want.reshape(-1), rtol=1e-6)


def test_respool_center_none_is_identity_gather():
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(2, 6, 5)).astype(np.float32))
    mask = jnp.ones((2, 6), bool)
    targets = jnp.asarray([[2], [4]])
    rp = ResPool(dim_hid=5, num_layers=1, type_res="none", type_pool="center",
                 dropout=0.0, act="relu")
    params = rp.init(jax.random.PRNGKey(0), [feats], targets, mask, train=False)
    out = rp.apply(params, [feats], targets, mask, train=False)
    want = np.stack([np.asarray(feats)[0, 2], np.asarray(feats)[1, 4]])
    np.testing.assert_allclose(np.asarray(out), want)


def test_loss_and_predict():
    cfg = ModelConfig(dim_feat_raw=4, dim_feat_smooth=4, dim_label_raw=3,
                      dim_label_smooth=0, loss="softmax")
    logits = jnp.asarray([[2.0, 1.0, 0.1], [0.1, 3.0, 0.2]])
    labels = jnp.asarray([0, 1])
    l = float(loss_fn(cfg, logits, labels))
    p = np.exp(np.asarray(logits))
    p /= p.sum(1, keepdims=True)
    want = -np.log(p[[0, 1], [0, 1]]).mean()
    assert abs(l - want) < 1e-6
    np.testing.assert_allclose(np.asarray(predict_fn(cfg, logits)), p, rtol=1e-6)

    cfg_s = ModelConfig(dim_feat_raw=4, dim_feat_smooth=4, dim_label_raw=3,
                        dim_label_smooth=0, loss="sigmoid")
    lab2 = jnp.asarray([[1, 0, 1], [0, 1, 0]], dtype=jnp.float32)
    l2 = float(loss_fn(cfg_s, logits, lab2))
    sig = 1 / (1 + np.exp(-np.asarray(logits)))
    bce = -(np.asarray(lab2) * np.log(sig) + (1 - np.asarray(lab2)) * np.log(1 - sig))
    assert abs(l2 - bce.mean() * 3) < 1e-5


def make_batch(rng, b, n_valid, n_pad, num_nodes=100):
    adjs, masks, nodes = [], [], []
    for _ in range(b):
        a, _, m = rand_block(rng, n_valid, n_pad, 1)
        adjs.append(a); masks.append(m)
        ids = np.sort(rng.choice(num_nodes, n_valid, replace=False))
        nodes.append(np.concatenate([ids, np.full(n_pad - n_valid, num_nodes)]))
    return SubgraphBatch(
        nodes=jnp.asarray(np.stack(nodes).astype(np.int32)),
        node_mask=jnp.asarray(np.stack(masks)),
        adj=jnp.asarray(np.stack(adjs)),
        targets=jnp.zeros((b, 1), jnp.int32),
        size=jnp.full((b,), n_valid, jnp.int32),
        hop=jnp.zeros((b, n_pad), jnp.int32),
        ppr=jnp.zeros((b, n_pad), jnp.float32),
        drnl=jnp.zeros((b, n_pad), jnp.int32),
    )


@pytest.mark.parametrize("aggr", ["gcn", "sage", "gat", "gin", "gatscat"])
def test_model_padding_invariance(aggr):
    """Growing the padding must not change the logits."""
    rng = np.random.default_rng(8)
    cfg = ModelConfig(dim_feat_raw=6, dim_feat_smooth=6, dim_label_raw=3,
                      dim_label_smooth=0, aggr=aggr, num_layers=2, dim=8,
                      act="relu", heads=2, residue="max", pooling="mean",
                      feature_augment=("hops",))
    b, n_valid, n_pad = 3, 5, 8
    batch = make_batch(rng, b, n_valid, n_pad)
    feat = rng.normal(size=(b, n_pad, 6)).astype(np.float32)
    feat[~np.asarray(batch.node_mask)] = 0
    model = DeepGNN(cfg)
    params = model.init(jax.random.PRNGKey(1), [batch], [jnp.asarray(feat)],
                        mode_train=False, train=False)
    out1, _ = model.apply(params, [batch], [jnp.asarray(feat)],
                          mode_train=False, train=False)
    # re-pad to n_pad + 5
    extra = 5
    def pad2(x, v=0):
        return jnp.pad(x, ((0, 0), (0, extra)), constant_values=v)
    batch2 = SubgraphBatch(
        nodes=pad2(batch.nodes, 100),
        node_mask=pad2(batch.node_mask, False),
        adj=jnp.pad(batch.adj, ((0, 0), (0, extra), (0, extra))),
        targets=batch.targets,
        size=batch.size,
        hop=pad2(batch.hop, -1),
        ppr=pad2(batch.ppr),
        drnl=pad2(batch.drnl),
    )
    feat2 = jnp.pad(jnp.asarray(feat), ((0, 0), (0, extra), (0, 0)))
    out2, _ = model.apply(params, [batch2], [feat2],
                          mode_train=False, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_norm_feat_custom_vjp_matches_autodiff():
    """norm_feat's fused backward == autodiff of the plain formula."""
    import jax
    import jax.numpy as jnp
    from shadow_gnn_tpu.nn.layers import norm_feat
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 16, 32)).astype(np.float32) * 3)
    sc = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    of = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def plain(x, sc, of):
        f = x.astype(jnp.float32)
        mean = f.mean(-1, keepdims=True)
        var = ((f - mean) ** 2).mean(-1, keepdims=True) + 1e-9
        return (f - mean) * sc * jax.lax.rsqrt(var) + of

    np.testing.assert_allclose(np.asarray(norm_feat(x, sc, of)),
                               np.asarray(plain(x, sc, of)), rtol=1e-6)
    l1 = lambda *a: (norm_feat(*a) * g).sum()
    l2 = lambda *a: (plain(*a) * g).sum()
    g1 = jax.grad(l1, argnums=(0, 1, 2))(x, sc, of)
    g2 = jax.grad(l2, argnums=(0, 1, 2))(x, sc, of)
    for a, b, nm in zip(g1, g2, ("dx", "dscale", "doffset")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=nm)


def test_norm_feat_grouped_matches_4d():
    """Flat per-head norm (indicator-matmul stats) == 4-D norm_feat on
    the reshaped [..., H, dh] layout, values and all three grads."""
    from shadow_gnn_tpu.nn.layers import norm_feat_grouped
    rng = np.random.default_rng(11)
    b, n, h, dh = 3, 10, 4, 6
    x = jnp.asarray(rng.normal(size=(b, n, h * dh)).astype(np.float32) * 2)
    sc = jnp.asarray(rng.normal(size=(h, dh)).astype(np.float32))
    of = jnp.asarray(rng.normal(size=(h, dh)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def via_4d(x, sc, of):
        return norm_feat(x.reshape(b, n, h, dh), sc, of).reshape(b, n, -1)

    want = via_4d(x, sc, of)
    got = norm_feat_grouped(x, sc.reshape(-1), of.reshape(-1), h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    l1 = lambda x, s, o: (norm_feat_grouped(x, s.reshape(-1),
                                            o.reshape(-1), h) * g).sum()
    l2 = lambda x, s, o: (via_4d(x, s, o) * g).sum()
    g1 = jax.grad(l1, argnums=(0, 1, 2))(x, sc, of)
    g2 = jax.grad(l2, argnums=(0, 1, 2))(x, sc, of)
    for a, b_, nm in zip(g1, g2, ("dx", "dscale", "doffset")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_).reshape(np.asarray(a).shape),
            rtol=1e-4, atol=1e-5, err_msg=nm)


@pytest.mark.parametrize("layout", ["flat", "hybrid", "headmajor"])
def test_gat_fused_flat_grads_match_dense(layout, monkeypatch):
    """Both fused GATConv layouts' parameter grads == the dense
    4-D chain's (same params, same cotangent)."""
    monkeypatch.setenv("SHADOW_GAT_LAYOUT", layout)
    rng = np.random.default_rng(12)
    b, n, f = 2, 16, 12
    adj = (rng.random((b, n, n)) < 0.35).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    np.einsum("bii->bi", adj)[:] = 1.0
    mask = (adj.sum(-1) > 0).astype(np.float32)
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    cot = rng.normal(size=(b, n, 8)).astype(np.float32)
    dense = GATConv(dim_out=8, mulhead=2, fused_att=False)
    fused = GATConv(dim_out=8, mulhead=2, fused_att=True)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                        jnp.asarray(adj), jnp.asarray(adj),
                        jnp.asarray(mask), train=False)

    def loss(layer, p):
        out = layer.apply(p, jnp.asarray(feat), jnp.asarray(adj),
                          jnp.asarray(adj), jnp.asarray(mask), train=False)
        return (out * jnp.asarray(cot)).sum()

    g1 = jax.grad(lambda p: loss(dense, p))(params)
    g2 = jax.grad(lambda p: loss(fused, p))(params)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict((jax.tree_util.keystr(k), v)
                 for k, v in jax.tree_util.tree_leaves_with_path(g2))
    for k, v in flat1:
        np.testing.assert_allclose(
            np.asarray(flat2[jax.tree_util.keystr(k)]), np.asarray(v),
            rtol=2e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_gatscatter_fused_flat_grads_match_dense():
    """GATScatterConv flat fused path's parameter grads == dense chain's."""
    from shadow_gnn_tpu.nn.layers import GATScatterConv
    rng = np.random.default_rng(13)
    b, n, f = 2, 16, 12
    adj = (rng.random((b, n, n)) < 0.35).astype(np.float32)
    adj = np.maximum(adj, np.swapaxes(adj, 1, 2))
    np.einsum("bii->bi", adj)[:] = 1.0
    mask = np.ones((b, n), np.float32)
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    cot = rng.normal(size=(b, n, 8)).astype(np.float32)
    dense = GATScatterConv(dim_out=8, mulhead=2, fused_att=False)
    fused = GATScatterConv(dim_out=8, mulhead=2, fused_att=True)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                        jnp.asarray(adj), jnp.asarray(adj),
                        jnp.asarray(mask), train=False)

    def loss(layer, p):
        out = layer.apply(p, jnp.asarray(feat), jnp.asarray(adj),
                          jnp.asarray(adj), jnp.asarray(mask), train=False)
        return (out * jnp.asarray(cot)).sum()

    g1 = jax.grad(lambda p: loss(dense, p))(params)
    g2 = jax.grad(lambda p: loss(fused, p))(params)
    flat2 = dict((jax.tree_util.keystr(k), v)
                 for k, v in jax.tree_util.tree_leaves_with_path(g2))
    for k, v in jax.tree_util.tree_leaves_with_path(g1):
        np.testing.assert_allclose(
            np.asarray(flat2[jax.tree_util.keystr(k)]), np.asarray(v),
            rtol=2e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


@pytest.mark.parametrize("act,norm,residue,pooling", [
    ("prelu", "norm_feat", "max", "max"),       # papers leaderboard shape
    ("prelu+", "norm_feat", "concat", "mean"),  # per-channel prelu, resident
    ("prelu", "pairnorm", "sum", "center"),     # pairnorm, resident
    ("relu", "norm_feat", "none", "sort-3"),    # sort pooling flat fallback
])
def test_gat_resident_chain_matches_dense_model(act, norm, residue, pooling,
                                                monkeypatch):
    """Full head-major residency (hm_chain): the fused GAT model with
    activations resident in [b, h, n, dh] across the conv stack + JK
    list + ResPool equals the dense (fused_att=False) model with the
    SAME parameters — including the round-5 additions pairnorm_hm and
    head-major per-channel prelu (VERDICT r4 next #4)."""
    monkeypatch.setenv("SHADOW_GAT_LAYOUT", "headmajor")
    rng = np.random.default_rng(21)
    common = dict(dim_feat_raw=6, dim_feat_smooth=6, dim_label_raw=3,
                  dim_label_smooth=0, aggr="gat", num_layers=3, dim=8,
                  act=act, layer_norm=norm, heads=2, residue=residue,
                  pooling=pooling, feature_augment=("hops",))
    b, n_valid, n_pad = 3, 6, 8
    batch = make_batch(rng, b, n_valid, n_pad)
    feat = rng.normal(size=(b, n_pad, 6)).astype(np.float32)
    feat[~np.asarray(batch.node_mask)] = 0
    dense = DeepGNN(ModelConfig(fused_gat=False, **common))
    fused = DeepGNN(ModelConfig(fused_gat=True, **common))
    params = dense.init(jax.random.PRNGKey(3), [batch], [jnp.asarray(feat)],
                        mode_train=False, train=False)
    out_d, _ = dense.apply(params, [batch], [jnp.asarray(feat)],
                           mode_train=False, train=False)
    out_f, _ = fused.apply(params, [batch], [jnp.asarray(feat)],
                           mode_train=False, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=2e-4, atol=1e-5)
    # parameter grads agree too (the resident chain backprops through
    # the hm transform einsum, pairnorm_hm and the hm poolers)
    cot = jnp.asarray(rng.normal(size=np.asarray(out_d).shape)
                      .astype(np.float32))

    def loss(m, p):
        out, _ = m.apply(p, [batch], [jnp.asarray(feat)],
                         mode_train=False, train=False)
        return (out * cot).sum()

    g_d = jax.grad(lambda p: loss(dense, p))(params)
    g_f = jax.grad(lambda p: loss(fused, p))(params)
    for (k, v_d), v_f in zip(
            jax.tree_util.tree_leaves_with_path(g_d),
            jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_d),
                                   rtol=5e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(k))

"""Per-layer activation allclose vs the ACTUAL reference implementation.

Runs the reference's torch modules (/root/reference/shaDow/layers.py)
directly on fixed subgraph batches and asserts the flax layers produce
the same activations (<=1e-5) under identical weights — the BASELINE.md
north-star ("per-layer activations vs reference: allclose on fixed
sampled subgraphs").

The environment has plain torch but not torch_scatter / torch_geometric;
both are shimmed here with faithful pure-torch implementations
(torch_scatter.scatter reduce=sum/max over 1-D src; PyG
global_sort_pool = descending sort by last channel, top-k, zero-pad),
which unlocks GAT / GATScatter / sort-pool parity as well.

Reference entry points exercised:
  GCN        layers.py:417-444     GraphSAGE  layers.py:447-494
  GIN        layers.py:497-536     GAT        layers.py:539-645
  GATScatter layers.py:648-744     MLP        layers.py:376-400
  ResPool    layers.py:55-233      EnsembleAggregator layers.py:236-296
  loss       models.py:156-166     adj_norm_{sym,rw} graph_utils.py:67-145
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import scipy.sparse as sp

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


# ---------------------------------------------------------------------------
# shims + reference import
# ---------------------------------------------------------------------------

def _install_shims():
    if "torch_scatter" in sys.modules:
        return

    def scatter(src, index, dim=0, reduce="sum"):
        assert dim == 0 and src.dim() == 1
        n = int(index.max()) + 1
        out = torch.zeros(n, dtype=src.dtype, device=src.device)
        if reduce == "sum":
            out.index_add_(0, index, src)
        elif reduce == "max":
            out.scatter_reduce_(0, index, src, reduce="amax",
                                include_self=False)
        else:
            raise NotImplementedError(reduce)
        return out

    def global_sort_pool(x, batch, k):
        b = int(batch.max()) + 1
        d = x.shape[1]
        out = torch.zeros(b, k * d, dtype=x.dtype)
        for i in range(b):
            xb = x[batch == i]
            perm = torch.argsort(xb[:, -1], descending=True)
            xb = xb[perm][:k]
            out[i, :xb.numel()] = xb.reshape(-1)
        return out

    m_sc = types.ModuleType("torch_scatter")
    m_sc.scatter = scatter
    sys.modules["torch_scatter"] = m_sc
    m_pg = types.ModuleType("torch_geometric")
    m_nn = types.ModuleType("torch_geometric.nn")
    m_nn.global_sort_pool = global_sort_pool
    m_pg.nn = m_nn
    sys.modules["torch_geometric"] = m_pg
    sys.modules["torch_geometric.nn"] = m_nn
    # shaDow.globals runs CONFIG.yml parsing + argparse at import time;
    # shaDow.utils only needs these two names from it
    m_gl = types.ModuleType("shaDow.globals")
    m_gl.git_rev = ""
    m_gl.timestamp = ""
    sys.modules["shaDow.globals"] = m_gl
    for p in (REF, os.path.join(REF, "para_graph_sampler")):
        if p not in sys.path:
            sys.path.insert(0, p)
    # graph_engine.frontend.__init__ imports graph.py, whose mutable
    # numpy dataclass defaults are rejected by python 3.12 — stub the
    # package with its constants and load graph_utils standalone
    m_ge = types.ModuleType("graph_engine")
    m_fe = types.ModuleType("graph_engine.frontend")
    m_fe.TRAIN, m_fe.VALID, m_fe.TEST = 0, 1, 2
    m_fe.MODE2STR = {0: "train", 1: "valid", 2: "test"}
    m_fe.STR2MODE = {v: k for k, v in m_fe.MODE2STR.items()}
    m_ge.frontend = m_fe
    sys.modules["graph_engine"] = m_ge
    sys.modules["graph_engine.frontend"] = m_fe
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graph_engine.frontend.graph_utils",
        os.path.join(REF, "para_graph_sampler/graph_engine/frontend/"
                     "graph_utils.py"))
    m_gu = importlib.util.module_from_spec(spec)
    sys.modules["graph_engine.frontend.graph_utils"] = m_gu
    m_fe.graph_utils = m_gu
    spec.loader.exec_module(m_gu)


_install_shims()
ref_layers = pytest.importorskip("shaDow.layers")
from graph_engine.frontend import graph_utils as ref_gu  # noqa: E402

from shadow_gnn_tpu.nn import layers as my_layers  # noqa: E402
from shadow_gnn_tpu.nn import respool as my_respool  # noqa: E402
from shadow_gnn_tpu.ops.normalize import prepare_adj  # noqa: E402


# ---------------------------------------------------------------------------
# fixed subgraph batch: 3 blocks of sizes (5, 7, 4), padded to N=8
# ---------------------------------------------------------------------------

SIZES = (5, 7, 4)
N_PAD = 8
F_IN = 6


def make_blocks(seed=0, self_edges=False):
    rng = np.random.default_rng(seed)
    blocks = []
    for n in SIZES:
        a = (rng.random((n, n)) < 0.45).astype(np.float32)
        a = np.clip(a + a.T, 0, 1)
        np.fill_diagonal(a, 1.0 if self_edges else 0.0)
        # every row needs >= 1 edge (subgraphs are connected in practice)
        for i in range(n):
            if a[i].sum() == 0:
                j = (i + 1) % n
                a[i, j] = a[j, i] = 1.0
        blocks.append(a)
    return blocks


def block_diag_csr(blocks):
    a = sp.csr_matrix(sp.block_diag(blocks))
    a.eliminate_zeros()      # block_diag keeps explicit zeros from dense
    return a


def pad_dense(blocks):
    b = len(blocks)
    adj = np.zeros((b, N_PAD, N_PAD), np.float32)
    mask = np.zeros((b, N_PAD), bool)
    for i, a in enumerate(blocks):
        n = a.shape[0]
        adj[i, :n, :n] = a
        mask[i, :n] = True
    return jnp.asarray(adj), jnp.asarray(mask)


def make_feats(seed=1, f_in=F_IN):
    rng = np.random.default_rng(seed)
    total = sum(SIZES)
    flat = rng.normal(size=(total, f_in)).astype(np.float32)
    padded = np.zeros((len(SIZES), N_PAD, f_in), np.float32)
    off = 0
    for i, n in enumerate(SIZES):
        padded[i, :n] = flat[off:off + n]
        off += n
    return flat, jnp.asarray(padded)


def unpad(out_padded):
    """[B, N_PAD, F] -> [total, F] rows in block order."""
    rows = []
    for i, n in enumerate(SIZES):
        rows.append(np.asarray(out_padded[i, :n]))
    return np.concatenate(rows, 0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def set_params(tree, path, value):
    """Overwrite a leaf in a (possibly frozen) flax param dict."""
    d = tree
    for k in path[:-1]:
        d = d[k]
    d[path[-1]] = value


def unfreeze(params):
    try:
        from flax.core import unfreeze as uf
        return jax.tree_util.tree_map(lambda x: x, uf(params))
    except Exception:
        return params


def allclose(a, b, tol=2e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=tol, atol=tol)


# ---------------------------------------------------------------------------
# conv layers
# ---------------------------------------------------------------------------

def _run_ref_conv(layer, flat, adj_csr, sizes):
    with torch.no_grad():
        out, *_ = layer((torch.from_numpy(flat), adj_csr, False, 0.0),
                        torch.tensor(sizes))
    return out.numpy()


def _init_my(layer, *args, **kw):
    params = layer.init(jax.random.PRNGKey(0), *args, train=False, **kw)
    return unfreeze(params)


DIM_OUT = 8


def test_gcn_parity():
    torch.manual_seed(0)
    blocks = make_blocks(self_edges=True)     # sampler pre-adds self edges
    flat, feat_pad = make_feats()
    ref = ref_layers.GCN(F_IN, DIM_OUT, dropout=0.0, act="relu")
    out_ref = _run_ref_conv(ref, flat, block_diag_csr(blocks), SIZES)

    adj, mask = pad_dense(blocks)
    adj_norm, adj_struct = prepare_adj("gcn", adj)
    mine = my_layers.GCNConv(dim_out=DIM_OUT)
    p = _init_my(mine, feat_pad, adj_norm, adj_struct, mask)
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.f_lin.weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.f_lin.bias))
    set_params(p, ("params", "scale"), t2j(ref.scale[0]))
    set_params(p, ("params", "offset"), t2j(ref.offset[0]))
    out = mine.apply(p, feat_pad, adj_norm, adj_struct, mask, train=False)
    allclose(unpad(out), out_ref)


def test_sage_parity():
    torch.manual_seed(1)
    blocks = make_blocks(seed=2)
    flat, feat_pad = make_feats(seed=3)
    ref = ref_layers.GraphSAGE(F_IN, DIM_OUT, dropout=0.0, act="relu")
    # reference SAGE converts the csr to torch COO internally, then
    # rw-normalizes (layers.py:465-469)
    out_ref = _run_ref_conv(ref, flat, block_diag_csr(blocks), SIZES)

    adj, mask = pad_dense(blocks)
    adj_norm, adj_struct = prepare_adj("sage", adj)
    mine = my_layers.SAGEConv(dim_out=DIM_OUT)
    p = _init_my(mine, feat_pad, adj_norm, adj_struct, mask)
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.f_lin_self.weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.f_lin_self.bias))
    set_params(p, ("params", "TorchLinear_1", "kernel"), t2j(ref.f_lin_neigh.weight.T))
    set_params(p, ("params", "TorchLinear_1", "bias"), t2j(ref.f_lin_neigh.bias))
    set_params(p, ("params", "scale"), t2j(ref.scale))
    set_params(p, ("params", "offset"), t2j(ref.offset))
    out = mine.apply(p, feat_pad, adj_norm, adj_struct, mask, train=False)
    allclose(unpad(out), out_ref)


def test_gin_parity():
    torch.manual_seed(2)
    blocks = make_blocks(seed=4)
    flat, feat_pad = make_feats(seed=5)
    ref = ref_layers.GIN(F_IN, DIM_OUT, dropout=0.0, act="relu", eps=0.3)
    out_ref = _run_ref_conv(ref, flat, block_diag_csr(blocks), SIZES)

    adj, mask = pad_dense(blocks)
    adj_norm, adj_struct = prepare_adj("gin", adj)
    mine = my_layers.GINConv(dim_out=DIM_OUT)
    p = _init_my(mine, feat_pad, adj_norm, adj_struct, mask)
    set_params(p, ("params", "eps"), t2j(ref.eps))
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.mlp[0].weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.mlp[0].bias))
    set_params(p, ("params", "TorchLinear_1", "kernel"), t2j(ref.mlp[2].weight.T))
    set_params(p, ("params", "TorchLinear_1", "bias"), t2j(ref.mlp[2].bias))
    set_params(p, ("params", "scale"), t2j(ref.scale[0]))
    set_params(p, ("params", "offset"), t2j(ref.offset[0]))
    out = mine.apply(p, feat_pad, adj_norm, adj_struct, mask, train=False)
    allclose(unpad(out), out_ref)


def test_mlp_parity():
    torch.manual_seed(3)
    flat, feat_pad = make_feats(seed=6)
    ref = ref_layers.MLP(F_IN, DIM_OUT, dropout=0.0, act="relu")
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(flat)).numpy()
    _, mask = pad_dense(make_blocks())
    mine = my_layers.MLPLayer(dim_out=DIM_OUT)
    p = _init_my(mine, feat_pad, None, None, mask)
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.f_lin.weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.f_lin.bias))
    set_params(p, ("params", "scale"), t2j(ref.scale[0]))
    set_params(p, ("params", "offset"), t2j(ref.offset[0]))
    out = mine.apply(p, feat_pad, None, None, mask, train=False)
    allclose(unpad(out), out_ref)


def test_gat_parity():
    torch.manual_seed(4)
    heads = 2
    blocks = make_blocks(seed=7, self_edges=True)   # add_self_edge forced
    flat, feat_pad = make_feats(seed=8)
    ref = ref_layers.GAT(F_IN, DIM_OUT, dropout=0.0, act="relu",
                         mulhead=heads)
    out_ref = _run_ref_conv(ref, flat, block_diag_csr(blocks), SIZES)

    adj, mask = pad_dense(blocks)
    adj_norm, adj_struct = prepare_adj("gat", adj)
    mine = my_layers.GATConv(dim_out=DIM_OUT, mulhead=heads)
    p = _init_my(mine, feat_pad, adj_norm, adj_struct, mask)
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.f_lin[0].weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.f_lin[0].bias))
    set_params(p, ("params", "TorchLinear_1", "kernel"), t2j(ref.f_lin[1].weight.T))
    set_params(p, ("params", "TorchLinear_1", "bias"), t2j(ref.f_lin[1].bias))
    set_params(p, ("params", "attention"), t2j(ref.attention))
    set_params(p, ("params", "scale"), t2j(ref.scale))
    set_params(p, ("params", "offset"), t2j(ref.offset))
    out = mine.apply(p, feat_pad, adj_norm, adj_struct, mask, train=False)
    allclose(unpad(out), out_ref)


def test_gatscatter_parity():
    torch.manual_seed(5)
    heads = 2
    blocks = make_blocks(seed=9, self_edges=True)
    flat, feat_pad = make_feats(seed=10)
    ref = ref_layers.GATScatter(F_IN, DIM_OUT, dropout=0.0, act="relu",
                                mulhead=heads)
    out_ref = _run_ref_conv(ref, flat, block_diag_csr(blocks), SIZES)

    adj, mask = pad_dense(blocks)
    adj_norm, adj_struct = prepare_adj("gatscat", adj)
    mine = my_layers.GATScatterConv(dim_out=DIM_OUT, mulhead=heads)
    p = _init_my(mine, feat_pad, adj_norm, adj_struct, mask)
    set_params(p, ("params", "w_src"), t2j(ref.f_lin[0].weight.T))
    set_params(p, ("params", "b_src"), t2j(ref.f_lin[0].bias))
    set_params(p, ("params", "w_dst"), t2j(ref.f_lin[1].weight.T))
    set_params(p, ("params", "b_dst"), t2j(ref.f_lin[1].bias))
    set_params(p, ("params", "attention"), t2j(ref.attention))
    set_params(p, ("params", "scale"), t2j(ref.scale[0]))
    set_params(p, ("params", "offset"), t2j(ref.offset[0]))
    out = mine.apply(p, feat_pad, adj_norm, adj_struct, mask, train=False)
    allclose(unpad(out), out_ref)


# ---------------------------------------------------------------------------
# ResPool readout
# ---------------------------------------------------------------------------

def _offsets():
    off = np.zeros(len(SIZES), np.int64)
    off[1:] = np.cumsum(SIZES)[:-1]
    return off


def _respool_pair(type_res, type_pool, num_layers=2, dim_out=5, sort_k=3):
    torch.manual_seed(6)
    rng = np.random.default_rng(11)
    total = sum(SIZES)
    feats_flat = [rng.normal(size=(total, F_IN)).astype(np.float32)
                  for _ in range(num_layers)]
    feats_pad = []
    for fl in feats_flat:
        padded = np.zeros((len(SIZES), N_PAD, F_IN), np.float32)
        off = 0
        for i, n in enumerate(SIZES):
            padded[i, :n] = fl[off:off + n]
            off += n
        feats_pad.append(jnp.asarray(padded))
    ref = ref_layers.ResPool(F_IN, dim_out, num_layers, type_res, type_pool,
                             dropout=0.0, act="relu",
                             args_pool={"k": sort_k})
    idx_targets = torch.from_numpy(_offsets())
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(f) for f in feats_flat],
                      idx_targets, torch.tensor(SIZES)).numpy()

    mine = my_respool.ResPool(dim_hid=dim_out, num_layers=num_layers,
                              type_res=type_res, type_pool=type_pool,
                              dropout=0.0, act="relu", sort_k=sort_k)
    _, mask = pad_dense(make_blocks())
    targets = jnp.zeros((len(SIZES), 1), jnp.int32)   # block-local center
    p = unfreeze(mine.init(jax.random.PRNGKey(0), feats_pad, targets, mask,
                           train=False))
    if type_pool == "sort":
        set_params(p, ("params", "TorchLinear_0", "kernel"),
                   t2j(ref.nn_pool[1].weight.T))
        set_params(p, ("params", "TorchLinear_0", "bias"),
                   t2j(ref.nn_pool[1].bias))
        lin_name = "TorchLinear_1"
    else:
        lin_name = "TorchLinear_0"
    if hasattr(ref, "nn"):
        set_params(p, ("params", lin_name, "kernel"), t2j(ref.nn[1].weight.T))
        set_params(p, ("params", lin_name, "bias"), t2j(ref.nn[1].bias))
        set_params(p, ("params", "scale"), t2j(ref.scale))
        set_params(p, ("params", "offset"), t2j(ref.offset))
    out = mine.apply(p, feats_pad, targets, mask, train=False)
    allclose(np.asarray(out), out_ref)


def test_respool_center_none():
    _respool_pair("none", "center")


def test_respool_center_concat():
    _respool_pair("concat", "center")


def test_respool_mean_sum_residue():
    _respool_pair("sum", "mean")


def test_respool_max_concat():
    _respool_pair("concat", "max")


def test_respool_sum_max_residue():
    _respool_pair("max", "sum")


def test_respool_sort():
    _respool_pair("concat", "sort", sort_k=3)


# ---------------------------------------------------------------------------
# ensemble aggregator + loss
# ---------------------------------------------------------------------------

def test_ensemble_aggregator_parity():
    torch.manual_seed(7)
    rng = np.random.default_rng(12)
    n, f = 10, 6
    xs = [rng.normal(size=(n, f)).astype(np.float32) for _ in range(3)]
    ref = ref_layers.EnsembleAggregator(f, f, 3, dropout=0.0,
                                        act="leakyrelu")
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(x) for x in xs]).numpy()
    mine = my_respool.EnsembleAggregator(dim_hid=f, num_ensemble=3)
    p = unfreeze(mine.init(jax.random.PRNGKey(0), [jnp.asarray(x) for x in xs],
                           train=False))
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.f_lin.weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.f_lin.bias))
    set_params(p, ("params", "q"), t2j(ref.q))
    out = mine.apply(p, [jnp.asarray(x) for x in xs], train=False)
    allclose(np.asarray(out), out_ref)


def test_loss_parity():
    """models.py:156-166: BCEWithLogits * num_classes / CrossEntropy."""
    from shadow_gnn_tpu.train.pipeline import weighted_loss_fn
    from shadow_gnn_tpu.nn.model import ModelConfig
    rng = np.random.default_rng(13)
    n, c = 12, 7
    logits = rng.normal(size=(n, c)).astype(np.float32)
    # sigmoid (multilabel)
    lab_ml = (rng.random((n, c)) < 0.3).astype(np.float32)
    ref_bce = (torch.nn.BCEWithLogitsLoss()(
        torch.from_numpy(logits), torch.from_numpy(lab_ml)) * c).item()
    cfg = ModelConfig(dim_feat_raw=1, dim_feat_smooth=1, dim_label_raw=c,
                      dim_label_smooth=0, loss="sigmoid")
    got = weighted_loss_fn(cfg, jnp.asarray(logits), jnp.asarray(lab_ml),
                           jnp.ones(n))
    assert abs(float(got) - ref_bce) < 1e-5
    # softmax (single label, 2-D one-hot input flattened via argmax)
    lab_oh = np.eye(c, dtype=np.float32)[rng.integers(0, c, n)]
    ref_ce = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits),
        torch.max(torch.from_numpy(lab_oh), axis=1)[1]).item()
    cfg2 = ModelConfig(dim_feat_raw=1, dim_feat_smooth=1, dim_label_raw=c,
                       dim_label_smooth=0, loss="softmax")
    got2 = weighted_loss_fn(cfg2, jnp.asarray(logits), jnp.asarray(lab_oh),
                            jnp.ones(n))
    assert abs(float(got2) - ref_ce) < 1e-5


def test_link_readout_parity():
    """src (*) dst target aggregation (layers.py:145-152) for link tasks."""
    torch.manual_seed(8)
    rng = np.random.default_rng(14)
    total = sum(SIZES)
    flat = rng.normal(size=(total, F_IN)).astype(np.float32)
    ref = ref_layers.ResPool(F_IN, 5, 1, "none", "center", dropout=0.0,
                             act="relu", prediction_task="link")
    # 2 targets per subgraph: block offset + offset+1
    off = _offsets()
    idx_t = np.stack([off, off + 1], 1).reshape(-1)
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(flat)], torch.from_numpy(idx_t),
                      torch.tensor(SIZES)).numpy()
    padded = np.zeros((len(SIZES), N_PAD, F_IN), np.float32)
    o = 0
    for i, n in enumerate(SIZES):
        padded[i, :n] = flat[o:o + n]
        o += n
    mine = my_respool.ResPool(dim_hid=5, num_layers=1, type_res="none",
                              type_pool="center", dropout=0.0, act="relu",
                              prediction_task="link")
    _, mask = pad_dense(make_blocks())
    targets = jnp.asarray(np.tile([[0, 1]], (len(SIZES), 1)).astype(np.int32))
    p = unfreeze(mine.init(jax.random.PRNGKey(0), [jnp.asarray(padded)],
                           targets, mask, train=False))
    set_params(p, ("params", "TorchLinear_0", "kernel"), t2j(ref.nn[1].weight.T))
    set_params(p, ("params", "TorchLinear_0", "bias"), t2j(ref.nn[1].bias))
    set_params(p, ("params", "scale"), t2j(ref.scale))
    set_params(p, ("params", "offset"), t2j(ref.offset))
    out = mine.apply(p, [jnp.asarray(padded)], targets, mask, train=False)
    allclose(np.asarray(out), out_ref)

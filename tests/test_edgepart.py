"""Edge-partitioned graph path (parallel/edgepart.py) on the 8-device
CPU mesh: collective CSR accesses vs the local CSR, distributed
induction vs the single-chip exact kernel, and the full train step vs
the single-device loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from shadow_gnn_tpu import TRAIN
from shadow_gnn_tpu.data.graph import DeviceGraph
from shadow_gnn_tpu.sampling.batch import SamplerConfig
from shadow_gnn_tpu.parallel import edgepart as ep

AXIS = "dp"


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must set 8 virtual devices"
    return Mesh(np.array(jax.devices()[:8]), (AXIS,))


def _undirected_csr(n, avg_deg, rng, hub=None, hub_deg=0):
    """Random symmetric CSR with optional planted hub node."""
    m = n * avg_deg // 2
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    if hub is not None:
        extra = rng.choice(n, size=hub_deg, replace=False)
        src = np.concatenate([src, np.full(hub_deg, hub)])
        dst = np.concatenate([dst, extra])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    dup = np.zeros(u.size, bool)
    dup[1:] = (u[1:] == u[:-1]) & (v[1:] == v[:-1])
    u, v = u[~dup], v[~dup]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr[1:], u, 1)
    indptr = np.cumsum(indptr)
    return indptr.astype(np.int64), v.astype(np.int32)


def test_shard_csr_roundtrip():
    rng = np.random.default_rng(0)
    indptr, indices = _undirected_csr(101, 6, rng)
    csr = ep.shard_csr(indptr, indices, 8)
    nl = csr.n_local
    ptr = np.asarray(csr.indptr)
    idx = np.asarray(csr.indices)
    for node in range(101):
        s, r = divmod(node, nl)
        lo, hi = ptr[s, r], ptr[s, r + 1]
        np.testing.assert_array_equal(
            idx[s, lo:hi], indices[indptr[node]:indptr[node + 1]])
    # padding rows have degree zero
    for pad_row in range(101, nl * 8):
        s, r = divmod(pad_row, nl)
        assert ptr[s, r] == ptr[s, r + 1]


def test_fetch_adj_rows_and_degrees(mesh8):
    rng = np.random.default_rng(1)
    n = 90
    indptr, indices = _undirected_csr(n, 6, rng)
    csr = ep.shard_csr(indptr, indices, 8)
    b, npad, d = 16, 10, 8
    nodes = rng.integers(0, n, (b, npad)).astype(np.int32)
    nodes[0, -2:] = n                       # sentinel / padding ids

    def two(ptr, idx, nds):
        return ep.fetch_adj_rows(ptr, idx, nds, d, csr.n_local, n, AXIS)

    nbrs, deg = jax.jit(jax.shard_map(
        lambda p, i, nds: two(p[0], i[0], nds), mesh=mesh8,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None, None), P(AXIS, None)),
        check_vma=False))(csr.indptr, csr.indices, jnp.asarray(nodes))
    nbrs, deg = np.asarray(nbrs), np.asarray(deg)
    for bi in range(b):
        for ni in range(npad):
            v = nodes[bi, ni]
            if v >= n:
                assert deg[bi, ni] == 0
                assert (nbrs[bi, ni] == n).all()
                continue
            row = indices[indptr[v]:indptr[v + 1]]
            assert deg[bi, ni] == row.size
            take = min(row.size, d)
            np.testing.assert_array_equal(nbrs[bi, ni, :take], row[:take])
            assert (nbrs[bi, ni, take:] == n).all()


def test_fetch_at_offsets_and_edge_queries(mesh8):
    rng = np.random.default_rng(2)
    n = 64
    indptr, indices = _undirected_csr(n, 5, rng)
    csr = ep.shard_csr(indptr, indices, 8)
    b, q, m = 8, 6, 4
    nodes = rng.integers(0, n, (b, q)).astype(np.int32)
    deg = np.diff(indptr)[np.clip(nodes, 0, n - 1)]
    off = rng.integers(0, 8, (b, q, m)).astype(np.int32)
    off = np.where(off < deg[..., None], off, -1)

    got = jax.jit(jax.shard_map(
        lambda p, i, nds, o: ep.fetch_at_offsets(
            p[0], i[0], nds, o, csr.n_local, n, AXIS),
        mesh=mesh8,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None, None)),
        out_specs=P(AXIS, None, None), check_vma=False))(
        csr.indptr, csr.indices, jnp.asarray(nodes), jnp.asarray(off))
    got = np.asarray(got)
    for bi in range(b):
        for qi in range(q):
            v = nodes[bi, qi]
            for mi in range(m):
                o = off[bi, qi, mi]
                want = indices[indptr[v] + o] if o >= 0 else n
                assert got[bi, qi, mi] == want

    # edge existence queries
    uq = rng.integers(0, n, (b, m, m)).astype(np.int32)
    vq = rng.integers(0, n, (b, m, m)).astype(np.int32)
    exist = jax.jit(jax.shard_map(
        lambda p, i, u, v: ep.fetch_edge_queries(
            p[0], i[0], u, v, csr.n_local, n, csr.search_steps, AXIS),
        mesh=mesh8,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None, None),
                  P(AXIS, None, None)),
        out_specs=P(AXIS, None, None), check_vma=False))(
        csr.indptr, csr.indices, jnp.asarray(uq), jnp.asarray(vq))
    exist = np.asarray(exist)
    for bi in range(b):
        for i in range(m):
            for j in range(m):
                u, v = uq[bi, i, j], vq[bi, i, j]
                want = v in indices[indptr[u]:indptr[u + 1]]
                assert exist[bi, i, j] == want


def _node_sets(rng, n, b, npad):
    """Sorted unique node id sets with sentinel padding; roots = member 0."""
    nodes = np.full((b, npad), n, np.int32)
    roots = np.zeros((b, 1), np.int32)
    for i in range(b):
        size = rng.integers(3, npad + 1)
        ids = np.sort(rng.choice(n, size=size, replace=False))
        nodes[i, :size] = ids
        roots[i, 0] = ids[rng.integers(0, size)]
    return nodes, roots


@pytest.mark.parametrize("hubby", [False, True])
def test_induce_edgepart_matches_exact(mesh8, hubby):
    rng = np.random.default_rng(3 + hubby)
    n = 96
    indptr, indices = _undirected_csr(
        n, 5, rng, hub=7 if hubby else None, hub_deg=40 if hubby else 0)
    g = DeviceGraph.from_csr(indptr, indices)
    csr = ep.shard_csr(indptr, indices, 8)
    b, npad = 8, 12
    nodes, roots = _node_sets(rng, n, b, npad)
    if hubby:
        nodes[0, 0] = 7                     # force the hub into a scope
        nodes[0] = np.sort(nodes[0])
        roots[0, 0] = 7
    fetch_cap = 8 if hubby else int(np.diff(indptr).max())
    cfg = SamplerConfig(method="ppr", n_pad=npad, add_self_edge=True,
                        aug_feats=("hops",), induction="hub",
                        deg_cap=fetch_cap, hub_slots=4 if hubby else 0,
                        cand_cap=npad * fetch_cap)

    def run(p, i, nds, rts):
        batch = ep.induce_edgepart(
            (p[0], i[0]), nds, jnp.zeros_like(nds, jnp.float32), rts, cfg,
            csr.n_local, n, csr.search_steps, fetch_cap, AXIS)
        return (batch.adj, batch.hop, batch.targets, batch.size,
                jax.lax.psum(batch.overflow, AXIS))

    got_adj, got_hop, got_tgt, got_size, got_ovf = jax.jit(jax.shard_map(
        run, mesh=mesh8,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None)),
        out_specs=(P(AXIS, None, None), P(AXIS, None), P(AXIS, None),
                   P(AXIS), P()),
        check_vma=False))(
        csr.indptr, csr.indices, jnp.asarray(nodes), jnp.asarray(roots))

    from shadow_gnn_tpu.sampling.induction import induce
    cfg_exact = SamplerConfig(method="ppr", n_pad=npad, add_self_edge=True,
                              aug_feats=("hops",), induction="search")
    want = induce(g, jnp.asarray(nodes), jnp.zeros_like(
        jnp.asarray(nodes), jnp.float32), jnp.asarray(roots), cfg_exact)
    np.testing.assert_array_equal(np.asarray(got_adj), np.asarray(want.adj))
    np.testing.assert_array_equal(np.asarray(got_hop), np.asarray(want.hop))
    np.testing.assert_array_equal(np.asarray(got_tgt),
                                  np.asarray(want.targets))
    np.testing.assert_array_equal(np.asarray(got_size),
                                  np.asarray(want.size))
    assert int(got_ovf) == 0


def test_khop_edgepart_matches_single(mesh8):
    """budget >= max_deg makes khop deterministic: full 2-hop scope."""
    rng = np.random.default_rng(5)
    n = 80
    indptr, indices = _undirected_csr(n, 4, rng)
    g = DeviceGraph.from_csr(indptr, indices)
    csr = ep.shard_csr(indptr, indices, 8)
    budget = int(np.diff(indptr).max())
    cfg = SamplerConfig(method="khop", n_pad=64, depth=2, budget=budget)
    b = 8
    roots = rng.integers(0, n, (b, 1)).astype(np.int32)

    got, _ = jax.jit(jax.shard_map(
        lambda p, i, rts: ep.sample_nodes_khop_edgepart(
            cfg, (p[0], i[0]), rts, jax.random.PRNGKey(0), csr.n_local, n,
            AXIS),
        mesh=mesh8,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None), P(AXIS, None)), check_vma=False))(
        csr.indptr, csr.indices, jnp.asarray(roots))

    from shadow_gnn_tpu.sampling.samplers import sample_nodes_khop
    want, _ = sample_nodes_khop(cfg, g, jnp.asarray(roots),
                                jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _tiny_trainer(tmp_path, batch_size, sampler=None):
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer
    g = make_synthetic_dataset(num_nodes=400, avg_deg=6, num_feat=8,
                               num_classes=4, seed=0)
    cfg = {
        "data": {"transductive": True},
        "architecture": {"dim": 16, "aggr": "sage", "loss": "softmax",
                         "num_layers": 2, "act": "relu",
                         "feature_augment": "hops", "residue": "none",
                         "pooling": "center"},
        "hyperparameter": {"end": 1, "lr": 1e-2, "dropout": 0.0,
                           "dropedge": 0.0, "batch_size": batch_size},
        "sampler": sampler or [{"method": "ppr", "phase": "train",
                                "k": [8], "epsilon": [1e-5]}],
    }
    parsed = parse_config(cfg)
    m = Metrics("toy", False, "accuracy", 1)
    logger = Logger(m, str(tmp_path), no_log=True)
    return Trainer("toy", "", g, parsed, m, logger, seed=0,
                   use_device_ppr=False)


def test_edgepart_train_step_matches_single_device_loss(tmp_path):
    """First-step loss of the fully partitioned path == the single-chip
    pipeline's loss on the same batch (deterministic sampler, no
    dropout): the partitioning is semantics-free."""
    import jax.random as jr
    from shadow_gnn_tpu.train.pipeline import weighted_loss_fn

    tr = _tiny_trainer(tmp_path, batch_size=8)
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    step, shard_batch, replicate = ep.make_edgepart_train_step(tr, TRAIN, 8)
    params = replicate(tr.params)
    opt_state = replicate(tr.opt_state)
    xs = shard_batch((roots[0], rows[0], labels[0], w[0]))
    p2, o2, loss = step(params, opt_state, jr.PRNGKey(0), *xs)
    loss = float(loss)

    arrays = tr._mode_arrays(TRAIN)
    batches, feats = tr._sample_branch_batches(
        TRAIN, roots[0], rows[0], jr.PRNGKey(0), arrays)
    logits, _ = tr.model.apply(tr.params, batches, feats, mode_train=True,
                               train=True,
                               rngs={"dropout": jr.PRNGKey(1),
                                     "dropedge": jr.PRNGKey(2)})
    want = float(weighted_loss_fn(tr.model_cfg, logits,
                                  jnp.asarray(labels[0]), jnp.asarray(w[0])))
    assert np.isclose(loss, want, rtol=1e-4), (loss, want)
    # and the step updates parameters
    delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, p2, params), 0.0)
    assert delta > 0


def test_edgepart_train_step_khop(tmp_path):
    """khop branch exercises the two-phase remote row fetch end to end."""
    import jax.random as jr
    tr = _tiny_trainer(tmp_path, batch_size=8,
                       sampler=[{"method": "khop", "phase": "train",
                                 "depth": [2], "budget": [6]}])
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    step, shard_batch, replicate = ep.make_edgepart_train_step(tr, TRAIN, 8)
    params = replicate(tr.params)
    opt_state = replicate(tr.opt_state)
    losses = []
    for ib in range(min(nb, 4)):
        xs = shard_batch((roots[ib], rows[ib], labels[ib], w[ib]))
        params, opt_state, loss = step(params, opt_state, jr.PRNGKey(ib),
                                       *xs)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_ring_spmm_matches_spmm_edges(mesh8):
    rng = np.random.default_rng(7)
    n, f, e = 203, 5, 1200
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    val = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    fn = ep.make_ring_spmm(src, dst, val, n, 8)
    got = np.asarray(fn(x))
    from shadow_gnn_tpu.ops.spmm import spmm_edges
    want = np.asarray(spmm_edges(jnp.asarray(src.astype(np.int32)),
                                 jnp.asarray(dst.astype(np.int32)),
                                 jnp.asarray(val), jnp.asarray(x), n))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("type_norm", ["sym", "ppr"])
def test_distributed_smoothening_matches_single(type_norm):
    from shadow_gnn_tpu.train.preproc import smooth_signal_full
    rng = np.random.default_rng(8)
    indptr, indices = _undirected_csr(150, 6, rng)
    sig = rng.normal(size=(150, 4)).astype(np.float32)
    args = {"alpha": 0.9, "norm_adj": "sym", "itr_max": 5, "thres": 1e-9,
            "norm_feat": "none"}
    want = smooth_signal_full(indptr, indices, sig, type_norm, 2, "concat",
                              args)
    got = smooth_signal_full(indptr, indices, sig, type_norm, 2, "concat",
                             args, n_shards=8)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_distributed_cns_matches_single():
    from shadow_gnn_tpu.postproc.cns import general_outcome_correlation
    rng = np.random.default_rng(9)
    indptr, indices = _undirected_csr(120, 5, rng)
    y0 = rng.uniform(size=(120, 6)).astype(np.float32)
    want = general_outcome_correlation(indptr, indices, y0, n_prop=10,
                                       alpha=0.8, use_norm=True)
    got = general_outcome_correlation(indptr, indices, y0, n_prop=10,
                                      alpha=0.8, use_norm=True, n_shards=8)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_edgepart_step_two_branch_ensemble(tmp_path):
    """ppr + ppr_st ensemble through the edge-partitioned step: both
    branches' table collectives and the stochastic sampler's per-shard
    rng folding run in one program."""
    import jax.random as jr
    tr = _tiny_trainer(
        tmp_path, batch_size=8,
        sampler=[{"method": "ppr", "phase": "train", "k": [8],
                  "epsilon": [1e-5]},
                 {"method": "ppr_st", "phase": "train", "k": [6],
                  "epsilon": [1e-5]}])
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    step, shard_batch, replicate = ep.make_edgepart_train_step(tr, TRAIN, 8)
    params = replicate(tr.params)
    opt_state = replicate(tr.opt_state)
    losses = []
    for ib in range(min(nb, 4)):
        xs = shard_batch((roots[ib], rows[ib], labels[ib], w[ib]))
        params, opt_state, loss = step(params, opt_state, jr.PRNGKey(ib),
                                       *xs)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_partition_link_task_epoch(tmp_path):
    """Link-prediction task (2-target subgraphs, DRNL, per-epoch
    negative sampling) through the --partition edge TRAIN path."""
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer
    g = make_synthetic_dataset(num_nodes=300, avg_deg=6, num_feat=8,
                               num_classes=2, seed=0, task="link")
    cfg = {
        "data": {"transductive": True},
        "architecture": {"dim": 16, "aggr": "sage", "loss": "sigmoid",
                         "num_layers": 2, "act": "relu",
                         "feature_augment": "drnls", "residue": "none",
                         "pooling": "center"},
        "hyperparameter": {"end": 1, "lr": 1e-2, "dropout": 0.0,
                           "dropedge": 0.0, "batch_size": 16},
        "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                     "epsilon": [1e-5]}],
    }
    parsed = parse_config(cfg)
    m = Metrics("toylink", True, "hits20", 1)
    logger = Logger(m, str(tmp_path), no_log=True)
    tr = Trainer("toylink", "", g, parsed, m, logger, seed=0,
                 use_device_ppr=False, partition="edge",
                 partition_devices=8)
    from shadow_gnn_tpu import TRAIN
    s0 = tr.run_epoch(0, TRAIN)
    s1 = tr.run_epoch(1, TRAIN)
    assert np.isfinite(s0["loss"]) and np.isfinite(s1["loss"])
    assert s1["loss"] < s0["loss"], (s0, s1)


def test_edgepart_tail_batch_loss_normalization(tmp_path):
    """w=0 padding rows landing on SOME shards only must not skew the
    loss: per-shard normalization + pmean under-reported it by ~n_dev
    before the psum'd global-weight-sum fix (spmd_weighted_loss)."""
    import jax.random as jr
    from shadow_gnn_tpu.train.pipeline import weighted_loss_fn

    tr = _tiny_trainer(tmp_path, batch_size=16)
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    w0 = np.asarray(w[0]).copy()
    w0[2:] = 0.0                      # valid rows only on shard 0
    step, shard_batch, replicate = ep.make_edgepart_train_step(tr, TRAIN, 8)
    xs = shard_batch((roots[0], rows[0], labels[0], w0))
    _, _, loss = step(replicate(tr.params), replicate(tr.opt_state),
                      jr.PRNGKey(0), *xs)
    arrays = tr._mode_arrays(TRAIN)
    batches, feats = tr._sample_branch_batches(
        TRAIN, roots[0], rows[0], jr.PRNGKey(0), arrays)
    logits, _ = tr.model.apply(tr.params, batches, feats, mode_train=True,
                               train=True,
                               rngs={"dropout": jr.PRNGKey(1),
                                     "dropedge": jr.PRNGKey(2)})
    want = float(weighted_loss_fn(tr.model_cfg, logits,
                                  jnp.asarray(labels[0]), jnp.asarray(w0)))
    assert np.isclose(float(loss), want, rtol=1e-4), (float(loss), want)

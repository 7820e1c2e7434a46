"""Edge-partitioned full graph across a device mesh.

The north-star configuration for papers100M-scale training
(BASELINE.json; SURVEY §2 parallelism accounting, §5.7): the full-graph
CSR itself — not just the node-feature table — is partitioned across
the mesh by contiguous row (node) ranges, so the 1.6B-edge papers100M
adjacency (~6.5 GB int32 indices) and the 57 GB feature table *both*
scale out with the slice instead of replicating per chip.

Every structure access becomes a boundary exchange expressed with XLA
collectives so it rides ICI:

* ``fetch_adj_rows``    — neighbor lists of arbitrary (remote) nodes:
  batch node ids are all-gathered, each device serves the CSR rows it
  owns, a psum_scatter returns each device its own batch's rows.  This
  replaces the random-access ``graph.indices`` gathers of the
  single-chip induction kernels (sampling/induction.py).
* ``fetch_degrees`` / ``fetch_at_offsets`` — the two-phase form used by
  the khop sampler (degree first, then uniform random offsets into the
  remote row), reproducing the C++ ``rand()%deg`` distribution
  (ParallelSampler.cpp:510-556) exactly across shards.
* ``fetch_edge_queries`` — point existence queries (u->v)?, answered by
  the owner of u via local binary search: the hub x hub tier of the
  degree-capped induction (see membership_matrix_hub).

Overlap of exchange with local aggregation: inside the train step the
feature exchange (all_gather + psum_scatter of [B, N, F] rows) is
issued *before* the induction compute and consumed *after* it, with no
dataflow between them — XLA's async collectives (ICI DMA) then run the
boundary-feature exchange while the MXU builds the dense adjacency
blocks (the one-hot einsums).  The adjacency-row fetch itself is
likewise issued before the candidate compaction that consumes it.

PPR / ppr_st branches never touch the remote CSR during sampling (the
scope comes from the precomputed top-k tables, which are row-sharded
over the same axis and pre-gathered per batch outside the shard_map
program), so the per-step exchange is exactly: one table-row gather
(GSPMD), one adjacency-row fetch over the scope, one hub-pair query
(when the hub tier is active), and one feature exchange — all O(batch),
independent of graph size.

Capability note vs the reference: the reference has NO multi-node path
at all (single process, shared-memory OpenMP — SURVEY §2 accounting);
this module is pure addition.
"""
from __future__ import annotations

from types import SimpleNamespace
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadow_gnn_tpu.sampling.batch import SamplerConfig, SubgraphBatch, sort_dedup
from shadow_gnn_tpu.sampling.induction import bfs_hops, drnl_labels
from shadow_gnn_tpu.sampling.samplers import (
    _dedup_with_scores,
    sample_nodes_iid,
    sample_nodes_ppr,
    sample_nodes_ppr_st,
)
from shadow_gnn_tpu.parallel.partition import (
    pad_rows_to_shards,
    sharded_feat_gather,
    spmd_eval_loss,
    spmd_train_update,
)


# ---------------------------------------------------------------------------
# host-side partitioning
# ---------------------------------------------------------------------------

class ShardedCSR(NamedTuple):
    """Row-range partitioned CSR, stacked on a leading shard axis.

    indptr  [S, N_local + 1]  per-shard indptr, rebased to 0
    indices [S, E_max]        per-shard neighbor ids, zero-padded
    n_local                   rows per shard (num_nodes padded up)
    search_steps              binary-search iterations covering max_deg
    """

    indptr: jax.Array
    indices: jax.Array
    n_local: int
    search_steps: int


def shard_csr(indptr: np.ndarray, indices: np.ndarray,
              n_shards: int) -> ShardedCSR:
    """Split a CSR into ``n_shards`` contiguous row ranges (host side).

    Padding rows (to a multiple of n_shards) have degree 0; per-shard
    index buffers are padded to the max shard edge count so the result
    stacks into rectangular arrays a mesh axis can shard.
    """
    n = indptr.size - 1
    nl = -(-n // n_shards)
    full = np.asarray(indptr)
    if nl * n_shards > n:
        full = np.concatenate(
            [full, np.full(nl * n_shards - n, full[-1], full.dtype)])
    lows = full[np.arange(n_shards) * nl]
    highs = full[(np.arange(n_shards) + 1) * nl]
    e_max = max(1, int((highs - lows).max()))
    ptr_sh = np.empty((n_shards, nl + 1), np.int32)
    idx_sh = np.zeros((n_shards, e_max), np.int32)
    for s in range(n_shards):
        ptr_sh[s] = (full[s * nl:(s + 1) * nl + 1] - lows[s]).astype(np.int32)
        idx_sh[s, : highs[s] - lows[s]] = indices[lows[s]:highs[s]]
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if n else 1
    steps = max(1, int(np.ceil(np.log2(max_deg + 1))) + 1)
    return ShardedCSR(jnp.asarray(ptr_sh), jnp.asarray(idx_sh), nl, steps)


def _squeeze_block(x: jax.Array) -> jax.Array:
    """Inside shard_map a P(axis, ...) operand arrives as [1, ...]."""
    return x[0]


# ---------------------------------------------------------------------------
# collective structure accesses (all called INSIDE shard_map)
# ---------------------------------------------------------------------------

def _owned(nodes_all: jax.Array, n_local: int, num_nodes: int,
           axis: str) -> Tuple[jax.Array, jax.Array]:
    """(local row ids clipped, ownership mask) for this device's range."""
    i = jax.lax.axis_index(axis)
    local = nodes_all - i * n_local
    own = (local >= 0) & (local < n_local) & (nodes_all < num_nodes)
    return jnp.clip(local, 0, n_local - 1), own


def fetch_degrees(indptr_local: jax.Array, nodes: jax.Array, n_local: int,
                  num_nodes: int, axis: str) -> jax.Array:
    """Degrees of arbitrary global node ids (sentinel/padding -> 0)."""
    nodes_all = jax.lax.all_gather(nodes, axis)
    lc, own = _owned(nodes_all, n_local, num_nodes, axis)
    deg = jnp.where(own, indptr_local[lc + 1] - indptr_local[lc], 0)
    return jax.lax.psum_scatter(deg, axis, scatter_dimension=0, tiled=False)


def fetch_adj_rows(csr_ptr: jax.Array, csr_idx: jax.Array, nodes: jax.Array,
                   deg_cap: int, n_local: int, num_nodes: int, axis: str
                   ) -> Tuple[jax.Array, jax.Array]:
    """First ``deg_cap`` neighbors + true degree of global node ids.

    nodes [..., ] int32 global ids (>= num_nodes = padding).
    Returns (nbrs [..., deg_cap] global ids with num_nodes padding,
    sorted ascending per row — CSR rows are sorted; deg [...] true
    degree).  Exactly one shard owns each id, so a sum-scatter of
    (id + 1) responses reconstructs the rows (0 = no contribution).
    """
    nodes_all = jax.lax.all_gather(nodes, axis)
    lc, own = _owned(nodes_all, n_local, num_nodes, axis)
    lo = jnp.where(own, csr_ptr[lc], 0)
    deg = jnp.where(own, csr_ptr[lc + 1] - csr_ptr[lc], 0)
    j = jnp.arange(deg_cap, dtype=lo.dtype)
    pos = lo[..., None] + j
    take = j < jnp.minimum(deg, deg_cap)[..., None]
    nb = csr_idx[jnp.clip(pos, 0, csr_idx.shape[0] - 1)]
    nb = jnp.where(take, nb + 1, 0)
    nbrs = jax.lax.psum_scatter(nb, axis, scatter_dimension=0, tiled=False)
    deg_out = jax.lax.psum_scatter(deg, axis, scatter_dimension=0,
                                   tiled=False)
    return jnp.where(nbrs > 0, nbrs - 1, num_nodes), deg_out


def fetch_at_offsets(csr_ptr: jax.Array, csr_idx: jax.Array,
                     nodes: jax.Array, offsets: jax.Array, n_local: int,
                     num_nodes: int, axis: str) -> jax.Array:
    """indices[indptr[node] + offset] for arbitrary (node, offset) pairs.

    nodes [...], offsets [..., M]; out-of-range offsets -> num_nodes.
    The khop sampler's remote row access: offsets are drawn mod the true
    degree (from :func:`fetch_degrees`) so the sampling distribution is
    identical to the single-chip / reference C++ path.
    """
    nodes_all = jax.lax.all_gather(nodes, axis)
    off_all = jax.lax.all_gather(offsets, axis)
    lc, own = _owned(nodes_all, n_local, num_nodes, axis)
    lo = jnp.where(own, csr_ptr[lc], 0)
    deg = jnp.where(own, csr_ptr[lc + 1] - csr_ptr[lc], 0)
    take = own[..., None] & (off_all >= 0) & (off_all < deg[..., None])
    pos = lo[..., None] + jnp.maximum(off_all, 0)
    nb = csr_idx[jnp.clip(pos, 0, csr_idx.shape[0] - 1)]
    nb = jnp.where(take, nb + 1, 0)
    out = jax.lax.psum_scatter(nb, axis, scatter_dimension=0, tiled=False)
    return jnp.where(out > 0, out - 1, num_nodes)


def fetch_edge_queries(csr_ptr: jax.Array, csr_idx: jax.Array,
                       uq: jax.Array, vq: jax.Array, n_local: int,
                       num_nodes: int, search_steps: int, axis: str
                       ) -> jax.Array:
    """Existence of directed edges (u -> v), owner-of-u answered.

    uq, vq [...] int32 global ids; returns bool [...].  The owner binary-
    searches v in u's local CSR row (``search_steps`` iterations cover
    the global max degree) — the remote analog of the hub x hub tier of
    membership_matrix_hub (sampling/induction.py).
    """
    u_all = jax.lax.all_gather(uq, axis)
    v_all = jax.lax.all_gather(vq, axis)
    lc, own = _owned(u_all, n_local, num_nodes, axis)
    lo = jnp.where(own, csr_ptr[lc], 0)
    hi = jnp.where(own, csr_ptr[lc + 1], 0)
    hi_end = hi

    def step(_, carry):
        lo2, hi2 = carry
        mid = (lo2 + hi2) // 2
        val = csr_idx[jnp.clip(mid, 0, csr_idx.shape[0] - 1)]
        ge = val >= v_all
        return jnp.where(ge, lo2, mid + 1), jnp.where(ge, mid, hi2)

    lo, hi = jax.lax.fori_loop(0, search_steps, step, (lo, hi))
    found = own & (lo < hi_end) & (
        csr_idx[jnp.clip(lo, 0, csr_idx.shape[0] - 1)] == v_all)
    hit = jax.lax.psum_scatter(found.astype(jnp.int32), axis,
                               scatter_dimension=0, tiled=False)
    return hit > 0


# ---------------------------------------------------------------------------
# local induction from fetched rows
# ---------------------------------------------------------------------------

def rows_to_adj(nodes: jax.Array, nbrs: jax.Array, deg: jax.Array,
                cand_cap: int, deg_cap: int, num_nodes: int
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense [B, N, N] adjacency blocks from fetched neighbor rows.

    nodes [B, N] sorted global ids (num_nodes = padding); nbrs
    [B, N, D] fetched rows (D = fetch cap); deg [B, N] true degrees.
    Members with deg > deg_cap are hubs: their truncated rows are
    ignored and their edges come from the small side's rows (mirrored —
    undirected graphs) plus the hub x hub query tier the caller runs.

    Same candidate-compaction + one-hot-matmul design as
    membership_matrix_cand (work ~ sum of capped degrees, MXU
    densification, no TPU scatters).  Returns (adj [B,N,N] f32 without
    mirroring applied yet is_hub [B,N] bool, overflow [] int32).
    """
    b, n = nodes.shape
    d = nbrs.shape[-1]
    row_valid = nodes < num_nodes
    is_hub = (deg > deg_cap) & row_valid
    dgc = jnp.where(row_valid & ~is_hub, jnp.minimum(deg, d), 0)
    csum = jnp.cumsum(dgc, axis=-1)
    total = csum[:, -1]
    overflow = jnp.maximum(total - cand_cap, 0).sum().astype(jnp.int32)

    e = jnp.arange(cand_cap, dtype=csum.dtype)[None, :]
    owner = jax.vmap(lambda c, q: jnp.searchsorted(
        c, q, side="right", method="compare_all"))(
        csum, jnp.broadcast_to(e, (b, cand_cap)))
    owner_c = jnp.minimum(owner, n - 1)
    start = jnp.where(owner_c > 0,
                      jnp.take_along_axis(csum, jnp.maximum(owner_c - 1, 0),
                                          axis=-1), 0)
    within = e - start
    valid = e < total[:, None]
    flat = nbrs.reshape(b, n * d)
    pos = owner_c * d + jnp.minimum(within, d - 1)
    nbr_e = jnp.take_along_axis(flat, pos, axis=-1)
    loc = jax.vmap(lambda t, q: jnp.searchsorted(
        t, q, method="compare_all"))(nodes, nbr_e)
    loc_c = jnp.minimum(loc, n - 1)
    hit = valid & (jnp.take_along_axis(nodes, loc_c, axis=-1) == nbr_e)
    ar = jnp.arange(n, dtype=owner_c.dtype)
    uoh = (owner_c[:, :, None] == ar).astype(jnp.bfloat16)
    voh = (jnp.where(hit, loc_c, n)[:, :, None] == ar).astype(jnp.bfloat16)
    adj = jnp.einsum("bei,bej->bij", uoh, voh,
                     preferred_element_type=jnp.float32) > 0
    adj = adj & row_valid[:, :, None]
    return adj, is_hub, overflow


def induce_edgepart(csr: Tuple[jax.Array, jax.Array], nodes: jax.Array,
                    ppr_vals: jax.Array, roots: jax.Array,
                    cfg: SamplerConfig, n_local: int, num_nodes: int,
                    search_steps: int, fetch_cap: int, axis: str
                    ) -> SubgraphBatch:
    """Distributed node-induced subgraph extraction.

    The edge-partitioned analog of induction.induce: neighbor rows
    arrive via one collective fetch, hub x hub pairs via one query
    collective; everything else (compaction, one-hot densification,
    self-edges, target-edge removal, hop/DRNL annotations) is local.
    Semantics match the single-chip 'hub' strategy (undirected graphs;
    with fetch_cap >= max_deg and hub_slots = 0 it is exact 'cand').
    """
    csr_ptr, csr_idx = csr
    n_id = num_nodes
    node_mask = nodes < n_id
    size = node_mask.sum(-1).astype(jnp.int32)
    b, n = nodes.shape

    nbrs, deg = fetch_adj_rows(csr_ptr, csr_idx, nodes, fetch_cap,
                               n_local, n_id, axis)
    cand_cap = cfg.cand_cap if cfg.cand_cap > 0 else n * fetch_cap
    adj, is_hub, overflow = rows_to_adj(nodes, nbrs, deg, cand_cap,
                                        fetch_cap, n_id)
    # undirected mirror: small->hub edges were only found from the small
    # side (hub rows are truncated at the fetch cap)
    adj = adj | jnp.swapaxes(adj, -1, -2)

    h = cfg.hub_slots
    if h > 0:
        deg_eff = jnp.where(is_hub, deg, -1)
        order = jnp.argsort(-deg_eff, axis=-1)[:, :h]
        hub_valid = jnp.take_along_axis(is_hub, order, axis=-1)
        n_hubs = is_hub.sum(-1)
        overflow = overflow + jnp.maximum(
            n_hubs - h, 0).sum().astype(jnp.int32)
        hnodes = jnp.where(hub_valid, jnp.take_along_axis(nodes, order, -1),
                           n_id)
        uq = jnp.broadcast_to(hnodes[:, :, None], (b, h, h))
        vq = jnp.broadcast_to(hnodes[:, None, :], (b, h, h))
        exists = fetch_edge_queries(csr_ptr, csr_idx, uq, vq, n_local,
                                    n_id, search_steps, axis)
        s = exists & hub_valid[:, :, None] & hub_valid[:, None, :]
        ar = jnp.arange(n, dtype=order.dtype)
        poh = ((order[:, :, None] == ar)
               & hub_valid[..., None]).astype(jnp.bfloat16)      # [B,H,N]
        tmp = jnp.einsum("bhg,bgj->bhj", s.astype(jnp.bfloat16), poh,
                         preferred_element_type=jnp.float32)
        adj_h = jnp.einsum("bhi,bhj->bij", poh, tmp,
                           preferred_element_type=jnp.float32) > 0
        adj = adj | adj_h

    adj = adj.astype(jnp.float32) * node_mask[:, :, None]

    targets = jax.vmap(lambda t, q: jnp.searchsorted(
        t, q, method="compare_all"))(nodes, roots).astype(jnp.int32)

    if cfg.num_targets > 1 and not cfg.include_target_conn:
        t_oh = jax.nn.one_hot(targets, n, dtype=jnp.float32)
        t_any = t_oh.sum(1)
        adj = adj * (1.0 - t_any[:, :, None] * t_any[:, None, :])

    if cfg.add_self_edge:
        eye = jnp.eye(n, dtype=jnp.float32)
        adj = jnp.maximum(adj, eye[None] * node_mask[:, None, :]
                          * node_mask[:, :, None])

    hop = jnp.full(nodes.shape, -1, jnp.int32)
    drnl = jnp.zeros(nodes.shape, jnp.int32)
    if "hops" in cfg.aug_feats:
        hop = bfs_hops(adj, targets[:, 0], node_mask)
    if "drnls" in cfg.aug_feats:
        drnl = drnl_labels(adj, targets, node_mask)

    return SubgraphBatch(nodes=nodes, node_mask=node_mask, adj=adj,
                         targets=targets, size=size, hop=hop, ppr=ppr_vals,
                         drnl=drnl, overflow=overflow)


def sample_nodes_khop_edgepart(cfg: SamplerConfig,
                               csr: Tuple[jax.Array, jax.Array],
                               roots: jax.Array, rng: jax.Array,
                               n_local: int, num_nodes: int, axis: str
                               ) -> Tuple[jax.Array, jax.Array]:
    """Budgeted k-hop scope over the sharded CSR (two-phase fetch).

    Distribution-identical to samplers.sample_nodes_khop: degrees come
    from one collective, the rand()%deg offsets are drawn locally, and
    a second collective gathers exactly those neighbor slots.
    """
    sent = num_nodes
    csr_ptr, csr_idx = csr
    b, t = roots.shape
    budget = cfg.budget
    levels = [roots]
    cur = roots
    for _ in range(cfg.depth):
        rng, sub = jax.random.split(rng)
        deg = fetch_degrees(csr_ptr, cur, n_local, sent, axis)
        r = jax.random.randint(sub, cur.shape + (budget,), 0, 1 << 30)
        j = jnp.arange(budget)[None, None, :]
        off = jnp.where(deg[..., None] <= budget, j,
                        r % jnp.maximum(deg[..., None], 1))
        off = jnp.where(off < deg[..., None], off, -1)
        nxt = fetch_at_offsets(csr_ptr, csr_idx, cur, off, n_local, sent,
                               axis).reshape(b, -1)
        nxt = sort_dedup(nxt, sent)
        levels.append(nxt)
        cur = nxt
    ids = jnp.concatenate(levels, axis=-1)
    sc = jnp.zeros_like(ids, dtype=jnp.float32)
    return _dedup_with_scores(ids, sc, sent, cfg.n_pad)


# ---------------------------------------------------------------------------
# distributed full-graph SpMM (ring-overlapped)
# ---------------------------------------------------------------------------

def bucket_edges(src: np.ndarray, dst: np.ndarray, val: np.ndarray,
                 num_rows: int, n_shards: int):
    """Partition an edge list for the ring SpMM (host side).

    Edges go to the shard owning their src row; within a shard they are
    bucketed by the shard owning their dst column.  Bucket (i, q) is
    processed at ring step s = (q - i) mod S, when shard i holds x-chunk
    q — so each edge is touched exactly once and per-step compute is
    ~E/S² per device.  Returns (srcb, dstb, valb [S, S, E_b], n_local)
    with src rebased to the shard, dst rebased to the chunk, zero-valued
    padding.
    """
    nl = -(-num_rows // n_shards)
    own = src // nl
    buck = dst // nl
    gid = own * n_shards + buck                       # group per edge
    order = np.argsort(gid, kind="stable")
    gid_s = gid[order]
    n_groups = n_shards * n_shards
    counts = np.bincount(gid_s, minlength=n_groups)
    e_b = max(1, int(counts.max()))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(gid_s.size) - starts[gid_s]    # rank inside group
    flat_pos = gid_s * e_b + within
    srcb = np.zeros((n_groups * e_b,), np.int32)
    dstb = np.zeros((n_groups * e_b,), np.int32)
    valb = np.zeros((n_groups * e_b,), np.float32)
    srcb[flat_pos] = (src[order] - own[order] * nl).astype(np.int32)
    dstb[flat_pos] = (dst[order] - buck[order] * nl).astype(np.int32)
    valb[flat_pos] = val[order]
    shape = (n_shards, n_shards, e_b)
    return (srcb.reshape(shape), dstb.reshape(shape), valb.reshape(shape),
            nl)


def ring_spmm(x_local: jax.Array, srcb: jax.Array, dstb: jax.Array,
              valb: jax.Array, axis: str) -> jax.Array:
    """Y = A @ X with A edge-partitioned and X row-sharded (in shard_map).

    x_local [n_local, F] — this device's X rows; srcb/dstb/valb
    [S, E_b] — this device's edge buckets by dst shard (bucket_edges).
    The X shards rotate around the ring with ppermute while each device
    segment-sums the bucket matching the chunk it currently holds: the
    chunk transfer has no dataflow into the current step's compute, so
    XLA overlaps the ICI permute with the local aggregation — the
    distributed-SpMM form of "boundary features over ICI overlapped
    with local aggregation" used by smoothening preprocessing, label
    propagation, and Correct&Smooth at papers100M scale.
    """
    s_dev = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    nl = x_local.shape[0]
    perm = [(j, (j - 1) % s_dev) for j in range(s_dev)]

    def body(carry, s):
        y, chunk = carry
        q = jax.lax.rem(i + s, s_dev)
        sl = jnp.take(srcb, q, axis=0)
        dl = jnp.take(dstb, q, axis=0)
        vl = jnp.take(valb, q, axis=0)
        contrib = vl[:, None] * chunk[jnp.clip(dl, 0, nl - 1)]
        y = y + jax.ops.segment_sum(contrib, sl, num_segments=nl)
        chunk = jax.lax.ppermute(chunk, axis, perm)
        return (y, chunk), None

    y0 = jnp.zeros_like(x_local)
    (y, _), _ = jax.lax.scan(
        body, (y0, x_local), jnp.arange(s_dev, dtype=jnp.int32))
    return y


def make_ring_spmm(src: np.ndarray, dst: np.ndarray, val: np.ndarray,
                   num_rows: int, n_devices: int, axis: str = "dp"):
    """Build a jitted distributed Y = A @ X over an n-device mesh.

    Returns ``fn(x) -> y`` taking/returning [num_rows, F] (host or
    device); internally rows are padded to the mesh and sharded
    P(axis); semantics match ops.spmm.spmm_edges exactly
    (Y[src] += val * X[dst]).
    """
    assert len(jax.devices()) >= n_devices, (
        f"ring SpMM over {n_devices} shards needs {n_devices} devices, "
        f"have {len(jax.devices())}")
    devs = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devs, (axis,))
    rshard = NamedSharding(mesh, P(axis, None))
    srcb, dstb, valb, nl = bucket_edges(src, dst, val, num_rows, n_devices)
    bufs = tuple(jax.device_put(jnp.asarray(b), rshard)
                 for b in (srcb, dstb, valb))

    inner = jax.jit(jax.shard_map(
        lambda x, sb, db, vb: ring_spmm(x, sb[0], db[0], vb[0], axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None)),
        out_specs=P(axis, None), check_vma=False))

    n_pad = nl * n_devices

    def fn(x):
        x = jnp.asarray(x)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
        x = jax.device_put(x, rshard)
        return inner(x, *bufs)[:num_rows]

    return fn


def distributed_outcome_correlation(indptr, indices, y0: np.ndarray,
                                    n_prop: int = 50, alpha: float = 0.8,
                                    use_norm: bool = False,
                                    clamp=(0.0, 1.0), n_devices: int = 8,
                                    axis: str = "dp") -> np.ndarray:
    """Correct&Smooth outcome correlation as a distributed SpMM scan.

    Same semantics as postproc.cns.general_outcome_correlation (DGL
    mean over in-edges with reverse+self edges), but the propagation
    matrix is edge-partitioned and Y is row-sharded: the whole n_prop
    scan runs inside one shard_map program with the ring exchange
    overlapped per step; only elementwise work touches each shard
    between rings.
    """
    from shadow_gnn_tpu.postproc.cns import _cs_edges

    n = indptr.size - 1
    src, dst = _cs_edges(indptr, indices)
    in_deg = np.zeros(n, np.float32)
    np.add.at(in_deg, dst, 1.0)
    in_deg = np.clip(in_deg, 1.0, None)
    # rows = dst (aggregation target), gather src
    w = (1.0 / in_deg[dst]).astype(np.float32)
    srcb, dstb, valb, nl = bucket_edges(dst.astype(np.int64),
                                        src.astype(np.int64), w, n,
                                        n_devices)
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    devs = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devs, (axis,))
    rshard = NamedSharding(mesh, P(axis, None))
    bufs = tuple(jax.device_put(jnp.asarray(b), rshard)
                 for b in (srcb, dstb, valb))
    n_pad = nl * n_devices
    deg_pad = np.ones(n_pad, np.float32)
    deg_pad[:n] = in_deg
    deg_sh = jax.device_put(jnp.asarray(deg_pad), NamedSharding(mesh,
                                                                P(axis)))
    y0p = np.zeros((n_pad, y0.shape[1]), np.float32)
    y0p[:n] = y0
    y0_sh = jax.device_put(jnp.asarray(y0p), rshard)

    def run(y0j, deg_j, sb, db, vb):
        sb, db, vb = sb[0], db[0], vb[0]

        def body(y, _):
            if use_norm:
                y = y * jax.lax.rsqrt(deg_j)[:, None]
            y = ring_spmm(y, sb, db, vb, axis)
            if use_norm:
                y = y * jnp.sqrt(deg_j)[:, None]
            y = alpha * y + (1 - alpha) * y0j
            if clamp is not None:
                y = jnp.clip(y, clamp[0], clamp[1])
            return y, None

        y, _ = jax.lax.scan(body, y0j, None, length=n_prop)
        return y

    out = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None), check_vma=False))(y0_sh, deg_sh, *bufs)
    return np.asarray(out)[:n]


# ---------------------------------------------------------------------------
# full training step (graph + features + tables all partitioned)
# ---------------------------------------------------------------------------

def make_edgepart_train_step(trainer, mode: int, n_devices: int,
                             axis: str = "dp",
                             fetch_cap: Optional[int] = None,
                             return_logits: bool = False,
                             mesh: Optional[Mesh] = None,
                             train: bool = True,
                             epoch_scan: bool = False):
    """DP training step with the graph CSR, the feature table, and the
    PPR tables ALL row-sharded over the mesh — nothing graph-sized is
    replicated.  Per-batch boundary exchanges: table-row gather (GSPMD,
    outside shard_map), adjacency-row fetch, hub-pair queries, feature
    rows; gradients pmean-reduced.

    The feature exchange is issued before the induction compute with no
    dataflow between them, so XLA overlaps the collective with the
    one-hot densification einsums (the "boundary features over ICI
    overlapped with local aggregation" of the north-star design).

    Returns (step_fn, shard_batch, replicate).  With ``train=False``
    the step is an EVAL pass — ``step(params, rng, roots, rows,
    labels, w) -> (loss, logits)`` with no optimizer state — so
    beyond-single-chip graphs never need a single-device eval program.
    """

    from shadow_gnn_tpu.parallel.partition import put_global

    if mesh is None:
        assert len(jax.devices()) >= n_devices, (
            f"edge-partitioned step over {n_devices} shards needs "
            f"{n_devices} devices, have {len(jax.devices())}")
        devs = np.array(jax.devices()[:n_devices])
        mesh = Mesh(devs, (axis,))
    assert mesh.devices.size == n_devices, (
        "mesh size must equal the shard count: the [S, ...] stacked "
        "shards map one-to-one onto mesh devices")
    repl = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P(axis))
    rshard = NamedSharding(mesh, P(axis, None))

    trainer._ensure_tables(mode)
    if not getattr(trainer, "undirected", True):
        # induce_edgepart symmetrizes small->hub edges found from one
        # side only, which assumes every edge has a reverse
        raise ValueError("the edge-partitioned path requires an "
                         "undirected graph (like the 'hub' induction)")
    g = trainer.graph[mode]
    num_nodes = trainer.num_nodes
    csr = shard_csr(np.asarray(g.indptr), np.asarray(g.indices), n_devices)
    csr_dev = (put_global(mesh, csr.indptr, P(axis, None)),
               put_global(mesh, csr.indices, P(axis, None)))

    tab = pad_rows_to_shards(trainer.feat_np, n_devices)
    fdt = (jnp.bfloat16
           if getattr(trainer, "feat_dtype", "float32") == "bfloat16"
           else None)
    feat_sharded = put_global(mesh, jnp.asarray(tab, dtype=fdt),
                              P(axis, None))

    cfgs = tuple(br["cfg"][mode] for br in trainer.branches)
    caps = []
    for cfg in cfgs:
        fc = fetch_cap
        if fc is None:
            fc = cfg.deg_cap if (cfg.induction in ("hub", "rows")
                                 and cfg.deg_cap > 0) else g.max_deg
        caps.append(max(1, min(fc, g.max_deg)))
    caps = tuple(caps)
    # PPR tables row-sharded over the mesh (papers100M: T x k ids+scores
    # is itself multi-GB); per-batch rows come through the same explicit
    # all-gather/psum_scatter collective as the feature rows
    tabs_sharded = []
    for i, t in enumerate(trainer.tables[mode]):
        if t is None or cfgs[i].method not in ("ppr", "ppr_st"):
            z = np.zeros((n_devices, 1), np.int32)
            tabs_sharded.append(
                (put_global(mesh, jnp.asarray(z), P(axis, None)),
                 put_global(mesh, jnp.asarray(z, jnp.float32),
                            P(axis, None))))
        else:
            tabs_sharded.append((
                put_global(mesh, jnp.asarray(pad_rows_to_shards(
                    np.asarray(t.neighs), n_devices)), P(axis, None)),
                put_global(mesh, jnp.asarray(pad_rows_to_shards(
                    np.asarray(t.scores), n_devices)), P(axis, None))))
    tabs_sharded = tuple(tabs_sharded)
    n_table_rows = tuple(
        (np.asarray(t.neighs).shape[0] if t is not None else 1)
        for t in trainer.tables[mode])
    cfg_m, model, opt = trainer.model_cfg, trainer.model, trainer.opt
    sgraph = SimpleNamespace(num_nodes=num_nodes)

    def _sample_all(r_samp, roots, rows, tabs_local, feat_loc, csr_loc):
        batches, feats = [], []
        for i, cfg in enumerate(cfgs):
            r_samp, sub = jax.random.split(r_samp)
            if cfg.method in ("ppr", "ppr_st"):
                # table-row boundary exchange (ids + scores ride the
                # same collective pattern as the feature rows)
                tn, ts = tabs_local[i]
                rq = jnp.minimum(rows, n_table_rows[i] - 1)
                nb = sharded_feat_gather(tn, rq, axis)
                sc_rows = sharded_feat_gather(ts, rq, axis)
                slices = (nb, sc_rows)
                if cfg.method == "ppr":
                    nodes, sc = sample_nodes_ppr(cfg, sgraph, roots, None,
                                                 None, table_slices=slices)
                else:
                    nodes, sc = sample_nodes_ppr_st(cfg, sgraph, roots,
                                                    None, None, sub,
                                                    table_slices=slices)
            elif cfg.method == "nodeIID":
                nodes, sc = sample_nodes_iid(cfg, sgraph, roots)
            elif cfg.method == "khop":
                nodes, sc = sample_nodes_khop_edgepart(
                    cfg, csr_loc, roots, sub, csr.n_local, num_nodes, axis)
            else:
                raise ValueError(
                    f"edge-partitioned path: unsupported sampler "
                    f"{cfg.method}")
            # feature exchange FIRST: no dataflow into the induction
            # below, so the collective overlaps the densification einsums
            # (masking/upcast is left to the model, nn/model.py)
            feat = sharded_feat_gather(
                feat_loc, jnp.minimum(nodes, num_nodes - 1), axis)
            batch = induce_edgepart(csr_loc, nodes, sc, roots, cfg,
                                    csr.n_local, num_nodes,
                                    csr.search_steps, caps[i], axis)
            batches.append(batch)
            feats.append(feat)
        return batches, feats

    # multi-process: the driver's metric pass needs GLOBAL logits on
    # every host — all-gather the [b, C] block in-program
    multi = jax.process_count() > 1

    def _inner(params, opt_state, rng, roots, rows, labels, w, tabs_local,
               feat_local, csr_ptr_blk, csr_idx_blk):
        csr_loc = (_squeeze_block(csr_ptr_blk), _squeeze_block(csr_idx_blk))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
        batches, feats = _sample_all(r_samp, roots, rows, tabs_local,
                                     feat_local, csr_loc)
        params, opt_state, loss, logits, ovf = spmd_train_update(
            model, opt, cfg_m, axis, params, opt_state, batches, feats,
            labels, w, r_do, r_de)
        if return_logits:
            if multi:
                logits = jax.lax.all_gather(logits, axis, axis=0,
                                            tiled=True)
            return params, opt_state, loss, logits, ovf
        return params, opt_state, loss

    def _inner_epoch(params, opt_state, rng, roots, rows, labels, w,
                     tabs_local, feat_local, csr_ptr_blk, csr_idx_blk):
        """Whole-epoch scan over batches inside ONE program: a single
        dispatch per epoch (per-batch dispatches cost ~7ms each through
        the remote-TPU tunnel — the same consideration that keeps the
        single-device TRAIN path a monolithic lax.scan)."""
        csr_loc = (_squeeze_block(csr_ptr_blk), _squeeze_block(csr_idx_blk))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def body(carry, xs):
            params, opt_state, rng = carry
            roots_b, rows_b, labels_b, w_b = xs
            rng, r_samp, r_do, r_de = jax.random.split(rng, 4)
            batches, feats = _sample_all(r_samp, roots_b, rows_b,
                                         tabs_local, feat_local, csr_loc)
            params, opt_state, loss, logits, ovf = spmd_train_update(
                model, opt, cfg_m, axis, params, opt_state, batches,
                feats, labels_b, w_b, r_do, r_de)
            if multi:
                # every host's metric pass needs GLOBAL logits; the
                # gather rides the same collective path as the
                # per-batch step's
                logits = jax.lax.all_gather(logits, axis, axis=0,
                                            tiled=True)
            return (params, opt_state, rng), (loss, logits, ovf)

        (params, opt_state, _), (losses, logits, ovfs) = jax.lax.scan(
            body, (params, opt_state, rng), (roots, rows, labels, w))
        return params, opt_state, losses, logits, ovfs.sum()

    def _inner_eval(params, rng, roots, rows, labels, w, tabs_local,
                    feat_local, csr_ptr_blk, csr_idx_blk):
        csr_loc = (_squeeze_block(csr_ptr_blk), _squeeze_block(csr_idx_blk))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng, r_samp = jax.random.split(rng)
        batches, feats = _sample_all(r_samp, roots, rows, tabs_local,
                                     feat_local, csr_loc)
        # label zeroing follows the MODE, dropout the train/eval status
        # (reference models.py:182-183 semantics, as on the single-
        # program eval path)
        from shadow_gnn_tpu import TRAIN as _TRAIN
        loss, logits, ovf = spmd_eval_loss(model, cfg_m, axis, params,
                                           batches, feats, labels, w,
                                           mode == _TRAIN)
        if multi:
            logits = jax.lax.all_gather(logits, axis, axis=0, tiled=True)
        return loss, logits, ovf

    n_slice = len(cfgs)
    tab_specs = tuple((P(axis, None), P(axis, None))
                      for _ in range(n_slice))
    state_specs = (tab_specs, P(axis, None), P(axis, None), P(axis, None))

    # global arrays must enter the program as ARGUMENTS: closure capture
    # bakes them in as constants, which is illegal for arrays spanning
    # non-addressable devices (multi-process) and serializes them into
    # the program on the tunnel backend
    if train and epoch_scan:
        jit_epoch = jax.jit(jax.shard_map(
            _inner_epoch, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, axis), P(None, axis),
                      P(None, axis), P(None, axis)) + state_specs,
            out_specs=(P(), P(), P(),
                       P() if multi else P(None, axis), P()),
            check_vma=False,
        ))

        def step(params, opt_state, rng, roots, rows, labels, w):
            return jit_epoch(params, opt_state, rng, roots, rows, labels,
                             w, tabs_sharded, feat_sharded, *csr_dev)
    elif train:
        logits_spec = P() if multi else P(axis)
        out_specs = ((P(), P(), P(), logits_spec, P()) if return_logits
                     else (P(), P(), P()))
        jit_inner = jax.jit(jax.shard_map(
            _inner, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis))
            + state_specs,
            out_specs=out_specs,
            check_vma=False,
        ))

        def step(params, opt_state, rng, roots, rows, labels, w):
            return jit_inner(params, opt_state, rng, roots, rows, labels,
                             w, tabs_sharded, feat_sharded, *csr_dev)
    else:
        jit_eval = jax.jit(jax.shard_map(
            _inner_eval, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis))
            + state_specs,
            out_specs=(P(), P() if multi else P(axis), P()),
            check_vma=False,
        ))

        def step(params, rng, roots, rows, labels, w):
            return jit_eval(params, rng, roots, rows, labels, w,
                            tabs_sharded, feat_sharded, *csr_dev)

    def shard_batch(xs):
        if train and epoch_scan:
            # whole-epoch arrays [nb, B, ...]: batch dim is SECOND.
            # Multi-process: each host feeds its process_slice of the
            # batch columns and the global epoch array is assembled
            # from the per-process shards — N hosts, ONE dispatch per
            # epoch.
            if jax.process_count() > 1:
                from shadow_gnn_tpu.parallel import multihost as mh
                return tuple(
                    mh.process_local_epoch(mesh, np.asarray(x), axis)
                    for x in xs)
            esh = NamedSharding(mesh, P(None, axis))
            return tuple(jax.device_put(x, esh) for x in xs)
        if jax.process_count() > 1:
            from shadow_gnn_tpu.parallel import multihost as mh
            return tuple(mh.process_local_batch(mesh, np.asarray(x), axis)
                         for x in xs)
        return tuple(jax.device_put(x, bshard) for x in xs)

    def replicate(tree):
        return put_global(mesh, tree, P())

    return step, shard_batch, replicate

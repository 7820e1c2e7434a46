"""Device-side node-induced subgraph extraction.

Replaces the hottest loop of the reference's C++ engine
(``_node_induced_subgraph``, ``ParallelSampler.cpp:350-453``): given the
sampled node set of each subgraph, build the induced adjacency.  The
reference renumbers ids through a hash map per subgraph on one CPU
thread; here the whole batch is one static-shape jitted program:

* membership test = vectorized binary search of every (row-node,
  col-node) pair directly into the HBM-resident CSR ``indices`` array —
  exact for any degree distribution, no caps, O(B·N²·log(max_deg));
* local renumbering is implicit: nodes are kept sorted, so the j-th
  column *is* local id j (the C++ also sorts, cpp:362);
* self-edge insertion and target-target edge removal reproduce
  cpp:386-424 semantics on the dense block;
* hop/DRNL annotations (cpp:433-451, Graph.cpp:32-73) become batched
  dense-matvec BFS.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from shadow_gnn_tpu.data.graph import DeviceGraph
from shadow_gnn_tpu.sampling.batch import SamplerConfig, SubgraphBatch

# HBM budget for the rows-induction block gather ([B, N, R, 32] int32,
# lane-padded 4x by the TPU layout -> R*512 B per member with
# R = (deg_cap-1)//32 + 2).  Sizing choices whose gather would exceed
# this (at the larger of the train batch / the cache-build chunk) are
# rejected: an unguarded deg_cap = scope_max on a power-law graph is a
# 20 GB allocation at the products shape.
ROWS_GATHER_BUDGET = 2 * 1024**3


def rows_gather_bytes(batch: int, n_pad: int, deg_cap: int,
                      row_block: int = 32) -> int:
    """HBM footprint of :func:`membership_matrix_rows`' block gather
    (the ``nbr = blk[rows_idx]`` below, lane padding included: every
    gathered row occupies a full 128-lane tile = 512 B regardless of
    the block width, which is why 128-wide blocks need ~4x fewer rows
    for the same deg_cap)."""
    r_blocks = (deg_cap - 1) // row_block + 2
    return batch * n_pad * r_blocks * 512


def bucket_cap(n: int) -> int:
    """Round an induction capacity up to a shared bucket (~12% geometric
    steps, multiples of 64).

    VALID and TEST compute slightly different exact candidate caps from
    their scope degrees; bucketing them usually lands both on the same
    value so they share ONE compiled eval program (caps are static
    buffer sizes, so any difference means a recompile)."""
    if n <= 64:
        return 64
    b = 64
    while b < n:
        b = -(-(b * 9 // 8) // 64) * 64
    return b


def plan_ppr_induction(scope_deg, root_deg, *, n_pad: int, num_targets: int,
                       batch_size: int, undirected: bool,
                       row_block: int = 32) -> dict:
    """Exact induction sizing for a deterministic (table-backed) scope.

    Scopes are subsets of the PPR table rows, so per-root candidate
    totals and hub counts are computable host-side; on hub-heavy graphs
    the degree-capped ``rows``+hub strategy bounds the gather buffer
    (the round-1 cand_cap blowup: one 1e5-degree table entry used to
    inflate cand_cap for every batch).  ``scope_deg`` is the [T, k]
    degree table of scope members (0 at padding), ``root_deg`` the [T]
    root degrees.  Returns the SamplerConfig field overrides
    (``induction`` / ``deg_cap`` / ``hub_slots`` / ``cand_cap``).

    Shared by the training pipeline (``Trainer._ensure_tables``) and the
    papers100M 1:1-scale harness so both size the device programs with
    the same cost model.
    """
    import numpy as np

    scope_max = int(max(scope_deg.max() if scope_deg.size else 1,
                        root_deg.max() if root_deg.size else 1, 1))
    choices = sorted({d for d in (64, 128, 256, 512, 1024, 2048)
                      if d < scope_max} | {scope_max})
    gbatch = max(batch_size, 256)
    choices = [d for d in choices
               if rows_gather_bytes(gbatch, n_pad, d, row_block)
               <= ROWS_GATHER_BUDGET] or [choices[0]]
    best = None
    for dc in choices:
        h_rows = (scope_deg > dc).sum(1) + (root_deg > dc)
        h_max = int(h_rows.max())
        # cost model (per subgraph, ns-ish units): the fused row compare
        # is n_pad^2 x deg_cap VPU compares (~2.4e12/s); the block
        # gather streams R*512 bytes/member at ~819 GB/s; each hub pair
        # costs a ~24-step binary search of ~100ns element gathers
        cost = n_pad * n_pad * dc / 2400 \
            + rows_gather_bytes(1, n_pad, dc, row_block) / 819 \
            + 2400 * (h_max * num_targets) ** 2
        if best is None or cost < best[0]:
            best = (cost, dc, h_max)
    _, dc, h_max = best
    if h_max > 0 and not undirected and scope_max > 4096:
        # DIRECTED hub-heavy scope: no hub tier possible — candidate
        # enumeration, exact-sized (no shipped dataset hits this; all
        # are undirected)
        e_rows = scope_deg.sum(1) + root_deg
        cap = int(e_rows.max()) * num_targets
        return dict(induction="cand", cand_cap=bucket_cap(cap + 8))
    if h_max > 0 and undirected:
        return dict(induction="rows", deg_cap=bucket_cap(dc),
                    hub_slots=min(h_max * num_targets + 2, n_pad))
    # exact row width: covers every scope member's degree
    return dict(induction="rows", deg_cap=bucket_cap(scope_max),
                hub_slots=0)


def membership_matrix(graph: DeviceGraph, nodes: jax.Array) -> jax.Array:
    """adj[b, i, j] = 1.0 iff edge (nodes[b,i] -> nodes[b,j]) in graph.

    ``nodes`` is [B, N] sorted ascending with padding = num_nodes.
    Binary search (lower_bound) of each column id in each row's CSR
    neighbor slice; ``graph.search_steps`` iterations guarantee
    convergence for the graph's max degree.
    """
    n_id = graph.num_nodes
    u = jnp.minimum(nodes, n_id - 1)                     # safe row ids
    row_valid = nodes < n_id
    lo0 = graph.indptr[u]                                # [B, N]
    hi0 = graph.indptr[u + 1]
    lo0 = jnp.where(row_valid, lo0, 0)
    hi0 = jnp.where(row_valid, hi0, 0)

    q = nodes[:, None, :]                                # [B, 1, N] col ids
    lo = jnp.broadcast_to(lo0[:, :, None], lo0.shape + (nodes.shape[1],))
    hi = jnp.broadcast_to(hi0[:, :, None], lo.shape)
    hi_end = hi

    def step(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = graph.indices[jnp.clip(mid, 0, graph.num_edges - 1)]
        ge = v >= q
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, graph.search_steps, step, (lo, hi))
    pos = lo
    found = (pos < hi_end) & (
        graph.indices[jnp.clip(pos, 0, graph.num_edges - 1)] == q
    )
    col_valid = (q < n_id)
    return (found & col_valid & row_valid[:, :, None]).astype(jnp.float32)


def membership_matrix_cand(graph: DeviceGraph, nodes: jax.Array,
                           cand_cap: int) -> tuple:
    """Candidate-edge induction: adj via one gather per graph edge
    incident to a subgraph node (work proportional to sum-of-degrees,
    like the reference's per-thread hash loop cpp:378-427, instead of
    the O(N^2 log deg) pairwise search of :func:`membership_matrix`).

    For each subgraph, every out-edge of every member node is a
    candidate; its endpoint is located in the sorted node table by a
    VMEM-resident binary search, hits are scattered into the dense
    block.  ``cand_cap`` statically bounds candidates per subgraph;
    candidates beyond the cap are dropped and counted in the returned
    ``overflow`` (callers size the cap exactly for deterministic
    samplers, or generously + monitor for stochastic ones).

    Returns (adj [B,N,N] f32, overflow [] int32).
    """
    n_id = graph.num_nodes
    b, n = nodes.shape
    u = jnp.minimum(nodes, n_id - 1)
    row_valid = nodes < n_id
    lo = jnp.where(row_valid, graph.indptr[u], 0)
    deg = jnp.where(row_valid, graph.indptr[u + 1] - lo, 0)
    csum = jnp.cumsum(deg, axis=-1)                     # inclusive [B, N]
    total = csum[:, -1]
    overflow = jnp.maximum(total - cand_cap, 0).sum().astype(jnp.int32)

    e = jnp.arange(cand_cap, dtype=csum.dtype)[None, :]       # [1, E]
    # method='compare_all': the sorted tables are tiny (N entries) so the
    # all-pairs comparison vectorizes on the VPU; the default 'scan'
    # method serializes log(N) dependent gathers per query
    owner = jax.vmap(lambda c, q: jnp.searchsorted(
        c, q, side="right", method="compare_all"))(
        csum, jnp.broadcast_to(e, (b, cand_cap)))             # [B, E]
    owner_c = jnp.minimum(owner, n - 1)
    start = jnp.where(owner_c > 0,
                      jnp.take_along_axis(csum, jnp.maximum(owner_c - 1, 0),
                                          axis=-1), 0)
    within = e - start
    pos = jnp.take_along_axis(lo, owner_c, axis=-1) + within
    valid = e < total[:, None]
    nbr = graph.indices[jnp.clip(pos, 0, graph.num_edges - 1)]
    loc = jax.vmap(lambda t, q: jnp.searchsorted(
        t, q, method="compare_all"))(nodes, nbr)              # [B, E]
    loc_c = jnp.minimum(loc, n - 1)
    hit = valid & (jnp.take_along_axis(nodes, loc_c, axis=-1) == nbr)
    # candidates -> dense block via one-hot matmul: TPU scatters
    # serialize, but U^T V rides the MXU.
    # U[b,e,i] = [owner(e) == i], V[b,e,j] = hit(e) * [loc(e) == j]
    ar = jnp.arange(n, dtype=owner_c.dtype)
    u = (owner_c[:, :, None] == ar).astype(jnp.bfloat16)
    v = (jnp.where(hit, loc_c, n)[:, :, None] == ar).astype(jnp.bfloat16)
    adj = jnp.einsum("bei,bej->bij", u, v,
                     preferred_element_type=jnp.float32)
    adj = (adj > 0).astype(jnp.float32)     # dup graph edges -> 1
    return adj * row_valid[:, :, None], overflow


def membership_matrix_hub(graph: DeviceGraph, nodes: jax.Array,
                          cand_cap: int, deg_cap: int, hub_slots: int
                          ) -> tuple:
    """Hub-safe candidate induction for UNDIRECTED graphs.

    The plain candidate strategy (:func:`membership_matrix_cand`)
    enumerates every out-edge of every member, so one hub member with
    deg 1e4-1e6 inflates the static ``cand_cap`` (and the [B, E, N]
    one-hot buffers) by orders of magnitude — the round-1 scaling cliff
    on power-law graphs.  The reference's per-thread hash loop
    (cpp:378-427) is insensitive to hubs; this reproduces that
    insensitivity with two bounded passes:

    * members with deg <= ``deg_cap`` enumerate ALL their edges
      (E <= sum of capped degrees, bounded by n_pad * deg_cap).  An
      edge between a small node and a hub is found from the small side
      and symmetrized — valid because the graph is undirected;
    * the top-``hub_slots`` members by degree form a static hub table;
      only hub x hub pairs run the pairwise CSR binary search
      ([B, H, H] queries — tiny next to the [B, N, N] full search).

    Edges are dropped ONLY if candidates exceed ``cand_cap`` or more
    than ``hub_slots`` members exceed ``deg_cap``; both are counted in
    ``overflow``.  Callers with deterministic scopes (PPR tables) size
    all three exactly, making overflow structurally zero.

    Returns (adj [B,N,N] f32, overflow [] int32).
    """
    n_id = graph.num_nodes
    b, n = nodes.shape
    u = jnp.minimum(nodes, n_id - 1)
    row_valid = nodes < n_id
    lo = jnp.where(row_valid, graph.indptr[u], 0)
    deg_full = jnp.where(row_valid, graph.indptr[u + 1] - lo, 0)
    small = deg_full <= deg_cap
    deg_c = jnp.where(small, deg_full, 0)
    csum = jnp.cumsum(deg_c, axis=-1)                   # inclusive [B, N]
    total = csum[:, -1]
    overflow = jnp.maximum(total - cand_cap, 0).sum().astype(jnp.int32)

    e = jnp.arange(cand_cap, dtype=csum.dtype)[None, :]
    owner = jax.vmap(lambda c, q: jnp.searchsorted(
        c, q, side="right", method="compare_all"))(
        csum, jnp.broadcast_to(e, (b, cand_cap)))       # [B, E]
    owner_c = jnp.minimum(owner, n - 1)
    start = jnp.where(owner_c > 0,
                      jnp.take_along_axis(csum, jnp.maximum(owner_c - 1, 0),
                                          axis=-1), 0)
    within = e - start
    pos = jnp.take_along_axis(lo, owner_c, axis=-1) + within
    valid = e < total[:, None]
    nbr = graph.indices[jnp.clip(pos, 0, graph.num_edges - 1)]
    loc = jax.vmap(lambda t, q: jnp.searchsorted(
        t, q, method="compare_all"))(nodes, nbr)        # [B, E]
    loc_c = jnp.minimum(loc, n - 1)
    hit = valid & (jnp.take_along_axis(nodes, loc_c, axis=-1) == nbr)
    ar = jnp.arange(n, dtype=owner_c.dtype)
    uoh = (owner_c[:, :, None] == ar).astype(jnp.bfloat16)
    voh = (jnp.where(hit, loc_c, n)[:, :, None] == ar).astype(jnp.bfloat16)
    adj = jnp.einsum("bei,bej->bij", uoh, voh,
                     preferred_element_type=jnp.float32) > 0
    # undirected: an edge whose other endpoint is a hub was only found
    # from the small side — mirror it
    adj = adj | jnp.swapaxes(adj, -1, -2)

    if hub_slots > 0:
        adj_h, over_h = _hub_pairs(graph, nodes, lo, deg_full, deg_cap,
                                   hub_slots)
        adj = adj | adj_h
        overflow = overflow + over_h

    adj = adj.astype(jnp.float32)
    return adj * row_valid[:, :, None], overflow


def _hub_pairs(graph: DeviceGraph, nodes: jax.Array, lo: jax.Array,
               deg_full: jax.Array, deg_cap: int, hub_slots: int) -> tuple:
    """Hub-tier membership: the top-``hub_slots`` members by degree form
    a static table; hub x hub pairs run the pairwise CSR binary search
    ([B, H, H] queries).  Returns (adj_hub [B,N,N] bool, overflow)."""
    b, n = nodes.shape
    h = hub_slots
    ar = jnp.arange(n, dtype=jnp.int32)
    # one (deg desc, index asc) lax.sort yields order/hdeg/hlo/hnodes
    # together — replaces argsort + three take_along gathers; the index
    # tiebreak key reproduces the stable-argsort hub choice exactly
    arb = jnp.broadcast_to(ar, (b, n))
    _, order, hdeg, hlo, hnodes = jax.lax.sort(
        (-deg_full, arb, deg_full, lo, nodes), dimension=-1, num_keys=2)
    order, hdeg = order[:, :h], hdeg[:, :h]
    hlo, hnodes = hlo[:, :h], hnodes[:, :h]
    hub_valid = hdeg > deg_cap
    n_hubs = (deg_full > deg_cap).sum(-1)
    overflow = jnp.maximum(n_hubs - h, 0).sum().astype(jnp.int32)
    q = hnodes[:, None, :]                                      # [B, 1, H]
    lo2 = jnp.broadcast_to(hlo[:, :, None], (b, h, h))
    hi2 = jnp.broadcast_to((hlo + hdeg)[:, :, None], (b, h, h))
    hi_end = hi2

    def step(_, carry):
        lo3, hi3 = carry
        mid = (lo3 + hi3) // 2
        v = graph.indices[jnp.clip(mid, 0, graph.num_edges - 1)]
        ge = v >= q
        return jnp.where(ge, lo3, mid + 1), jnp.where(ge, mid, hi3)

    lo2, hi2 = jax.lax.fori_loop(0, graph.search_steps, step, (lo2, hi2))
    found = (lo2 < hi_end) & (
        graph.indices[jnp.clip(lo2, 0, graph.num_edges - 1)] == q)
    s = found & hub_valid[:, :, None] & hub_valid[:, None, :]
    poh = ((order[:, :, None] == ar)
           & hub_valid[..., None]).astype(jnp.bfloat16)         # [B, H, N]
    tmp = jnp.einsum("bhg,bgj->bhj", s.astype(jnp.bfloat16), poh,
                     preferred_element_type=jnp.float32)
    adj_h = jnp.einsum("bhi,bhj->bij", poh, tmp,
                       preferred_element_type=jnp.float32) > 0
    return adj_h, overflow


def membership_matrix_rows(graph: DeviceGraph, nodes: jax.Array,
                           deg_cap: int, hub_slots: int) -> tuple:
    """Row-slice induction: adj[b,i,j] = 1 iff nodes[b,j] appears in the
    CSR row of nodes[b,i].

    Each member's neighbor list is read as ROW_BLOCK-wide blocks of the
    padded ``indices`` array via a 2-D row gather — measured ~15 ns per
    ROW on TPU regardless of width, vs ~10 ns per ELEMENT for the
    round-2 candidate machinery's 1-D gathers and ~1.9 µs per row for
    lax.gather slices (scripts/gather_microbench.py).  Membership is
    then a single fused broadcast-compare + or-reduce against the node
    table — no searchsorted, no one-hot einsums; the [B, N, N, R*W]
    compare never materializes (XLA fuses the producer into the
    reduce).

    ``deg_cap`` must cover the degree of every non-hub member for
    exactness; callers size it at the max (scope) degree when
    ``hub_slots == 0``.  With ``hub_slots > 0`` members above
    ``deg_cap`` route through the static hub table (undirected graphs
    only: small->hub edges are found from the small side and
    mirrored, like :func:`membership_matrix_hub`).

    Returns (adj [B,N,N] f32, overflow [] int32): overflow counts
    over-degree members that had no hub slot (structurally zero when
    the caller sizes exactly).
    """
    n_id = graph.num_nodes
    b, n = nodes.shape
    u = jnp.minimum(nodes, n_id - 1)
    row_valid = nodes < n_id
    lo = jnp.where(row_valid, graph.indptr[u], 0)
    deg_full = jnp.where(row_valid, graph.indptr[u + 1] - lo, 0)
    small = deg_full <= deg_cap
    wb = graph.row_block
    blk = graph.indices.reshape(-1, wb)                  # padded to wb
    # blocks floor(lo/W) .. floor((lo+deg-1)/W): at most R per member
    r = (deg_cap - 1) // wb + 2
    r0 = (lo // wb).astype(jnp.int32)
    rows_idx = jnp.clip(r0[..., None] + jnp.arange(r, dtype=jnp.int32),
                        0, blk.shape[0] - 1)             # [B, N, R]
    nbr = blk[rows_idx]                                  # [B, N, R, W]
    pos = (rows_idx.astype(lo.dtype) * wb)[..., None] \
        + jnp.arange(wb, dtype=lo.dtype)                 # global positions
    hi = lo + deg_full                                   # exclusive end
    take = ((pos >= lo[..., None, None]) & (pos < hi[..., None, None])
            & (small & row_valid)[..., None, None])
    nbr = jnp.where(take, nbr, n_id)                     # pad -> sentinel
    nbr = nbr.reshape(b, n, r * wb)
    # fused membership: dst axis broadcast, or-reduce over the minor
    # axis; sentinels never match (dst padding mapped off-range)
    dst = jnp.where(nodes < n_id, nodes, n_id + 1)
    adj = jnp.any(nbr[:, :, None, :] == dst[:, None, :, None], axis=-1)
    if hub_slots > 0:
        adj = adj | jnp.swapaxes(adj, -1, -2)            # mirror small->hub
        adj_h, overflow = _hub_pairs(graph, nodes, lo, deg_full, deg_cap,
                                     hub_slots)
        adj = adj | adj_h
    else:
        overflow = (deg_full > deg_cap).sum().astype(jnp.int32)
    return adj.astype(jnp.float32) * row_valid[:, :, None], overflow


def bfs_hops(adj: jax.Array, start_local: jax.Array, node_mask: jax.Array
             ) -> jax.Array:
    """Batched BFS distance from a start node over dense blocks.

    Returns [B, N] int32 with -1 for unreachable/padded nodes.  Follows
    out-edges (CSR row direction), like SubgraphStruct::compute_hops.
    """
    b, n, _ = adj.shape
    frontier = jax.nn.one_hot(start_local, n, dtype=jnp.float32) > 0
    dist = jnp.where(frontier, 0, -1)

    def cond(c):
        _, frontier, _ = c
        return jnp.any(frontier)

    def body(c):
        dist, frontier, lvl = c
        nxt = jnp.einsum("bi,bij->bj", frontier.astype(jnp.float32), adj) > 0
        new = nxt & (dist < 0) & node_mask
        dist = jnp.where(new, lvl + 1, dist)
        return dist, new, lvl + 1

    dist, _, _ = jax.lax.while_loop(cond, body, (dist, frontier, jnp.int32(0)))
    return dist


def bfs_hops_multi(adj: jax.Array, starts_local: jax.Array,
                   node_mask: jax.Array) -> jax.Array:
    """Batched multi-source BFS: [B, S] start nodes -> [B, S, N] dists.

    One while_loop advances ALL sources together (the frontier matvec is
    a [B, S, N] x [B, N, N] einsum), so S sources cost max(levels)
    sequential steps instead of the sum the per-source loops pay — the
    DRNL double-BFS (Graph.cpp:32-73 run twice per subgraph) becomes one
    batched program.  -1 marks unreachable/padded nodes.
    """
    _, n, _ = adj.shape
    frontier = jax.nn.one_hot(starts_local, n, dtype=jnp.float32) > 0
    dist = jnp.where(frontier, 0, -1)

    def cond(c):
        _, frontier, _ = c
        return jnp.any(frontier)

    def body(c):
        dist, frontier, lvl = c
        nxt = jnp.einsum("bsi,bij->bsj", frontier.astype(jnp.float32),
                         adj) > 0
        new = nxt & (dist < 0) & node_mask[:, None, :]
        dist = jnp.where(new, lvl + 1, dist)
        return dist, new, lvl + 1

    dist, _, _ = jax.lax.while_loop(cond, body,
                                    (dist, frontier, jnp.int32(0)))
    return dist


def drnl_labels(adj: jax.Array, targets: jax.Array, node_mask: jax.Array
                ) -> jax.Array:
    """Double-radius node labels for 2-target (link) subgraphs.

    Formula of Graph.cpp:66-73: unreachable (>=255) -> 255; else
    1 + min(dx,dy) + (d/2)*((d/2)+(d%2)-1) with d = dx+dy.
    """
    d2 = bfs_hops_multi(adj, targets[:, :2], node_mask)
    dx, dy = d2[:, 0], d2[:, 1]
    dx = jnp.where(dx < 0, 255, dx)
    dy = jnp.where(dy < 0, 255, dy)
    d = dx + dy
    half = d // 2
    val = 1 + jnp.minimum(dx, dy) + half * (half + d % 2 - 1)
    return jnp.where((dx >= 255) | (dy >= 255), 255, val).astype(jnp.int32)


def induce(graph: DeviceGraph, nodes: jax.Array, ppr_vals: jax.Array,
           roots: jax.Array, cfg: SamplerConfig) -> SubgraphBatch:
    """Build the full SubgraphBatch from sampled node sets.

    nodes     [B, N] sorted, padding = graph.num_nodes
    ppr_vals  [B, N] aligned PPR annotations (zeros if none)
    roots     [B, T] global target ids (must be members of ``nodes``)
    """
    n_id = graph.num_nodes
    node_mask = nodes < n_id
    size = node_mask.sum(-1).astype(jnp.int32)

    if cfg.induction == "rows" and cfg.deg_cap > 0:
        adj, overflow = membership_matrix_rows(graph, nodes, cfg.deg_cap,
                                               cfg.hub_slots)
    elif cfg.induction == "hub" and cfg.cand_cap > 0:
        adj, overflow = membership_matrix_hub(graph, nodes, cfg.cand_cap,
                                              cfg.deg_cap, cfg.hub_slots)
    elif cfg.induction == "cand" and cfg.cand_cap > 0:
        adj, overflow = membership_matrix_cand(graph, nodes, cfg.cand_cap)
    else:
        adj = membership_matrix(graph, nodes)
        overflow = jnp.zeros((), jnp.int32)

    # local target indices via binary search in the sorted node table
    targets = jax.vmap(lambda t, q: jnp.searchsorted(
        t, q, method="compare_all"))(nodes, roots).astype(jnp.int32)

    # remove target<->target edges (cpp:356-358: forced kept for T==1;
    # cpp:412-418: removed otherwise unless include_target_conn)
    if cfg.num_targets > 1 and not cfg.include_target_conn:
        t_oh = jax.nn.one_hot(targets, nodes.shape[1], dtype=jnp.float32)  # [B,T,N]
        t_any = t_oh.sum(1)                            # [B, N] indicator
        adj = adj * (1.0 - t_any[:, :, None] * t_any[:, None, :])

    # self-edge insertion (cpp:386-411); idempotent on the dense block
    if cfg.add_self_edge:
        eye = jnp.eye(nodes.shape[1], dtype=jnp.float32)
        adj = jnp.maximum(adj, eye[None] * node_mask[:, None, :] * node_mask[:, :, None])

    hop = jnp.full(nodes.shape, -1, jnp.int32)
    drnl = jnp.zeros(nodes.shape, jnp.int32)
    if "hops" in cfg.aug_feats:
        assert cfg.num_targets == 1, "hops aug needs a single target (cpp:434)"
        hop = bfs_hops(adj, targets[:, 0], node_mask)
    if "drnls" in cfg.aug_feats:
        assert cfg.num_targets == 2, "drnl needs two targets"
        drnl = drnl_labels(adj, targets, node_mask)

    return SubgraphBatch(
        nodes=nodes,
        node_mask=node_mask,
        adj=adj,
        targets=targets,
        size=size,
        hop=hop,
        ppr=ppr_vals,
        drnl=drnl,
        overflow=overflow,
    )

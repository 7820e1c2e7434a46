"""Numpy oracles re-implementing the reference sampler semantics serially.

These mirror the behavior of ParallelSampler.cpp (khop cpp:510-556,
ppr cpp:565-595, induction cpp:350-453) and Graph.cpp (BFS hops :32-64,
DRNL :66-73) as straightforward python, used to verify the device
programs in shadow_gnn_tpu.sampling.  They play the same role as the
reference's own serial python extractor (samplers_base.py:93-176).
"""
from collections import deque

import numpy as np


def induced_subgraph(indptr, indices, node_set, targets,
                     add_self_edge=False, include_target_conn=False):
    """Returns (nodes_sorted, dense_adj, target_local).

    Exact _node_induced_subgraph semantics: nodes sorted ascending;
    self edge inserted if requested and absent; target-target edges
    removed unless include_target_conn (forced True for 1 target).
    """
    if len(targets) == 1:
        include_target_conn = True
    nodes = np.array(sorted(set(int(v) for v in node_set)), dtype=np.int64)
    pos = {int(v): i for i, v in enumerate(nodes)}
    n = nodes.size
    adj = np.zeros((n, n), dtype=np.float32)
    tset = set(int(t) for t in targets)
    for i, v in enumerate(nodes):
        neighs = indices[indptr[v]:indptr[v + 1]]
        for u in neighs:
            u = int(u)
            if u not in pos:
                continue
            if not include_target_conn and v in tset and u in tset:
                continue
            adj[i, pos[u]] = 1.0
        if add_self_edge:
            adj[i, i] = 1.0
    target_local = np.array([pos[int(t)] for t in targets], dtype=np.int64)
    return nodes, adj, target_local


def bfs_hops_dense(adj, start):
    """BFS over a dense adjacency; -1 = unreachable (Graph.cpp:32-64)."""
    n = adj.shape[0]
    dist = -np.ones(n, dtype=np.int64)
    dist[start] = 0
    q = deque([start])
    while q:
        v = q.popleft()
        for u in np.where(adj[v] > 0)[0]:
            if dist[u] < 0:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist


def drnl_dense(adj, t0, t1):
    """DRNL per Graph.cpp:66-73 on a dense adjacency."""
    dx = bfs_hops_dense(adj, t0)
    dy = bfs_hops_dense(adj, t1)
    out = np.zeros(adj.shape[0], dtype=np.int64)
    for i in range(adj.shape[0]):
        a = 255 if dx[i] < 0 else dx[i]
        b = 255 if dy[i] < 0 else dy[i]
        if a >= 255 or b >= 255:
            out[i] = 255
        else:
            d = a + b
            out[i] = 1 + min(a, b) + (d // 2) * ((d // 2) + (d % 2) - 1)
    return out


def khop_node_set_support(indptr, indices, targets, depth, budget):
    """The *support* of the khop sampler: all nodes reachable with the
    full neighbor expansion (superset of any random budgeted draw)."""
    levels = [set(int(t) for t in targets)]
    for _ in range(depth):
        nxt = set()
        for v in levels[-1]:
            nxt.update(int(u) for u in indices[indptr[v]:indptr[v + 1]])
        levels.append(nxt)
    out = set()
    for l in levels:
        out |= l
    return out


def khop_mandatory_nodes(indptr, indices, targets, depth, budget):
    """Nodes guaranteed present in ANY khop draw: expansion restricted
    to frontier nodes whose degree <= budget (those take all neighbors)."""
    levels = [set(int(t) for t in targets)]
    for _ in range(depth):
        nxt = set()
        for v in levels[-1]:
            deg = indptr[v + 1] - indptr[v]
            if deg <= budget:
                nxt.update(int(u) for u in indices[indptr[v]:indptr[v + 1]])
        levels.append(nxt)
    out = set()
    for l in levels:
        out |= l
    return out


def ppr_scope(neighs_row, scores_row, target, k, threshold):
    """Scope of the deterministic ppr sampler (cpp:565-595)."""
    touched = {int(target): -1.0}
    size_neigh = min(k, len(neighs_row))
    if size_neigh > 1:
        max_ppr = scores_row[1]
    else:
        max_ppr = 0.0
        if size_neigh == 1:
            touched[int(target)] = float(scores_row[0])
    for i in range(size_neigh):
        if max_ppr == 0 or scores_row[i] / max_ppr < threshold:
            break
        touched[int(neighs_row[i])] = float(scores_row[i])
    return touched


def ppr_st_sample_size(neighs_row, scores_row, k, threshold):
    """sample_size counting loop of the stochastic sampler (cpp:612-626):
    cnt_target increments BEFORE the threshold break, so the first
    failing entry is still counted."""
    size_neigh = min(k, len(neighs_row))
    max_ppr = float(scores_row[1]) if size_neigh > 1 else 0.0
    cnt = 0
    for i in range(size_neigh):
        cnt += 1
        if max_ppr == 0 or scores_row[i] / max_ppr < threshold:
            break
    return cnt

"""`global_sort_pool` with PyG semantics (sort by last feature channel,
top-k per graph, zero-pad) — used by the reference's sort pooling
(`shaDow/layers.py:14`, ResPool 'sort')."""
import torch


def global_sort_pool(x, batch, k):
    num_graphs = int(batch.max().item()) + 1 if batch.numel() else 0
    dim = x.size(-1)
    out = x.new_zeros(num_graphs, k * dim)
    for g in range(num_graphs):
        xg = x[batch == g]
        # PyG sorts ascending by the last channel and keeps the LAST k
        # (equivalently: top-k by last channel, descending order kept)
        xg = xg[xg[:, -1].argsort(descending=True)]
        xg = xg[:k]
        out[g, : xg.numel()] = xg.reshape(-1)
    return out

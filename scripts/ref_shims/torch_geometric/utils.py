"""`to_undirected` / `add_self_loops` / `negative_sampling` with the
PyG call conventions used at `shaDow/minibatch.py:289-292` and
`frontend/data_converter.py:22`."""
import torch


def to_undirected(edge_index, num_nodes=None):
    both = torch.cat([edge_index, edge_index.flip(0)], dim=1)
    return torch.unique(both, dim=1)


def add_self_loops(edge_index, edge_attr=None, num_nodes=None):
    n = num_nodes
    if n is None:
        n = int(edge_index.max().item()) + 1 if edge_index.numel() else 0
    loops = torch.arange(n, dtype=edge_index.dtype).unsqueeze(0).repeat(2, 1)
    return torch.cat([edge_index, loops], dim=1), edge_attr


def negative_sampling(edge_index, num_nodes=None, num_neg_samples=None):
    """Uniform negative edges avoiding ``edge_index`` membership
    (rejection sampling on composite keys)."""
    if num_nodes is None:
        num_nodes = int(edge_index.max().item()) + 1
    if num_neg_samples is None:
        num_neg_samples = edge_index.size(1)
    existing = (edge_index[0].long() * num_nodes + edge_index[1].long())
    existing = torch.unique(existing)
    out = []
    need = num_neg_samples
    while need > 0:
        cand = torch.randint(0, num_nodes, (2, int(need * 1.2) + 8))
        key = cand[0] * num_nodes + cand[1]
        pos = torch.searchsorted(existing, key)
        pos = pos.clamp(max=existing.numel() - 1)
        bad = existing[pos] == key
        cand = cand[:, ~bad]
        out.append(cand[:, :need])
        need -= out[-1].size(1)
    return torch.cat(out, dim=1)

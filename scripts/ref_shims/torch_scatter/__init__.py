"""Functional stand-in for the ``torch_scatter`` package.

The reference (`/root/reference/shaDow/layers.py:13`,
`para_graph_sampler/graph_engine/frontend/graph_utils.py:8`) imports
``torch_scatter.scatter`` at module load.  The real package is not
installed in this environment; plain torch >= 1.12 provides
``scatter_reduce`` with the same semantics, so this shim lets the
reference run unmodified for the convergence A/B
(`scripts/reference_ab.py`).  Missing output slots are left at 0,
matching torch_scatter's fill value for sum/max on the call sites used
(1-D values of a sparse adjacency: layers.py:572-578, graph_utils.py:64).
"""
import torch

_REDUCE = {"sum": "sum", "add": "sum", "mean": "mean",
           "max": "amax", "min": "amin"}


def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    if out is not None:  # not used by the reference call sites
        raise NotImplementedError("shim supports out=None only")
    if dim < 0:
        dim = src.dim() + dim
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    res = torch.zeros(shape, dtype=src.dtype, device=src.device)
    idx = index.long()
    if idx.dim() == 1 and src.dim() > 1:
        view = [1] * src.dim()
        view[dim] = -1
        idx = idx.view(view).expand_as(src)
    return res.scatter_reduce(dim, idx, src, reduce=_REDUCE[reduce],
                              include_self=False)

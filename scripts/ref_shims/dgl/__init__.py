"""Functional stand-in for the slice of ``dgl`` the reference's
Correct&Smooth postprocessing uses (`shaDow/postproc_CnS.py:8,33-77`):
a graph object with edge mutation + ``update_all(copy_u, mean)``
message passing, and the ``dgl.function`` marker objects.  Implemented
with plain torch index_add so the UNMODIFIED reference C&S code runs
in this environment (dgl is not installed here).
"""
import contextlib

import torch


class _CopyU:
    def __init__(self, src_field, msg_field):
        self.src_field = src_field
        self.msg_field = msg_field


class _Mean:
    def __init__(self, msg_field, out_field):
        self.msg_field = msg_field
        self.out_field = out_field


class _Fn:
    @staticmethod
    def copy_u(src_field, msg_field):
        return _CopyU(src_field, msg_field)

    @staticmethod
    def mean(msg_field, out_field):
        return _Mean(msg_field, out_field)


function = _Fn()


class DGLGraph:
    """Edge-list graph with the postproc_CnS surface.

    srcdata/dstdata are the same dict (homogeneous graph), matching
    DGL's aliasing of ndata for non-bipartite graphs.
    """

    def __init__(self, src, dst, num_nodes):
        self.src = torch.as_tensor(src, dtype=torch.int64)
        self.dst = torch.as_tensor(dst, dtype=torch.int64)
        self._n = int(num_nodes)
        self.srcdata = {}
        self.dstdata = self.srcdata
        self.ndata = self.srcdata

    # -- structure ----------------------------------------------------
    def number_of_nodes(self):
        return self._n

    def number_of_edges(self):
        return int(self.src.numel())

    def all_edges(self):
        return self.src, self.dst

    def add_edges(self, src, dst):
        self.src = torch.cat([self.src, torch.as_tensor(src, dtype=torch.int64)])
        self.dst = torch.cat([self.dst, torch.as_tensor(dst, dtype=torch.int64)])

    def remove_self_loop(self):
        keep = self.src != self.dst
        self.src, self.dst = self.src[keep], self.dst[keep]
        return self

    def add_self_loop(self):
        loop = torch.arange(self._n, dtype=torch.int64)
        self.add_edges(loop, loop)
        return self

    def create_formats_(self):
        pass

    def to(self, device):
        return self

    # -- message passing ----------------------------------------------
    def in_degrees(self):
        return torch.bincount(self.dst, minlength=self._n)

    @contextlib.contextmanager
    def local_scope(self):
        saved = dict(self.srcdata)
        try:
            yield self
        finally:
            self.srcdata.clear()
            self.srcdata.update(saved)

    def update_all(self, msg_fn, reduce_fn):
        assert isinstance(msg_fn, _CopyU) and isinstance(reduce_fn, _Mean), (
            "shim supports exactly the copy_u+mean pattern of "
            "postproc_CnS.py:62")
        y = self.srcdata[msg_fn.src_field]
        out = torch.zeros((self._n,) + tuple(y.shape[1:]), dtype=y.dtype)
        out.index_add_(0, self.dst, y[self.src])
        deg = self.in_degrees().clamp(min=1).to(y.dtype)
        out = out / deg.reshape((-1,) + (1,) * (y.dim() - 1))
        self.dstdata[reduce_fn.out_field] = out


def graph(data, num_nodes=None):
    src, dst = data
    if num_nodes is None:
        num_nodes = int(max(src.max(), dst.max())) + 1
    return DGLGraph(src, dst, num_nodes)

"""Core graph containers.

``RawGraph`` is the host-side dataclass equivalent of the reference's
``graph_engine/frontend/graph.py:13-64`` (RawGraph) but holds plain
numpy CSR arrays (no scipy / torch dependency on the hot path).
``DeviceGraph`` is the TPU-resident CSR: the graph engine of this
framework.  Where the reference keeps the full graph in C++ RAM and
samples with OpenMP threads (``ParallelSampler.h:19-61``), we keep
``indptr`` / ``indices`` in HBM and sample with jitted gather programs
(see ``shadow_gnn_tpu.sampling``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from shadow_gnn_tpu import TRAIN, VALID, TEST


@dataclass
class RawGraph:
    """Host-side full graph in CSR form plus features / labels / splits.

    ``adj_*`` are (indptr, indices) pairs; edge values are implicitly 1.0
    everywhere (the reference also discards edge values on undirected
    conversion, ``graph_utils.py:25-27``).
    """

    indptr_full: np.ndarray
    indices_full: np.ndarray
    indptr_train: Optional[np.ndarray]
    indices_train: Optional[np.ndarray]
    feat_full: Optional[np.ndarray]
    label_full: Optional[np.ndarray]
    node_set: Optional[Dict[int, np.ndarray]]       # {TRAIN/VALID/TEST: node idx}
    edge_set: Optional[Dict[int, Dict[str, np.ndarray]]]  # link task: {'pos','neg'}

    def __post_init__(self):
        if self.feat_full is not None:
            assert self.feat_full.shape[0] == self.num_nodes
        if self.label_full is not None:
            assert self.label_full.shape[0] == self.num_nodes

    @property
    def num_nodes(self) -> int:
        return self.indptr_full.size - 1

    @property
    def num_edges(self) -> int:
        return self.indices_full.size

    @property
    def is_transductive(self) -> bool:
        # same rule as reference main.py:55 (adj_full.size == adj_train.size)
        return (
            self.indices_train is None
            or self.indices_train.size == self.indices_full.size
        )

    @property
    def prediction_task(self) -> str:
        return "node" if self.node_set is not None else "link"

    @property
    def entity_set(self):
        return self.node_set if self.node_set is not None else self.edge_set

    def adj(self, mode: int):
        """(indptr, indices) used for sampling in the given mode.

        Mirrors reference main.py:64: TRAIN uses adj_train (inductive) and
        VALID/TEST use adj_full.
        """
        if mode == TRAIN and self.indptr_train is not None:
            return self.indptr_train, self.indices_train
        return self.indptr_full, self.indices_full

    def deinit(self):
        for f in self.__dataclass_fields__:
            setattr(self, f, None)


@dataclass
class DeviceGraph:
    """Device-resident CSR of (a split of) the full graph.

    ``indptr``/``indices`` live in HBM as int32 (int64 indptr when the
    edge count overflows int32 — e.g. papers100M).  ``max_deg`` and
    ``log2_max_deg`` are trace-time constants that bound the binary
    search in the induction kernel.
    """

    indptr: Any          # jax.Array [N+1]
    indices: Any         # jax.Array [E]
    num_nodes: int
    num_edges: int
    max_deg: int
    row_block: int = 32
    meta: dict = field(default_factory=dict)

    # indices padding granularity: the row-slice induction reads
    # neighbor lists as [*, row_block]-blocked row gathers (a TPU 2-D
    # row gather costs ~15 ns per ROW regardless of width, vs ~10 ns
    # per ELEMENT for 1-D gathers — scripts/gather_microbench.py), so
    # indices is padded with the num_nodes sentinel to a block multiple
    # and reshaped inside the jitted programs.  The blocked view tiles
    # to 128 lanes physically, so a 32-wide block wastes 4x HBM when
    # XLA materializes it: at papers100M scale (1.6e9 edges) that is a
    # 25 GB allocation for a 6.3 GB array.  from_csr therefore switches
    # to 128-wide blocks for huge graphs — zero lane padding, and ~4x
    # fewer gather rows per member at large deg_cap.
    ROW_BLOCK = 32

    @classmethod
    def from_csr(cls, indptr: np.ndarray, indices: np.ndarray,
                 row_block: int = 0, **meta):
        import jax.numpy as jnp

        n = indptr.size - 1
        e = indices.size
        deg = np.diff(indptr)
        max_deg = int(deg.max()) if n > 0 else 0
        ptr_dtype = np.int64 if e >= 2**31 else np.int32
        if row_block <= 0:
            # lane-exact blocks once the 32-wide view's 4x lane padding
            # would cost >= 3 GB of HBM (2**28 edges)
            row_block = 128 if e >= 2**28 else cls.ROW_BLOCK
        pad = (-e) % row_block
        idx = indices.astype(np.int32)
        if pad:
            idx = np.concatenate([idx, np.full(pad, n, np.int32)])
        return cls(
            indptr=jnp.asarray(indptr.astype(ptr_dtype)),
            indices=jnp.asarray(idx),
            num_nodes=n,
            num_edges=e,
            max_deg=max_deg,
            row_block=row_block,
            meta=dict(meta),
        )

    @property
    def search_steps(self) -> int:
        """Binary-search iterations that cover any adjacency row."""
        return max(1, int(np.ceil(np.log2(max(2, self.max_deg + 1)))) + 1)


def _devicegraph_flatten(g: "DeviceGraph"):
    # registered as a pytree so graphs pass through jit as ARGUMENTS —
    # closure-captured buffers get serialized into compiled programs on
    # some backends (slow compiles / size limits)
    return (g.indptr, g.indices), (g.num_nodes, g.num_edges, g.max_deg,
                                   g.row_block)


def _devicegraph_unflatten(aux, children):
    indptr, indices = children
    n, e, d, wb = aux
    return DeviceGraph(indptr=indptr, indices=indices, num_nodes=n,
                       num_edges=e, max_deg=d, row_block=wb)


import jax as _jax
_jax.tree_util.register_pytree_node(DeviceGraph, _devicegraph_flatten,
                                    _devicegraph_unflatten)


def degrees(indptr: np.ndarray) -> np.ndarray:
    return np.diff(indptr)


def csr_to_dense(indptr: np.ndarray, indices: np.ndarray, n: Optional[int] = None):
    """Tiny-graph helper for tests/oracles."""
    n = indptr.size - 1 if n is None else n
    out = np.zeros((n, n), dtype=np.float32)
    for v in range(indptr.size - 1):
        out[v, indices[indptr[v]:indptr[v + 1]]] = 1.0
    return out


def is_undirected(indptr: np.ndarray, indices: np.ndarray,
                  max_exact_edges: int = 20_000_000, sample: int = 20_000,
                  seed: int = 0) -> bool:
    """True iff every edge (u, v) has a reverse (v, u).

    Exact (scipy transpose compare) up to ``max_exact_edges``; beyond
    that a reverse-membership check over ``sample`` random edges (a
    false positive would need an almost-symmetric directed graph, which
    none of the supported datasets are).  Gates the hub-safe induction
    strategy (sampling/induction.py:membership_matrix_hub), whose
    symmetrization step is only valid on undirected graphs.
    """
    m = int(indices.size)
    if m == 0:
        return True
    if m <= max_exact_edges:
        import scipy.sparse as sp
        n = indptr.size - 1
        a = sp.csr_matrix((np.ones(m, np.int8), indices, indptr),
                          shape=(n, n))
        return (a != a.T).nnz == 0
    rng = np.random.default_rng(seed)
    eids = np.sort(rng.choice(m, size=min(sample, m), replace=False))
    src = np.searchsorted(indptr, eids, side="right") - 1
    dst = indices[eids]
    for s, d in zip(src, dst):
        sl = indices[indptr[d]:indptr[d + 1]]
        p = np.searchsorted(sl, s)
        if p >= sl.size or sl[p] != s:
            return False
    return True

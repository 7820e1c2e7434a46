"""Sparse matrix-matrix products over the FULL graph.

The per-batch subgraph compute path uses dense blocks (MXU), but three
subsystems operate on the full graph and need genuine SpMM:

* feature/label smoothening preprocessing (reference preproc.py),
* Correct&Smooth postprocessing (reference postproc_CnS.py),
* the batched PPR power iteration (sampling/ppr.py).

``spmm_csr`` computes ``Y = A @ X`` for a CSR (indptr, indices, data)
via edge-list segment-sum — XLA lowers this to efficient sorted-segment
reductions on TPU.  For multi-host operation the edge list is sharded
and partial products are combined with psum (see parallel/).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def csr_to_edges(indptr: np.ndarray, indices: np.ndarray,
                 data: Optional[np.ndarray] = None):
    """Host-side CSR -> (src, dst, val) numpy edge list."""
    n = indptr.size - 1
    deg = np.diff(indptr)
    src = np.repeat(np.arange(n, dtype=np.int32), deg)
    dst = indices.astype(np.int32)
    val = np.ones(dst.size, np.float32) if data is None else data.astype(np.float32)
    return src, dst, val


@partial(jax.jit, static_argnames=("num_rows",))
def spmm_edges(src: jax.Array, dst: jax.Array, val: jax.Array,
               x: jax.Array, num_rows: int) -> jax.Array:
    """Y[i] = sum_{e: src[e]=i} val[e] * X[dst[e]]  (row-gather SpMM)."""
    gathered = val[:, None] * x[dst]
    return jax.ops.segment_sum(gathered, src, num_segments=num_rows)


def spmm_csr(indptr: np.ndarray, indices: np.ndarray, x,
             data: Optional[np.ndarray] = None):
    src, dst, val = csr_to_edges(indptr, indices, data)
    return spmm_edges(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val),
                      x, indptr.size - 1)

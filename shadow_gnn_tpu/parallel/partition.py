"""Sharded full-graph state for graphs that exceed one chip's HBM.

papers100M-scale support (SURVEY §5.7): the node-feature table (111M x
128 floats = 57GB) is row-sharded across the mesh; each device holds a
contiguous row range.  Subgraph feature gathers become collective
lookups: batch node ids are all-gathered over the mesh axis, every
device serves the rows it owns, and a psum_scatter returns each
device's own batch rows — the all-to-all boundary-feature exchange of
the north-star design, expressed with XLA collectives so it rides ICI.

The per-batch exchanged volume is tiny (B x N x F ~ a few MB), so this
path trades negligible latency for removing the single-chip HBM limit.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_rows_to_shards(tab: np.ndarray, n_shards: int) -> np.ndarray:
    rows = tab.shape[0]
    pad = (-rows) % n_shards
    if pad:
        tab = np.concatenate(
            [tab, np.zeros((pad,) + tab.shape[1:], tab.dtype)], 0)
    return tab


def sharded_feat_gather(feat_local: jax.Array, nodes: jax.Array,
                        axis: str = "dp") -> jax.Array:
    """Inside shard_map: gather rows of a row-sharded table.

    feat_local [N_local, F] — this device's row range
    nodes      [B_local, N] — this device's batch's global node ids
                (out-of-range ids, e.g. the num_nodes sentinel, -> 0)
    Returns    [B_local, N, F]
    """
    n_dev = jax.lax.axis_size(axis)
    n_local = feat_local.shape[0]
    # every device sees every shard's requests
    nodes_all = jax.lax.all_gather(nodes, axis)          # [dp, Bl, N]
    i = jax.lax.axis_index(axis)
    local = nodes_all - i * n_local
    ok = (local >= 0) & (local < n_local)
    vals = feat_local[jnp.clip(local, 0, n_local - 1)]   # [dp, Bl, N, F]
    vals = vals * ok[..., None]
    # each row lives on exactly one shard -> sum-scatter returns each
    # device its own batch's rows
    return jax.lax.psum_scatter(vals, axis, scatter_dimension=0, tiled=False)


def make_sharded_gather_fn(mesh: Mesh, feat_tab: np.ndarray,
                           axis: str = "dp"):
    """Shard a host feature table over ``mesh`` rows; returns
    (feat_sharded, gather_fn) where gather_fn(nodes_sharded [B, N])
    -> [B, N, F] with batch sharded over the same axis."""
    n_dev = mesh.devices.size
    tab = pad_rows_to_shards(np.asarray(feat_tab), n_dev)
    feat_sharded = jax.device_put(
        jnp.asarray(tab), NamedSharding(mesh, P(axis, None)))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
             out_specs=P(axis, None, None))
    def gather(feat_local, nodes):
        return sharded_feat_gather(feat_local, nodes, axis)

    return feat_sharded, lambda nodes: gather(feat_sharded, nodes)

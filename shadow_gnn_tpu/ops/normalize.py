"""Adjacency normalization + dropedge over dense subgraph blocks.

Covers the reference's per-batch host-side scipy/torch normalizations
(``graph_utils.py:67-145``, GIN's inline dropedge ``layers.py:514-522``,
GAT's ``_adj_norm`` ``layers.py:584-600``) as batched element-wise device
ops over ``[B, N, N]`` blocks.  As in the reference, normalization and
edge drop happen ONCE per batch (first conv layer) and the result is
reused by subsequent layers (the ``is_normed`` flag protocol of
``layers.py:423-436``).

Dropedge semantics: the reference zeroes ``int(E*p)`` value slots drawn
WITH replacement (expected drop fraction ``1-(1-1/E)^(pE) ~= p``); the
device version uses i.i.d. Bernoulli(p) per edge, the same expectation
without host-side index generation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropedge_mask(rng, adj: jax.Array, dropedge: float) -> jax.Array:
    """Bernoulli keep-mask over present edges; all-ones when p == 0."""
    if dropedge <= 0.0 or rng is None:
        return jnp.ones_like(adj)
    keep = jax.random.bernoulli(rng, 1.0 - dropedge, adj.shape)
    return keep.astype(adj.dtype)


def adj_norm_sym(adj: jax.Array, rng=None, dropedge: float = 0.0) -> jax.Array:
    """Symmetric D^-1/2 (A_drop) D^-1/2 (graph_utils.py:109-145).

    Edges are dropped symmetrically: an edge survives only if both
    directions survive (the reference keeps entries where
    ``adj_m + adj_m.T == 2``).  Degrees are clipped at 1.
    """
    if dropedge > 0.0:
        m = dropedge_mask(rng, adj, dropedge)
        s = adj * m
        adj = s * jnp.swapaxes(s, -1, -2)
    deg = jnp.clip(adj.sum(-1), 1.0, None)
    d_inv_sqrt = jax.lax.rsqrt(deg)
    return adj * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]


def adj_norm_rw(adj: jax.Array, rng=None, dropedge: float = 0.0) -> jax.Array:
    """Random-walk D_drop^-1 A_drop (graph_utils.py:67-106 torch branch):
    surviving edges get value 1/deg_dropped(row)."""
    if dropedge > 0.0:
        adj = adj * dropedge_mask(rng, adj, dropedge)
    deg = jnp.clip(adj.sum(-1), 1.0, None)
    return adj / deg[..., :, None]


def adj_gin_rescale(adj: jax.Array, rng=None, dropedge: float = 0.0) -> jax.Array:
    """GIN dropedge with degree rescale (layers.py:514-522): surviving
    edges get value deg_orig(row)/deg_dropped(row); no normalization."""
    if dropedge <= 0.0:
        return adj
    deg_orig = adj.sum(-1)
    adj_d = adj * dropedge_mask(rng, adj, dropedge)
    deg_drop = jnp.clip(adj_d.sum(-1), 1.0, None)
    return adj_d * (deg_orig / deg_drop)[..., :, None]


def adj_gat_drop(adj: jax.Array, rng=None, dropedge: float = 0.0) -> jax.Array:
    """GAT keeps the raw 0/1 adjacency, only zeroing dropped edges
    (layers.py:584-600); softmax renormalizes downstream."""
    if dropedge <= 0.0:
        return adj
    return adj * dropedge_mask(rng, adj, dropedge)


def prepare_adj(aggr: str, adj: jax.Array, rng=None, dropedge: float = 0.0):
    """Once-per-batch adjacency prep for a conv stack.

    Returns (adj_norm, adj_structural) — GAT needs the pre-drop
    structural adjacency for its row-max stabilization
    (layers.py:570-575 computes the max over all structural edges).
    """
    if aggr == "gcn":
        return adj_norm_sym(adj, rng, dropedge), adj
    if aggr == "sage":
        return adj_norm_rw(adj, rng, dropedge), adj
    if aggr == "gin":
        return adj_gin_rescale(adj, rng, dropedge), adj
    if aggr in ("gat", "gatscat"):
        return adj_gat_drop(adj, rng, dropedge), adj
    if aggr in ("mlp", "sgc", "sign"):
        return adj, adj
    raise ValueError(aggr)

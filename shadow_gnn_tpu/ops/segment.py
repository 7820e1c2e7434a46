"""Masked pooling over padded subgraph blocks.

Replaces the reference's ``F.embedding_bag`` over block-diagonal offsets
(``layers.py:168-184``) and PyG ``global_sort_pool`` (``layers.py:194``)
with mask-aware reductions over ``[B, N, F]`` blocks — masked (padding)
rows never contribute to sums, means, maxima or sort ranking.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def masked_sum_pool(feat: jax.Array, mask: jax.Array) -> jax.Array:
    return (feat * mask[..., None]).sum(-2)


def masked_mean_pool(feat: jax.Array, mask: jax.Array) -> jax.Array:
    s = (feat * mask[..., None]).sum(-2)
    cnt = jnp.clip(mask.sum(-1, keepdims=True).astype(feat.dtype), 1.0, None)
    return s / cnt


def masked_max_pool(feat: jax.Array, mask: jax.Array) -> jax.Array:
    z = jnp.where(mask[..., None], feat, _NEG)
    out = z.max(-2)
    # graphs with zero valid nodes (can't happen in practice) -> 0
    return jnp.where(out <= _NEG / 2, 0.0, out)


def masked_sort_pool(feat: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """PyG global_sort_pool semantics: nodes sorted descending by the
    LAST feature channel; top-k rows concatenated to [B, k*F]; graphs
    with fewer than k valid nodes are zero-padded."""
    b, n, f = feat.shape
    key = jnp.where(mask, feat[..., -1], _NEG)
    order = jnp.argsort(-key, axis=-1)[:, :k]                   # [B, k]
    top = jnp.take_along_axis(feat, order[..., None], axis=1)   # [B, k, F]
    rank_valid = jnp.arange(k)[None, :] < mask.sum(-1, keepdims=True)
    top = top * rank_valid[..., None]
    return top.reshape(b, k * f)

"""Subgraph readout (ResPool) and ensemble aggregation.

Matches reference ``shaDow/layers.py``:
* ResPool (:57-233): residue in {none, sum, max, concat} over the JK
  list x pooling in {center, mean, max, sum, sort-k}; link-task target
  aggregation src (*) dst (:145-152); trailing Dropout-Linear-act and
  the f_norm affine layernorm (:114-118);
* EnsembleAggregator (:236-296): softmax attention over branches with
  dropout modes none/feat/coef.

Pooling runs masked over padded blocks (ops/segment.py) instead of
F.embedding_bag over block-diagonal offsets.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from shadow_gnn_tpu.nn.layers import Act, TorchLinear, norm_feat
from shadow_gnn_tpu.ops.segment import (
    masked_max_pool, masked_mean_pool, masked_sort_pool, masked_sum_pool,
)

_POOL_FN = {"mean": masked_mean_pool, "max": masked_max_pool,
            "sum": masked_sum_pool}


def _pool_any(tp: str, feat: jax.Array, node_mask: jax.Array) -> jax.Array:
    """Masked mean/max/sum pool for flat [B, N, F] OR head-major
    [B, H, N, dh] blocks.  The head-major variant reduces the node axis
    in place and reshapes the tiny [B, H, dh] result to the flat
    feature order — no [B, N, F] materialization (layers.py hm_chain)."""
    if feat.ndim != 4:
        return _POOL_FN[tp](feat, node_mask)
    b, h, n, dh = feat.shape
    m = node_mask[:, None, :, None]
    if tp == "sum":
        out = (feat * m).sum(2)
    elif tp == "mean":
        cnt = jnp.clip(node_mask.sum(-1).astype(feat.dtype), 1.0,
                       None)[:, None, None]
        out = (feat * m).sum(2) / cnt
    else:
        z = jnp.where(m, feat, -1e30)
        out = z.max(2)
        out = jnp.where(out <= -5e29, 0.0, out)
    return out.reshape(b, h * dh)


def f_residue(feats: Sequence[jax.Array], type_res: str) -> jax.Array:
    """JK-style residue combination (layers.py:120-130)."""
    if type_res in ("cat", "concat"):
        return jnp.concatenate(list(feats), axis=-1)
    if type_res == "sum":
        return sum(feats)
    if type_res == "max":
        return jnp.stack(feats, 0).max(0)
    raise NotImplementedError(type_res)


class ResPool(nn.Module):
    dim_hid: int
    num_layers: int
    type_res: str           # none | sum | max | concat
    type_pool: str          # center | mean | max | sum | sort
    dropout: float
    act: str
    sort_k: int = 0
    prediction_task: str = "node"

    def _gather_targets(self, feat, targets):
        """feat [B, N, F] or head-major [B, H, N, dh], targets [B, T] ->
        [B*T, F] flattened like the reference's row-indexed
        block-diagonal batch.  The head-major gather touches T rows per
        subgraph and reshapes the tiny result — this is the ONE
        hm->flat conversion of the resident GAT chain (layers.py
        hm_chain), on [B*T, F] instead of L x [B, N, F]."""
        if feat.ndim == 4:
            b, h, n, dh = feat.shape
            out = jnp.take_along_axis(feat, targets[:, None, :, None],
                                      axis=2)             # [B, H, T, dh]
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, h * dh)
        out = jnp.take_along_axis(feat, targets[..., None], axis=1)
        return out.reshape(-1, feat.shape[-1])

    def _aggr_target_emb(self, feat_flat):
        """link task: src (*) dst (layers.py:145-152)."""
        if self.prediction_task == "node":
            return feat_flat
        f = feat_flat.shape[-1]
        pair = feat_flat.reshape(-1, 2, f)
        return pair[:, 0] * pair[:, 1]

    @nn.compact
    def __call__(self, feats_l, targets, node_mask, *, train: bool):
        """feats_l: per-conv-layer features [B, N, F]; returns [B', H]
        where B' = B (node) after target aggregation."""
        fact = Act(self.act, dim_out=self.dim_hid)
        tp, tr = self.type_pool, self.type_res

        if tp == "center":
            if tr == "none":
                feat_in = self._gather_targets(feats_l[-1], targets)
                if self.prediction_task == "node":
                    return feat_in      # layers.py:161-163: no MLP at all
            else:
                feat_in = f_residue(
                    [self._gather_targets(f, targets) for f in feats_l], tr)
            feat_in = self._aggr_target_emb(feat_in)
        elif tp in ("mean", "max", "sum"):
            if tr == "none":
                feat_pool = _pool_any(tp, feats_l[-1], node_mask)
                feat_root = self._gather_targets(feats_l[-1], targets)
            else:
                feat_pool = f_residue(
                    [_pool_any(tp, f, node_mask) for f in feats_l], tr)
                feat_root = f_residue(
                    [self._gather_targets(f, targets) for f in feats_l], tr)
            feat_in = jnp.concatenate(
                [self._aggr_target_emb(feat_root), feat_pool], axis=-1)
        elif tp == "sort":
            # sort pooling ranks full per-node feature rows — the one
            # readout that genuinely needs the flat layout
            def to_flat(f):
                if f.ndim != 4:
                    return f
                b, h, n, dh = f.shape
                return jnp.transpose(f, (0, 2, 1, 3)).reshape(b, n, h * dh)

            if tr == "none":
                feat_pool_in = to_flat(feats_l[-1])
                feat_root = self._gather_targets(feats_l[-1], targets)
            else:
                feat_pool_in = f_residue([to_flat(f) for f in feats_l], tr)
                feat_root = f_residue(
                    [self._gather_targets(f, targets) for f in feats_l], tr)
            pooled = masked_sort_pool(feat_pool_in, node_mask, self.sort_k)
            # nn_pool: Dropout -> Linear(k*F -> F) -> act (layers.py:100-105)
            h = pooled
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = fact(TorchLinear(feat_pool_in.shape[-1])(h))
            feat_in = jnp.concatenate([self._aggr_target_emb(feat_root), h],
                                      axis=-1)
        else:
            raise NotImplementedError(tp)

        # trailing Dropout -> Linear -> act -> f_norm (layers.py:106-118,199)
        h = feat_in
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = fact(TorchLinear(self.dim_hid)(h))
        scale = self.param("scale", nn.initializers.ones, (self.dim_hid,))
        offset = self.param("offset", nn.initializers.zeros, (self.dim_hid,))
        return norm_feat(h, scale, offset)


class EnsembleAggregator(nn.Module):
    """Softmax attention over ensemble branches (layers.py:236-296)."""

    dim_hid: int
    num_ensemble: int
    dropout: float = 0.0
    act: str = "leakyrelu"
    type_dropout: str = "none"      # none | feat | coef

    @nn.compact
    def __call__(self, xi, *, train: bool):
        fact = Act(self.act, dim_out=self.dim_hid)
        lin = TorchLinear(self.dim_hid)
        q = self.param("q", nn.initializers.ones, (self.dim_hid,))
        drop = (nn.Dropout(self.dropout, deterministic=not train)
                if self.dropout > 0 else (lambda x: x))
        omegas, xs = [], []
        for x in xi:
            if self.type_dropout == "coef":
                x_ = drop(x)
            elif self.type_dropout == "feat":
                x = drop(x)
                x_ = x
            else:
                x_ = x
            xs.append(x)
            omegas.append(fact(lin(x_)) @ q)
        w = jax.nn.softmax(jnp.stack(omegas, -1), axis=-1)
        return sum(w[:, i:i + 1] * xs[i] for i in range(len(xs)))

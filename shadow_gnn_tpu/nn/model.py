"""DeepGNN: the multi-branch ensemble shaDow-GNN model.

Architecture matches reference ``shaDow/models.py:16-237``:
per-ensemble-branch [feature-augment linears] -> L x conv -> JK collect
-> ResPool -> L2-normalize -> EnsembleAggregator -> MLP classifier; BCE
(x num_classes) or CE loss; label-input zeroing at targets during TRAIN
(:182-183).  Adjacency is normalized/edge-dropped ONCE per batch and
reused across the conv stack (the reference's is_normed protocol).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from shadow_gnn_tpu.nn.layers import NAME2LAYER, MLPLayer, TorchLinear
from shadow_gnn_tpu.nn.respool import EnsembleAggregator, ResPool
from shadow_gnn_tpu.ops.normalize import prepare_adj
from shadow_gnn_tpu.sampling.batch import SubgraphBatch, batch_aug_onehots


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model configuration (hashable)."""

    dim_feat_raw: int
    dim_feat_smooth: int
    dim_label_raw: int          # num classes
    dim_label_smooth: int       # label-as-feature input dim (0 = unused)
    aggr: str = "sage"
    num_layers: int = 3
    dim: int = 256
    act: str = "relu"
    layer_norm: str = "norm_feat"
    heads: int = 1
    residue: str = "none"
    pooling: str = "center"     # may carry sort budget: "sort-25"
    loss: str = "softmax"
    num_cls_layers: int = 1
    feature_augment: Tuple[str, ...] = ()
    feature_augment_ops: str = "sum"
    num_ensemble: int = 1
    branch_sharing: bool = False
    ensemble_act: str = "leakyrelu"
    ensemble_dropout: str = "none"
    prediction_task: str = "node"
    dropout: float = 0.0
    dropedge: float = 0.0
    # fused Pallas aggregation over bit-packed cached adjacency (TPU)
    packed_adj: bool = False
    # fused Pallas masked-attention kernel for GAT (ops/pallas_gat.py):
    # the [B,N,N,H] score chain stays in VMEM instead of HBM
    fused_gat: bool = False
    # activation dtype: 'float32' | 'bfloat16' (params/logits stay f32)
    compute_dtype: str = "float32"

    @property
    def type_pool(self) -> str:
        return self.pooling.split("-")[0]

    @property
    def sort_k(self) -> int:
        parts = self.pooling.split("-")
        return int(parts[1]) if len(parts) > 1 else 0

    @property
    def sigmoid_loss(self) -> bool:
        return self.loss == "sigmoid"

    @property
    def dim_feat_in(self) -> int:
        return self.dim_feat_smooth

    @property
    def mulhead(self) -> int:
        return max(1, self.heads)


class DeepGNN(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, batches: Sequence[SubgraphBatch],
                 feats: Sequence[jax.Array], *, mode_train: bool,
                 train: bool):
        """Forward over all ensemble branches.

        batches/feats: one entry per ensemble branch; feats[i] is the
        gathered [B, N, F_tot] node-feature block (smoothed feat +
        optional label features, already concatenated like the
        reference's feat_full after preprocessing).
        Returns (logits [B', C], emb_ens list of [B', H]).
        """
        cfg = self.cfg
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        emb_ens = []
        conv_defs = None
        for i in range(cfg.num_ensemble):
            batch, feat = batches[i], feats[i]
            feat = feat * batch.node_mask[..., None].astype(feat.dtype)
            if not (feat.dtype == jnp.bfloat16 and cdt == jnp.float32):
                feat = feat.astype(cdt)
            # else: defer the bf16->f32 widening to the consumers (first
            # conv matmul / aug add), where XLA fuses the convert for
            # free instead of materializing an f32 copy of [B, N, F];
            # value-identical since widening is exact
            # zero label inputs at targets during training (models.py:182).
            # ``mode_train`` may be a TRACED scalar so one compiled eval
            # program serves VALID/TEST and final TRAIN-mode passes alike.
            if cfg.dim_label_smooth > 0:
                t_oh = jax.nn.one_hot(batch.targets, feat.shape[1]).sum(1)
                keep = 1.0 - t_oh[..., None]                       # [B, N, 1]
                label_cols = jnp.arange(feat.shape[-1]) >= (
                    feat.shape[-1] - cfg.dim_label_smooth)
                zero_lab = jnp.asarray(mode_train) & label_cols[None, None, :]
                feat = jnp.where(zero_lab, feat * keep, feat)
            # feature augmentation (models.py:185-191)
            if cfg.feature_augment:
                augs = batch_aug_onehots(batch, cfg.feature_augment)
                dim_aug_out = (cfg.dim_feat_in if cfg.feature_augment_ops == "sum"
                               else cfg.dim)
                for a in sorted(cfg.feature_augment):
                    emb_a = TorchLinear(dim_aug_out,
                                        name=f"aug_{i}_{a}")(augs[a])
                    if cfg.feature_augment_ops == "sum":
                        base_cols = jnp.arange(feat.shape[-1]) < cfg.dim_feat_in
                        pad = feat.shape[-1] - cfg.dim_feat_in
                        emb_pad = jnp.pad(emb_a, ((0, 0), (0, 0), (0, pad)))
                        feat = feat + emb_pad * base_cols[None, None, :]
                    else:
                        feat = jnp.concatenate([feat, emb_a], axis=-1)
            # adjacency prep once per branch (is_normed protocol)
            de = cfg.dropedge if train else 0.0
            packed = (cfg.packed_adj and batch.adj_bits is not None
                      and cfg.aggr in ("gcn", "sage", "gin"))
            if packed and cdt == jnp.float32:
                # fused unpack+normalize+dropedge+aggregate Pallas kernel
                from shadow_gnn_tpu.ops.pallas_packed import packed_spmm
                norm = {"gcn": "sym", "sage": "rw", "gin": "gin"}[cfg.aggr]
                if de > 0:
                    seed = jax.random.randint(self.make_rng("dropedge"), (),
                                              0, 2**31 - 1)
                else:
                    seed = jnp.int32(0)
                bits = batch.adj_bits
                # match XLA's precision trade: bf16 MXU passes when the
                # session runs --matmul_precision bfloat16
                bf16 = (jax.config.jax_default_matmul_precision
                        in ("bfloat16", "tensorfloat32"))

                def agg(x, bits=bits, seed=seed, bf16=bf16):
                    return packed_spmm(bits, x, seed, norm, de, bf16)

                adj_norm, adj_struct = agg, None
            else:
                rng = self.make_rng("dropedge") if de > 0 else None
                adj_norm, adj_struct = prepare_adj(cfg.aggr, batch.adj, rng,
                                                   de)
                if cdt != jnp.float32 and not callable(adj_norm):
                    adj_norm = adj_norm.astype(cdt)
            # conv stack with optional branch sharing (models.py:86-100)
            layer_cls = NAME2LAYER[cfg.aggr]
            share = cfg.branch_sharing and i > 0
            # full head-major residency for the fused GAT (layers.py
            # hm_chain): activations stay [b, h, n, dh] across the conv
            # stack and the JK list; ResPool converts once
            import os as _os
            hm_chain = (cfg.aggr == "gat" and cfg.fused_gat
                        and _os.environ.get("SHADOW_GAT_LAYOUT",
                                            "headmajor") == "headmajor")
            x = feat
            xjk = []
            if not share:
                conv_defs = []
                for l in range(cfg.num_layers):
                    conv_defs.append(layer_cls(
                        dim_out=cfg.dim, dropout=cfg.dropout, act=cfg.act,
                        norm=cfg.layer_norm, mulhead=cfg.mulhead,
                        fused_att=cfg.fused_gat, hm_chain=hm_chain,
                        name=f"conv_{i}_{l}"))
            for conv in conv_defs:
                x = conv(x, adj_norm, adj_struct, batch.node_mask, train=train)
                if x.ndim == 4:
                    x = x * batch.node_mask[:, None, :, None]
                else:
                    x = x * batch.node_mask[..., None]
                xjk.append(x)
            emb = ResPool(
                dim_hid=cfg.dim, num_layers=cfg.num_layers,
                type_res=cfg.residue, type_pool=cfg.type_pool,
                dropout=cfg.dropout, act=cfg.act, sort_k=cfg.sort_k,
                prediction_task=cfg.prediction_task,
                name=f"res_pool_{i}")(xjk, batch.targets, batch.node_mask,
                                      train=train)
            # L2 normalize (models.py:200) — in f32 for stability
            emb = emb.astype(jnp.float32)
            emb = emb / jnp.clip(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12, None)
            emb_ens.append(emb)
        if cfg.num_ensemble == 1:
            emb_out = emb_ens[0]
        else:
            emb_out = EnsembleAggregator(
                dim_hid=cfg.dim, num_ensemble=cfg.num_ensemble,
                dropout=cfg.dropout, act=cfg.ensemble_act,
                type_dropout=cfg.ensemble_dropout,
                name="ensembler")(emb_ens, train=train)
        # classifier MLP stack (models.py:137-146)
        norm_type = "norm_feat" if cfg.prediction_task == "node" else "none"
        h = emb_out
        for l in range(cfg.num_cls_layers):
            last = l == cfg.num_cls_layers - 1
            h = MLPLayer(
                dim_out=cfg.dim_label_raw if last else cfg.dim,
                dropout=0.0 if last else cfg.dropout,
                act="I" if last else cfg.act,
                norm=norm_type,
                name=f"classifier_{l}")(h, train=train)
        return h.astype(jnp.float32), emb_ens


def loss_fn(cfg: ModelConfig, logits: jax.Array, labels: jax.Array) -> jax.Array:
    """models.py:156-166: BCE-with-logits x C, or CE over argmax labels."""
    if cfg.sigmoid_loss:
        lab = labels.astype(logits.dtype)
        bce = jnp.maximum(logits, 0) - logits * lab + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return bce.mean() * logits.shape[-1]
    if labels.ndim == 2:
        labels = labels.argmax(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def predict_fn(cfg: ModelConfig, logits: jax.Array) -> jax.Array:
    """models.py:206-207."""
    if cfg.sigmoid_loss:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)

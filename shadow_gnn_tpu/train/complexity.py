"""Inference FLOP accounting (--compute_complexity_only).

Equivalent of the reference's complexity path (main.py:299-331 +
per-layer .complexity() methods in layers.py): sample real batches,
accumulate per-layer op counts from the actual subgraph sizes, report
average inference cost per root.  The reference's GIN/sort-pool
estimators are broken (layers.py:529-536 hits a breakpoint, :219-228
has an np.pool typo); these are implemented correctly here.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from shadow_gnn_tpu import MODE2STR, VALID
from shadow_gnn_tpu.nn.model import ModelConfig


def _conv_ops(cfg: ModelConfig, n: float, e: float, f_in: int) -> float:
    """ops for one conv layer on a subgraph with n nodes / e edges."""
    f = cfg.dim
    if cfg.aggr == "gcn":                      # layers.py:438-444
        return e * f_in + n * f_in * f
    if cfg.aggr == "sage":                     # layers.py:486-494
        return n * f_in * f * 2 + e * f_in
    if cfg.aggr in ("gat", "gatscat"):         # layers.py:628-645
        ops = 2 * n * f_in * f + 2 * n * f
        ops += cfg.mulhead * (2 * e + 20 * e)
        ops += e * f
        return ops
    if cfg.aggr == "gin":
        return e * f_in + n * f_in + n * f_in * f + n * f * f
    return n * f_in * f                        # mlp / sgc / sign


def _respool_ops(cfg: ModelConfig, n_roots: float, n_nodes: float) -> float:
    f = cfg.dim
    l = cfg.num_layers
    ops = 0.0
    if cfg.type_pool in ("mean", "max", "sum"):
        mult = 1 if cfg.residue == "none" else l
        ops += n_nodes * f * mult
        dim_in = 2 * f * (l if cfg.residue in ("cat", "concat") else 1)
        ops += n_roots * dim_in * f
    elif cfg.type_pool == "sort":
        dim = f * (l if cfg.residue in ("cat", "concat") else 1)
        ops += n_roots * cfg.sort_k * dim * dim        # nn_pool linear
        ops += n_roots * 2 * dim * f
    elif cfg.residue != "none":                # center + JK
        dim_in = f * (l if cfg.residue in ("cat", "concat") else 1)
        ops += n_roots * dim_in * f
    return ops


def batch_complexity(cfg: ModelConfig, sizes: np.ndarray,
                     edges: np.ndarray, feat_dim: int) -> float:
    """Total inference ops for one batch of subgraphs (all branches)."""
    n = float(sizes.sum())
    e = float(edges.sum())
    b = float(sizes.shape[0])
    ops = 0.0
    if cfg.feature_augment:
        from shadow_gnn_tpu.sampling.batch import AUG2DIM
        dim_out = cfg.dim_feat_in if cfg.feature_augment_ops == "sum" else cfg.dim
        for a in cfg.feature_augment:
            ops += n * AUG2DIM[a] * dim_out
    f_in = feat_dim
    for l in range(cfg.num_layers):
        ops += _conv_ops(cfg, n, e, f_in)
        f_in = cfg.dim
    ops += _respool_ops(cfg, b, n)
    ops += b * cfg.dim * cfg.dim_label_raw       # classifier
    return ops * cfg.num_ensemble


def compute_complexity(trainer, num_roots_budget: int = 0,
                       modes=(VALID,), unit: str = "G") -> Dict[int, float]:
    """Average inference cost per root over sampled batches."""
    import jax
    norm = {"G": 1e9, "M": 1e6}[unit]
    out = {}
    for md in modes:
        trainer._ensure_tables(md)
        nb, roots, rows, labels, w, _, w_np = trainer._epoch_arrays(md)
        budget = num_roots_budget or int(w_np.sum())
        feat_dim = trainer.dim_feat_smooth + trainer.dim_label_smooth
        total_ops, total_roots, ib = 0.0, 0, 0
        arrays = trainer._mode_arrays(md)
        while total_roots < budget and ib < nb:
            batches, _ = trainer._sample_branch_batches(
                md, roots[ib], rows[ib], jax.random.PRNGKey(0), arrays)
            for b in batches:
                sizes = np.asarray(b.size)
                edges = np.asarray(b.adj.sum((1, 2)))
                total_ops += batch_complexity(trainer.model_cfg, sizes,
                                              edges, feat_dim)
            total_roots += int(np.asarray(w[ib]).sum())
            ib += 1
        out[md] = total_ops / max(total_roots, 1)
        print(f"Average inference cost per node: "
              f"[{MODE2STR[md]:^8s}]    {out[md] / norm:.3f}{unit}")
    return out

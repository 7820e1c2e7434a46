"""Graph preprocessing: feature smoothening + label propagation.

Reference ``shaDow/preproc.py``: SGC/SIGN-style feature smoothening
(sym-K-cat|sum|last, rw-..., APPNP-style ppr--... iteration with
Frobenius convergence, :20-42) and label-as-feature preparation with
train(-only) one-hot fill (:206-225).  Here the smoothening runs as
full-graph SpMM passes on device (ops/spmm.py) — the transductive
'full'-sampler path of smooth_signals_fullg (:143-165), which is the
only variant the shipped configs use.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from shadow_gnn_tpu import TRAIN, VALID, TEST
from shadow_gnn_tpu.ops.spmm import csr_to_edges, spmm_edges


def decode_smoothen_config(config_str: str):
    """preproc.py:271-297 config-string decoder.

    'sym-2-concat' -> ('sym', 2, 'concat', {})
    'ppr--concat-0.8-sym-none-0.015-100' -> ('ppr', 1, 'concat',
        {'alpha':0.8,'norm_adj':'sym','norm_feat':'none','thres':0.015,
         'itr_max':100})
    """
    parts = config_str.split("-")
    type_norm = parts[0].lower()
    if type_norm == "ppr":
        assert 4 <= len(parts) <= 8
        reduction, k = parts[2], parts[3]
        args = {"alpha": float(k), "norm_adj": "sym", "norm_feat": "none",
                "thres": 0.015, "itr_max": 100}
        if len(parts) >= 5:
            args["norm_adj"] = parts[4]
        if len(parts) >= 6:
            args["norm_feat"] = parts[5]
        if len(parts) == 7:
            args["thres"] = float(parts[6])
        if len(parts) == 8:
            args["itr_max"] = int(parts[7])
        return "ppr", 1, reduction, args
    assert len(parts) == 3, f"bad smoothen config {config_str}"
    return type_norm, int(parts[1]), parts[2], {}


def _norm_edges(indptr, indices, type_norm: str, add_self_edge: bool = False):
    """Edge list of the normalized full adjacency."""
    n = indptr.size - 1
    src, dst, val = csr_to_edges(indptr, indices)
    if add_self_edge:
        # append self loops absent from the graph (APPNP uses A + I)
        has_self = np.zeros(n, bool)
        has_self[src[src == dst]] = True
        extra = np.where(~has_self)[0].astype(np.int32)
        src = np.concatenate([src, extra])
        dst = np.concatenate([dst, extra])
        val = np.concatenate([val, np.ones(extra.size, np.float32)])
    deg = np.zeros(n, np.float64)
    np.add.at(deg, src, val)
    deg = np.clip(deg, 1.0, None)
    if type_norm == "sym":
        val = val / np.sqrt(deg[src]) / np.sqrt(deg[dst])
    elif type_norm == "rw":
        val = val / deg[src]
    else:
        raise NotImplementedError(type_norm)
    return src, dst, val.astype(np.float32)


def smooth_signal_full(indptr, indices, signal: np.ndarray, type_norm: str,
                       order: int, reduction: str, args: Dict,
                       n_shards: int = 0) -> np.ndarray:
    """Full-graph transductive smoothening (preproc.py:143-165).

    ``n_shards`` > 0 runs every SpMM pass edge-partitioned over an
    n-device mesh (parallel/edgepart.py ring SpMM) — the papers100M
    configuration where the propagation matrix and signal rows are
    sharded and the ring exchange overlaps local aggregation.
    """
    n = indptr.size - 1
    x = jnp.asarray(signal.astype(np.float32))

    def _make_sp(src, dst, val):
        if n_shards:
            from shadow_gnn_tpu.parallel.edgepart import make_ring_spmm
            return make_ring_spmm(src, dst, val, n, n_shards)
        s, d, v = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val)
        return lambda z: spmm_edges(s, d, v, z, n)

    if type_norm == "ppr":
        alpha_int = 1.0 - args["alpha"]     # flipped like preproc.py:28
        src, dst, val = _norm_edges(indptr, indices, args["norm_adj"],
                                    add_self_edge=args["norm_adj"] == "sym")
        sp = _make_sp(src, dst, val)
        h = x
        z = h
        for _ in range(args["itr_max"]):
            zk = (1 - alpha_int) * sp(z) + alpha_int * h
            delta = float(jnp.linalg.norm(z - zk))
            z = zk
            if delta < args["thres"]:
                break
        z_np = np.asarray(z)
        nf = args["norm_feat"]
        if nf == "l1":
            z_np = z_np / np.clip(np.abs(z_np).sum(1, keepdims=True), 1e-5,
                                  None)
        elif nf == "max":
            z_np = z_np / z_np.max()
        elif nf != "none":
            raise NotImplementedError(nf)
        if reduction in ("cat", "concat"):
            return np.concatenate([signal, z_np], axis=1)
        if reduction == "sum":
            return signal + z_np
        return z_np     # 'last'
    # sym / rw, K orders
    src, dst, val = _norm_edges(indptr, indices, type_norm,
                                add_self_edge=False)
    sp = _make_sp(src, dst, val)
    outs = [np.asarray(x)]
    cur = x
    for _ in range(order):
        cur = sp(cur)
        outs.append(np.asarray(cur))
    if reduction in ("cat", "concat"):
        return np.concatenate(outs, axis=1)
    if reduction == "sum":
        return np.sum(np.stack(outs, 0), 0)
    return outs[-1]     # 'last'


def smooth_signal_per_mode(trainer, signal: np.ndarray, type_norm: str,
                           order: int, reduction: str,
                           args: Dict) -> np.ndarray:
    """Inductive per-mode smoothening (preproc.py:167-202).

    Each mode's signal rows are smoothed over that mode's adjacency
    (adj_train for TRAIN, adj_full for VALID/TEST — the reference's FULL
    preprocess sampler returns the per-mode graph as the one batch) and
    written back only at that mode's entity rows; rows outside every
    split stay zero, matching the reference's zero-initialized
    ``signal_new`` (preproc.py:141).
    """
    assert trainer.task == "node", \
        "inductive smoothening preproc is node-task only (preproc.py:170)"
    out = None
    # VALID/TEST share adj_full: one pass covers both
    groups = [((VALID, TEST), trainer._host_adj[TEST]),
              ((TRAIN,), trainer._host_adj[TRAIN])]
    for modes, (indptr, indices) in groups:
        sm = smooth_signal_full(indptr, indices, signal, type_norm, order,
                                reduction, args)
        if out is None:
            out = np.zeros((trainer.num_nodes, sm.shape[1]), np.float32)
        for m in modes:
            ent = np.asarray(trainer.entity_set[m])
            out[ent] = sm[ent]
    return out


def prepare_raw_label(label_np: np.ndarray, entity_set, use_label: str,
                      num_nodes: int) -> np.ndarray:
    """One-hot train(+valid) labels as input features (preproc.py:206-225)."""
    assert use_label != "none"
    if label_np.ndim == 1:
        num_cls = int(label_np[~np.isnan(label_np.astype(np.float64))].max()) + 1
        feat_label = np.zeros((num_nodes, num_cls), np.float32)
        modes = [TRAIN] if use_label != "all" else [TRAIN, VALID]
        for md in modes:
            idx = np.asarray(entity_set[md])
            feat_label[idx, label_np[idx].astype(np.int64)] = 1.0
    else:
        num_cls = label_np.shape[1]
        feat_label = np.zeros((num_nodes, num_cls), np.float32)
        modes = [TRAIN] if use_label != "all" else [TRAIN, VALID]
        for md in modes:
            idx = np.asarray(entity_set[md])
            feat_label[idx] = label_np[idx].astype(np.float32)
    return feat_label


def preprocess_signals(trainer) -> Tuple[np.ndarray, int, int]:
    """Run the configured preprocessing; returns
    (feat_full_new, dim_feat_smooth, dim_label_smooth).

    Transductive data takes the full-graph path (smooth_signals_fullg's
    FULL+transductive branch, preproc.py:143-165); inductive data takes
    the per-mode path (preproc.py:167-202).
    """
    arch = trainer.arch
    indptr, indices = trainer._host_adj[TEST]
    feat = trainer.feat_np

    def _smooth(signal, cfg_str):
        tn, order, red, args = decode_smoothen_config(cfg_str)
        if trainer.is_transductive:
            return smooth_signal_full(indptr, indices, signal, tn, order,
                                      red, args)
        return smooth_signal_per_mode(trainer, signal, tn, order, red, args)

    if arch["feature_smoothen"] != "none":
        feat = _smooth(feat, arch["feature_smoothen"])
    dim_feat_smooth = feat.shape[1]
    dim_label_smooth = 0
    if arch["use_label"] != "none":
        assert trainer.task == "node"
        label_feat = prepare_raw_label(trainer.label_np, trainer.entity_set,
                                       arch["use_label"], trainer.num_nodes)
        if arch["label_smoothen"] != "none":
            label_feat = _smooth(label_feat, arch["label_smoothen"])
        dim_label_smooth = label_feat.shape[1]
        feat = np.concatenate([feat, label_feat], axis=1)
    return feat.astype(np.float32), dim_feat_smooth, dim_label_smooth

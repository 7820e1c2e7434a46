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


def smooth_signal_subgraph(trainer, signal: np.ndarray, type_norm: str,
                           order: int, reduction: str, args: Dict,
                           cfg_dict: Dict) -> np.ndarray:
    """Generic NON-full preprocess-phase sampler (preproc.py:167-202):
    run ``cfg_dict``'s sampler minibatch-wise over each mode's node
    targets, smooth the signal WITHIN each sampled subgraph (per-block
    normalized adjacency, add_self_edge=False like the reference's
    minibatch branch), and write back only the target rows; nodes
    outside every split stay zero (zero-initialized signal_new,
    preproc.py:141).  No shipped reference config uses this path — it
    exists for schema completeness — so it favors the exact pairwise
    'search' induction over cap tuning.
    """
    import jax
    import jax.numpy as jnp
    from shadow_gnn_tpu.sampling.batch import SamplerConfig, default_n_pad
    from shadow_gnn_tpu.sampling.samplers import (PPRTables,
                                                  sample_subgraphs)
    from shadow_gnn_tpu.sampling import ppr as ppr_mod
    from shadow_gnn_tpu.ops.normalize import adj_norm_rw, adj_norm_sym

    assert trainer.task == "node", \
        "LINK-task preproc sampling is NODE-wise (preproc.py:173)"
    method = cfg_dict["method"]
    cfg = SamplerConfig(
        method=method, n_pad=default_n_pad(cfg_dict, 1), num_targets=1,
        depth=int(cfg_dict.get("depth", 2)),
        budget=int(cfg_dict.get("budget", 20)),
        k=int(cfg_dict.get("k", 200)),
        alpha=float(cfg_dict.get("alpha", 0.85)),
        epsilon=float(cfg_dict.get("epsilon", 1e-5)),
        threshold=float(cfg_dict.get("threshold", 0.0)),
        aug_feats=())
    b = trainer.batch_size
    f_in = signal.shape[1]
    f_out = f_in * (1 + order) if reduction in ("cat", "concat") else f_in
    out = np.zeros((trainer.num_nodes, f_out), np.float32)
    sig_tab = jnp.asarray(
        np.concatenate([signal.astype(np.float32),
                        np.zeros((1, f_in), np.float32)]))  # pad row

    def norm_block(batch):
        adj = batch.adj
        if type_norm == "ppr" and args.get("norm_adj", "sym") == "sym":
            # the reference's ppr branch hardcodes self-edge
            # augmentation for sym (APPNP's A+I, preproc.py:65-66,
            # set-semantics: existing self edges stay 1)
            n = adj.shape[-1]
            eye = jnp.eye(n, dtype=adj.dtype) * batch.node_mask[..., None]
            return adj_norm_sym(jnp.maximum(adj, eye))
        if type_norm == "sym":
            # add_self_edge=False in the minibatch branch (preproc.py:185)
            return adj_norm_sym(adj)
        return adj_norm_rw(adj)

    def smooth_block(batch, sig):
        an = norm_block(batch)
        t_oh = jax.nn.one_hot(batch.targets[:, 0], cfg.n_pad,
                              dtype=sig.dtype)               # [B, N]
        if type_norm == "ppr":
            alpha_int = 1.0 - args["alpha"]
            h = sig
            z = sig

            def cond(c):
                z, it, delta = c
                return (it < args["itr_max"]) & (delta >= args["thres"])

            def body(c):
                z, it, _ = c
                zk = (1 - alpha_int) * jnp.einsum("bij,bjf->bif", an, z) \
                    + alpha_int * h
                return zk, it + 1, jnp.linalg.norm(zk - z)

            z, _, _ = jax.lax.while_loop(
                cond, body, (z, jnp.int32(0), jnp.float32(np.inf)))
            zt = jnp.einsum("bn,bnf->bf", t_oh, z)
            nf = args.get("norm_feat", "none")
            if nf == "l1":
                zt = zt / jnp.clip(jnp.abs(zt).sum(1, keepdims=True), 1e-5)
            elif nf == "max":
                zt = zt / zt.max()
            st = jnp.einsum("bn,bnf->bf", t_oh, sig)
            if reduction in ("cat", "concat"):
                return jnp.concatenate([st, zt], axis=1)
            if reduction == "sum":
                return st + zt
            return zt
        outs = [jnp.einsum("bn,bnf->bf", t_oh, sig)]
        cur = sig
        for _ in range(order):
            cur = jnp.einsum("bij,bjf->bif", an, cur)
            outs.append(jnp.einsum("bn,bnf->bf", t_oh, cur))
        if reduction in ("cat", "concat"):
            return jnp.concatenate(outs, axis=1)
        if reduction == "sum":
            return sum(outs)
        return outs[-1]

    @jax.jit
    def step(graph_arrays, tables, sig_tab, roots, rows):
        import dataclasses as _dc
        indptr, indices = graph_arrays
        g = _dc.replace(graph_meta, indptr=indptr, indices=indices)
        batch = sample_subgraphs(cfg, g, roots, rng=jax.random.PRNGKey(0),
                                 table_rows=rows, tables=tables)
        sig = sig_tab[jnp.minimum(batch.nodes, trainer.num_nodes)]
        sig = sig * batch.node_mask[..., None]
        return smooth_block(batch, sig)

    for m in (TRAIN, VALID, TEST):
        indptr, indices = trainer._host_adj[m]
        from shadow_gnn_tpu.data.graph import DeviceGraph
        graph_meta = DeviceGraph.from_csr(indptr, indices)
        graph_arrays = (graph_meta.indptr, graph_meta.indices)
        targets = np.asarray(trainer.entity_set[m], dtype=np.int64)
        tables = None
        if method in ("ppr", "ppr_st"):
            k_tab = cfg.k * (2 if method == "ppr_st" else 1)
            nb_l, sb_l = ppr_mod.ppr_push_host(indptr, indices, targets,
                                               k_tab, cfg.alpha, cfg.epsilon)
            tn, ts = ppr_mod.ppr_topk_tables(nb_l, sb_l, k_tab)
            tables = PPRTables(jnp.asarray(tn), jnp.asarray(ts))
        n_t = targets.size
        nb = -(-n_t // b)
        pad = nb * b - n_t
        roots_all = np.concatenate([targets,
                                    np.repeat(targets[:1], pad)])
        rows_all = np.concatenate([np.arange(n_t, dtype=np.int64),
                                   np.zeros(pad, np.int64)])
        for ib in range(nb):
            sl = slice(ib * b, (ib + 1) * b)
            sm = step(graph_arrays, tables, sig_tab,
                      jnp.asarray(roots_all[sl, None].astype(np.int32)),
                      jnp.asarray(rows_all[sl, None].astype(np.int32)))
            sm = np.asarray(sm)
            valid = b - (pad if ib == nb - 1 else 0)
            out[roots_all[sl][:valid]] = sm[:valid]
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

    preproc_cfgs = trainer.sampler_cfg_preproc.get("configs", [])
    from shadow_gnn_tpu.train.config import decouple_ensemble
    preproc_cfgs = decouple_ensemble(preproc_cfgs) if preproc_cfgs else []
    assert len(preproc_cfgs) <= 1, \
        "subgraph ensemble in preproc unsupported (preproc.py:180)"
    subg_cfg = (preproc_cfgs[0] if preproc_cfgs
                and preproc_cfgs[0]["method"] != "full" else None)

    def _smooth(signal, cfg_str):
        tn, order, red, args = decode_smoothen_config(cfg_str)
        if subg_cfg is not None:
            # generic preprocess-phase sampler: smooth within sampled
            # subgraphs, write back target rows (preproc.py:167-202)
            return smooth_signal_subgraph(trainer, signal, tn, order, red,
                                          args, subg_cfg)
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

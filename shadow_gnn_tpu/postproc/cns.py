"""Correct & Smooth postprocessing as full-graph SpMM passes on device.

Reference ``shaDow/postproc_CnS.py`` implements the "smooth" step of
C&S with DGL mean-message-passing over the OGB graph (reverse edges +
self loops added, :33-47; 50 iterations of
``y <- alpha * mean_neigh(y) + (1-alpha) * y0`` with optional D^{+/-1/2}
scaling and clamp(0,1), :50-77; train rows replaced by one-hot ground
truth, :93-94).  Here the propagation runs as jitted SpMM over the
framework's own stored graph — no DGL/OGB dependency.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shadow_gnn_tpu import TRAIN, VALID, TEST
from shadow_gnn_tpu.ops.spmm import spmm_edges


def _cs_edges(indptr: np.ndarray, indices: np.ndarray):
    """reverse edges + self loops (postproc_CnS.py:33-47), dedup-free:
    DGL add_edges keeps duplicates, so the mean aggregation weights
    duplicated edges twice — we reproduce that by concatenation."""
    n = indptr.size - 1
    deg = np.diff(indptr)
    src = np.repeat(np.arange(n, dtype=np.int32), deg)
    dst = indices.astype(np.int32)
    no_self = src != dst
    s2 = np.concatenate([src, dst, np.arange(n, dtype=np.int32)])
    d2 = np.concatenate([dst, src, np.arange(n, dtype=np.int32)])
    keep = np.concatenate([no_self, no_self, np.ones(n, bool)])
    return s2[keep], d2[keep]


def general_outcome_correlation(indptr, indices, y0: np.ndarray,
                                n_prop: int = 50, alpha: float = 0.8,
                                use_norm: bool = False,
                                clamp: Optional[Tuple[float, float]] = (0., 1.),
                                n_shards: int = 0) -> np.ndarray:
    """y <- alpha * A_mean y + (1-alpha) y0, n_prop times.

    ``n_shards`` > 0 runs the whole propagation edge-partitioned over an
    n-device mesh (parallel/edgepart.py): propagation matrix and y rows
    sharded, ring exchange overlapped with the local aggregation — the
    papers100M-scale C&S configuration.
    """
    if n_shards:
        from shadow_gnn_tpu.parallel.edgepart import (
            distributed_outcome_correlation)
        return distributed_outcome_correlation(
            indptr, indices, y0, n_prop=n_prop, alpha=alpha,
            use_norm=use_norm, clamp=clamp, n_devices=n_shards)
    n = indptr.size - 1
    src, dst = _cs_edges(indptr, indices)
    # DGL mean over in-edges: y'[v] = mean_{u->v} y[u]
    in_deg = np.zeros(n, np.float32)
    np.add.at(in_deg, dst, 1.0)
    in_deg = np.clip(in_deg, 1.0, None)
    s, d = jnp.asarray(dst), jnp.asarray(src)   # rows = dst, gather src
    val = jnp.asarray((1.0 / in_deg[dst]).astype(np.float32))
    deg_j = jnp.asarray(in_deg)

    # edge/degree arrays enter as ARGUMENTS: closure-captured buffers
    # are serialized into the program on this backend (2E+N i32/f32 is
    # ~26 GB at papers100M — it would break the remote-compile pipe)
    @jax.jit
    def run(s, d, val, deg_j, y0j):
        def body(y, _):
            if use_norm:
                y = y * jax.lax.rsqrt(deg_j)[:, None]
            y = spmm_edges(s, d, val, y, n)
            if use_norm:
                y = y * jnp.sqrt(deg_j)[:, None]
            y = alpha * y + (1 - alpha) * y0j
            if clamp is not None:
                y = jnp.clip(y, clamp[0], clamp[1])
            return y, None
        y, _ = jax.lax.scan(body, y0j, None, length=n_prop)
        return y

    return np.asarray(run(s, d, val, deg_j,
                          jnp.asarray(y0.astype(np.float32))))


def correct_smooth(indptr, indices, label_full: np.ndarray,
                   node_set: Dict[int, np.ndarray], pred_list: List[np.ndarray],
                   use_norm: bool, alpha: float, n_shards: int = 0):
    """Run the smooth step for each stored prediction matrix; returns
    (acc_orig, acc_cs) dicts of per-run accuracy lists."""
    num_cls = pred_list[0].shape[1]
    lab = label_full.astype(np.int64)
    acc_orig = {TRAIN: [], VALID: [], TEST: []}
    acc_cs = {TRAIN: [], VALID: [], TEST: []}

    def acc(y, mode):
        idx = node_set[mode]
        return float((y[idx].argmax(1) == lab[idx]).mean())

    for pred in pred_list:
        y = pred.copy().astype(np.float32)
        tr = node_set[TRAIN]
        y[tr] = np.eye(num_cls, dtype=np.float32)[lab[tr]]
        for m in (TRAIN, VALID, TEST):
            acc_orig[m].append(acc(y, m))
        y_s = general_outcome_correlation(indptr, indices, y, n_prop=50,
                                          alpha=alpha, use_norm=use_norm,
                                          clamp=(0.0, 1.0),
                                          n_shards=n_shards)
        for m in (TRAIN, VALID, TEST):
            acc_cs[m].append(acc(y_s, m))
    return acc_orig, acc_cs


def run_correct_smooth(args):
    """CLI entry: --postproc_configs yml with method: cs,
    dir_pred_mat: [...], hyperparameter: {norm_sym, alpha}."""
    import glob
    import yaml
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.train.config import parse_config

    with open(args.postproc_configs) as f:
        cfg = yaml.safe_load(f)
    assert cfg["method"].lower() == "cs"
    dirs = list(cfg.get("dir_pred_mat", []))
    if args.postproc_dir and args.postproc_dir not in dirs:
        dirs.append(args.postproc_dir)
    preds = []
    for d in dirs:
        cand = sorted(glob.glob(f"{d}/pred_mat_*.npy")) + \
            sorted(glob.glob(f"{d}/__pred_mat_*.npy"))
        if not cand:
            # generate the prediction matrix by running inference
            preds.append(_gen_pred_mat(args, d))
        else:
            preds.append(np.load(cand[0]))
    raw = load_data(args.data_dir, args.dataset,
                    {"to_undirected": True, "transductive": True})
    acc_orig, acc_cs = correct_smooth(
        raw.indptr_full, raw.indices_full, raw.label_full, raw.node_set,
        preds, cfg["hyperparameter"]["norm_sym"],
        cfg["hyperparameter"]["alpha"],
        n_shards=int(cfg["hyperparameter"].get("n_shards", 0)))
    print("original acc:", {k: np.mean(v) for k, v in acc_orig.items()})
    print("C&S acc:     ", {k: np.mean(v) for k, v in acc_cs.items()})
    return 0


def _gen_pred_mat(args, run_dir):
    """Full train/valid/test inference filling pred_mat[raw_idx]
    (reference main.py:237-249)."""
    import glob
    import os
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.train.config import DATA_METRIC, parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    ymls = [f for f in os.listdir(run_dir)
            if f.rsplit(".", 1)[-1] in ("yml", "yaml")]
    parsed = parse_config(f"{run_dir}/{ymls[0]}")
    metrics = Metrics(args.dataset, parsed["arch_gnn"]["loss"] == "sigmoid",
                      DATA_METRIC.get(args.dataset, "accuracy"), 1)
    logger = Logger(metrics, run_dir, no_log=True)
    raw = load_data(args.data_dir, args.dataset, parsed["config_data"])
    trainer = Trainer(args.dataset, args.data_dir, raw, parsed, metrics,
                      logger, seed=0)
    pm = sorted(glob.glob(f"{run_dir}/saved_model_*.msgpack"))
    trainer.params, _ = Logger.load_checkpoint(trainer.params, None, pm[-1])
    pred_mat = trainer.predict_full()
    np.save(f"{run_dir}/pred_mat_gen.npy", pred_mat)
    return pred_mat

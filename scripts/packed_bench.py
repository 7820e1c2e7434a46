"""Packed Pallas aggregation at its target shape — retire-or-keep data.

The fused bit-unpack+normalize+dropedge+aggregate kernel
(`ops/pallas_packed.py`) was neutral-to-slower at the round-1 flagship
block size (N=208, dim=256) and was kept opt-in, "aimed at
k=400/dim=800-class blocks".  This measures exactly that class — the
papers100M leaderboard shape on SAGE (the kernel covers gcn/sage/gin,
not GAT): N_pad=408, dim=800, batch 64, cached PPR branch — packed
(`--packed_adj`) vs the XLA dense unpack+einsum path, same everything
else (rbg PRNG, bf16 matmul precision).

Usage:  python scripts/packed_bench.py [--nodes 250000] [--k 400]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(g, packed: bool, k: int, dim: int, batch_size: int) -> dict:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    cfg = {
        "data": {"transductive": True},
        "architecture": {
            "dim": dim, "aggr": "sage", "loss": "softmax", "num_layers": 3,
            "act": "relu", "residue": "none", "pooling": "center",
        },
        "hyperparameter": {"end": 1, "lr": 5e-4, "dropout": 0.35,
                           "dropedge": 0.1, "batch_size": batch_size},
        "sampler": [{"method": "ppr", "phase": "train", "k": [k],
                     "epsilon": [1e-5]}],
    }
    parsed = parse_config(cfg)
    metrics = Metrics("toy", False, "accuracy", 1)
    logger = Logger(metrics, "/tmp/bench_log", no_log=True)
    cache_dir = "/tmp/shadow_packedbench"
    os.makedirs(cache_dir, exist_ok=True)
    tr = Trainer("packedbench", cache_dir, g, parsed, metrics, logger,
                 seed=0, use_device_ppr=None, prng_impl="rbg",
                 matmul_precision="bfloat16", packed_adj=packed)
    tr._ensure_tables(TRAIN)
    tr._ensure_caches(TRAIN)
    nb, roots, rows, labels, w, _labels_np, w_np = tr._epoch_arrays(TRAIN)
    fn = tr._make_epoch_fn(TRAIN, nb, True)
    rng = jax.random.PRNGKey(0)
    arrays = tr._mode_arrays(TRAIN)
    pp, o = tr.params, tr.opt_state
    t0 = time.time()
    pp, o, losses, preds, ovf = fn(pp, o, rng, roots, rows, labels, w, arrays)
    _ = float(losses.sum())
    t_first = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        pp, o, losses, preds, ovf = fn(pp, o, rng, roots, rows, labels, w,
                                       arrays)
        _ = float(losses.sum())
        times.append(time.time() - t0)
    t_epoch = min(times)
    num_subg = int(w_np.sum())
    return {
        "packed_adj": packed,
        "n_pad": int(tr.branches[0]["cfg"][TRAIN].n_pad),
        "dim": dim,
        "sustained_step_ms": round(t_epoch / nb * 1e3, 2),
        "sustained_subg_per_s": round(num_subg / t_epoch, 1),
        "first_epoch_incl_compile_s": round(t_first, 1),
        "loss_check": round(float(np.asarray(losses)[-1]), 4),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=250_000)
    ap.add_argument("--k", type=int, default=400)
    ap.add_argument("--dim", type=int, default=800)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--roots", type=int, default=4096)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    g = make_synthetic_dataset(num_nodes=args.nodes, avg_deg=15.0,
                               num_feat=128, num_classes=7, seed=0)
    g.node_set[TRAIN] = g.node_set[TRAIN][:args.roots]
    out = [run(g, packed, args.k, args.dim, args.batch)
           for packed in (False, True)]
    print(json.dumps(out, indent=1))

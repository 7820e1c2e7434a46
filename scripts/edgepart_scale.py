"""Edge-partitioned path at scale on the virtual CPU mesh.

Validates that the fully partitioned train step (parallel/edgepart.py:
CSR + feature table + PPR tables all row-sharded, collective row
fetches, hub induction) runs end to end on a power-law graph large
enough that per-shard residency matters, and reports the per-chip
memory ledger the path buys — the hardware-independent half of the
papers100M story (wall-clock on shared host cores is NOT an ICI
prediction).

Usage: python scripts/edgepart_scale.py [--nodes 1000000] [--devices 8]
       [--steps 5] [--k 100] [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--avg_deg", type=float, default=12.0)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max_roots", type=int, default=8192,
                    help="truncate the train split (per-step throughput "
                         "needs few roots; PPR precompute scales with "
                         "the split size)")
    args = ap.parse_args()

    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.parallel.edgepart import (
        make_edgepart_train_step, shard_csr)
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    t0 = time.time()
    g = make_synthetic_dataset(num_nodes=args.nodes, avg_deg=args.avg_deg,
                               num_feat=args.feat, num_classes=16, seed=0,
                               power_law=True)
    deg = np.diff(g.indptr_full)
    print(f"graph: {args.nodes} nodes, {g.indices_full.size} directed "
          f"edges, max deg {int(deg.max())}, built in {time.time()-t0:.0f}s",
          flush=True)
    from shadow_gnn_tpu import TRAIN as _TRAIN
    g.node_set[_TRAIN] = g.node_set[_TRAIN][:args.max_roots]
    cfg = {
        "data": {"transductive": True},
        "architecture": {"dim": args.dim, "aggr": "sage", "loss": "softmax",
                         "num_layers": 3, "act": "relu",
                         "feature_augment": "hops", "residue": "none",
                         "pooling": "center"},
        "hyperparameter": {"end": 1, "lr": 1e-3, "dropout": 0.1,
                           "dropedge": 0.0, "batch_size": args.batch},
        "sampler": [{"method": "ppr", "phase": "train", "k": [args.k],
                     "epsilon": [1e-5]}],
    }
    parsed = parse_config(cfg)
    m = Metrics("epscale", False, "accuracy", 1)
    logger = Logger(m, "/tmp/edgepart_scale_run", no_log=True)
    t0 = time.time()
    # native host push for the PPR tables: the device power iteration
    # materializes [T, N] dense iterates — fine on a TPU, pathological
    # on this script's CPU-mesh backend
    tr = Trainer("epscale", "", g, parsed, m, logger, seed=0,
                 use_device_ppr=None)
    tr._ensure_tables(TRAIN)
    print(f"init + PPR tables: {time.time()-t0:.0f}s", flush=True)
    scfg = tr.branches[0]["cfg"][TRAIN]
    print(f"induction={scfg.induction} deg_cap={scfg.deg_cap} "
          f"cand_cap={scfg.cand_cap} n_pad={scfg.n_pad}", flush=True)

    # per-chip residency ledger (the point of the path)
    csr = shard_csr(np.asarray(tr.graph[TRAIN].indptr),
                    np.asarray(tr.graph[TRAIN].indices), args.devices)
    bytes_csr = (csr.indptr.size * 4 + csr.indices.size * 4) // args.devices
    bytes_feat = tr.feat_np.nbytes // args.devices
    tabs = tr.tables[TRAIN][0]
    bytes_tab = (np.asarray(tabs.neighs).nbytes
                 + np.asarray(tabs.scores).nbytes) // args.devices
    repl_csr = (np.asarray(tr.graph[TRAIN].indptr).nbytes
                + np.asarray(tr.graph[TRAIN].indices).nbytes)
    ledger = {
        "csr_MB_per_chip": round(bytes_csr / 1e6, 1),
        "feat_MB_per_chip": round(bytes_feat / 1e6, 1),
        "tables_MB_per_chip": round(bytes_tab / 1e6, 1),
        "replicated_csr_MB_would_be": round(repl_csr / 1e6, 1),
        "replicated_feat_MB_would_be": round(tr.feat_np.nbytes / 1e6, 1),
    }
    print(json.dumps(ledger), flush=True)

    nb, roots, rows, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    t0 = time.time()
    step, shard_batch, replicate = make_edgepart_train_step(
        tr, TRAIN, args.devices)
    params = replicate(tr.params)
    opt_state = replicate(tr.opt_state)
    xs = shard_batch((roots[0], rows[0], labels[0], w[0]))
    params, opt_state, loss = step(params, opt_state,
                                   jax.random.PRNGKey(0), *xs)
    print(f"first step (incl. compile + sharding): {time.time()-t0:.0f}s, "
          f"loss {float(loss):.4f}", flush=True)
    t0 = time.time()
    losses = []
    for i in range(args.steps):
        ib = (i + 1) % nb
        xs = shard_batch((roots[ib], rows[ib], labels[ib], w[ib]))
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i + 1), *xs)
        losses.append(float(loss))          # forces device->host sync
    dt = (time.time() - t0) / args.steps
    out = {
        "preset": f"{args.nodes//1000}k_pl_edgepart",
        "n_devices": args.devices,
        "step_ms": round(dt * 1e3, 1),
        "subg_per_s": round(args.batch / dt, 1),
        "losses": [round(x, 4) for x in losses],
        **ledger,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

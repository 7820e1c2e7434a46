"""Virtual-mesh scaling curve: step time vs n_devices, fixed global batch.

Real multi-chip hardware is unavailable here (one v5e behind the axon
tunnel), so this measures the closest available proxy for the >=80%
scaling target (BASELINE.md): the full DP train step (parallel/dp.py)
and the row-sharded-feature step (parallel/partition.py) on an
n in {1,2,4,8} virtual CPU mesh with the GLOBAL batch held fixed, plus
the analytic per-step collective volume of the sharded-feature
all_gather/psum_scatter exchange.

Caveat printed with the results: on one 4-core host the virtual devices
share cores and the n=1 XLA CPU device is itself multi-threaded, so
wall-clock efficiency here is a LOWER bound sanity proxy, not an ICI
prediction; the collective-volume table is the hardware-independent
part (volume per step rides ICI at ~100GB/s/link on v5e, giving the
sub-ms estimates in BENCH.md).

Usage: python scripts/scaling_curve.py [--nodes 50000] [--batch 64]
       [--steps 10] [--k 100]
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
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_trainer(nodes, batch, k, dim):
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer
    g = make_synthetic_dataset(num_nodes=nodes, avg_deg=10, num_feat=64,
                               num_classes=8, seed=0, power_law=True)
    cfg = {
        "data": {"transductive": True},
        "architecture": {"dim": dim, "aggr": "sage", "loss": "softmax",
                         "num_layers": 3, "act": "relu",
                         "feature_augment": "hops", "residue": "none",
                         "pooling": "center"},
        "hyperparameter": {"end": 1, "lr": 1e-3, "dropout": 0.1,
                           "dropedge": 0.0, "batch_size": batch},
        "sampler": [{"method": "ppr", "phase": "train", "k": [k],
                     "epsilon": [1e-5]}],
    }
    parsed = parse_config(cfg)
    m = Metrics("scal", False, "accuracy", 1)
    logger = Logger(m, "/tmp/scaling_curve_run", no_log=True)
    return Trainer("scal", "", g, parsed, m, logger, seed=0)


def time_steps(step, params, opt_state, xs, steps):
    rng = jax.random.PRNGKey(0)
    p, o, loss = step(params, opt_state, rng, *xs)   # compile + warmup
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        p, o, loss = step(p, o, jax.random.PRNGKey(i + 1), *xs)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def collective_bytes(n, batch, n_pad, feat_dim):
    """Per-step exchanged bytes of the sharded-feature gather
    (partition.sharded_feat_gather): all_gather of the node-id shard +
    psum_scatter of the gathered feature rows."""
    bl = batch // n
    ag = (n - 1) * bl * n_pad * 4                    # int32 ids received/dev
    rs = (n - 1) * bl * n_pad * feat_dim * 4         # f32 rows sent/dev
    return (ag + rs) * n                             # total over the mesh


def edgepart_collective_bytes(n, batch, n_pad, feat_dim, k, fetch_cap, t=1):
    """Per-step exchanged bytes of the fully edge-partitioned step
    (edgepart.make_edgepart_train_step): table-row gather (ids + scores),
    adjacency-row fetch (nbrs + degrees), feature rows — each an
    all_gather of requests + psum_scatter of responses."""
    bl = batch // n
    per_dev = 0
    per_dev += (n - 1) * bl * t * 4 + (n - 1) * bl * t * k * 8   # tables
    per_dev += (n - 1) * bl * n_pad * 4                          # adj req
    per_dev += (n - 1) * bl * n_pad * (fetch_cap * 4 + 4)        # adj resp
    per_dev += (n - 1) * bl * n_pad * 4                          # feat req
    per_dev += (n - 1) * bl * n_pad * feat_dim * 4               # feat resp
    return per_dev * n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.parallel.dp import make_dp_train_step
    from shadow_gnn_tpu.parallel.partition import make_sharded_train_step

    tr = build_trainer(args.nodes, args.batch, args.k, args.dim)
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    xs_np = (roots[0], rows[0], labels[0], w[0])
    n_pad = tr.branches[0]["cfg"][TRAIN].n_pad
    feat_dim = tr.feat_np.shape[1]
    print(f"graph: {args.nodes} nodes power-law, sage-3 dim={args.dim} "
          f"ppr k={args.k}, global batch {args.batch}, n_pad={n_pad}",
          flush=True)

    results = []
    for n in (1, 2, 4, 8):
        row = {"n_devices": n}
        step, shard, repl = make_dp_train_step(tr, TRAIN, n)
        ms = time_steps(step, repl(tr.params), repl(tr.opt_state),
                        shard(xs_np), args.steps)
        row["dp_step_ms"] = round(ms, 2)
        step, shard, repl, _ = make_sharded_train_step(tr, TRAIN, n)
        ms = time_steps(step, repl(tr.params), repl(tr.opt_state),
                        shard(xs_np), args.steps)
        row["sharded_step_ms"] = round(ms, 2)
        row["sharded_collective_MB"] = round(
            collective_bytes(n, args.batch, n_pad, feat_dim) / 1e6, 3)
        from shadow_gnn_tpu.parallel.edgepart import make_edgepart_train_step
        step, shard, repl = make_edgepart_train_step(tr, TRAIN, n)
        ms = time_steps(step, repl(tr.params), repl(tr.opt_state),
                        shard(xs_np), args.steps)
        row["edgepart_step_ms"] = round(ms, 2)
        cfg0 = tr.branches[0]["cfg"][TRAIN]
        fc = cfg0.deg_cap if (cfg0.induction == "hub"
                              and cfg0.deg_cap > 0) else tr.graph[TRAIN].max_deg
        row["edgepart_collective_MB"] = round(
            edgepart_collective_bytes(n, args.batch, n_pad, feat_dim,
                                      cfg0.k, min(fc, tr.graph[TRAIN].max_deg)
                                      ) / 1e6, 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    t1 = results[0]
    for row in results:
        n = row["n_devices"]
        row["dp_eff"] = round(t1["dp_step_ms"] / (n * row["dp_step_ms"]), 3)
        row["sharded_eff"] = round(
            t1["sharded_step_ms"] / (n * row["sharded_step_ms"]), 3)
        row["edgepart_eff"] = round(
            t1["edgepart_step_ms"] / (n * row["edgepart_step_ms"]), 3)
    print(json.dumps({"curve": results}))


if __name__ == "__main__":
    main()

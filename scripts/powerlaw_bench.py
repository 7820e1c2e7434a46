"""Power-law (hub-heavy) end-to-end training bench — VERDICT #4 closeout.

Round 1's flagship bench ran on an Erdős–Rényi graph, which hides the
candidate-cap blowup hub members used to cause: one 1e4-degree node in
any PPR scope inflated the static candidate buffers for every batch.
The 'hub' induction strategy (sampling/induction.py:123) bounds the
buffers by ``n_pad * deg_cap`` regardless of degree distribution, like
the reference's per-thread hash loop (ParallelSampler.cpp:378-427) is.

This script measures the full train pipeline (sample + induce + fwd +
bwd + Adam) on power-law graphs with max degree >= 1e4 and reports:
  * max degree, selected induction strategy + caps,
  * cold + sustained throughput (subgraphs/s),
  * overflow counter (must be 0: zero dropped edges),
  * device memory stats when the backend exposes them.

Presets:
  flickr_er  — round-1 flagship graph (89k nodes, ER), the comparator
  flickr_pl  — same scale, zipf(0.75) endpoints (max deg ~1e4)
  10m_pl     — 10M nodes / ~120M directed edges, zipf endpoints
               (papers100M-path at 1/10 scale, hub degrees ~1e5)

Usage:  python scripts/powerlaw_bench.py --preset flickr_pl
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "flickr_er": dict(num_nodes=89_250, avg_deg=10.0, num_feat=500,
                      power_law=False, k=200, dim=256, eps=1e-6),
    "flickr_pl": dict(num_nodes=89_250, avg_deg=10.0, num_feat=500,
                      power_law=True, k=200, dim=256, eps=1e-6),
    "10m_pl": dict(num_nodes=10_000_000, avg_deg=12.0, num_feat=128,
                   power_law=True, k=200, dim=256, eps=1e-5),
    # CPU smoke preset for CI-style verification
    "smoke_pl": dict(num_nodes=5_000, avg_deg=10.0, num_feat=32,
                     power_law=True, k=50, dim=64, eps=1e-4),
}


def run(preset: str, n_roots: int = 8192, batch_size: int = 64) -> dict:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    p = PRESETS[preset]
    t0 = time.time()
    g = make_synthetic_dataset(num_nodes=p["num_nodes"], avg_deg=p["avg_deg"],
                               num_feat=p["num_feat"], num_classes=7, seed=0,
                               power_law=p["power_law"])
    deg = np.diff(g.indptr_full)
    t_gen = time.time() - t0
    print(f"[{preset}] graph: {p['num_nodes']} nodes, "
          f"{g.indices_full.size} csr entries, max deg {int(deg.max())}, "
          f"gen {t_gen:.0f}s", file=sys.stderr)
    g.node_set[TRAIN] = g.node_set[TRAIN][:n_roots]
    cfg = {
        "data": {"transductive": True},
        "architecture": {
            "dim": p["dim"], "aggr": "sage", "loss": "softmax",
            "num_layers": 3, "act": "relu", "feature_augment": "hops",
            "residue": "none", "pooling": "center",
        },
        "hyperparameter": {"end": 1, "lr": 5e-4, "dropout": 0.45,
                           "dropedge": 0.05, "batch_size": batch_size},
        "sampler": [{"method": "ppr", "phase": "train", "k": [p["k"]],
                     "epsilon": [p["eps"]]}],
    }
    parsed = parse_config(cfg)
    metrics = Metrics("toy", False, "accuracy", 1)
    logger = Logger(metrics, "/tmp/bench_log", no_log=True)
    cache_dir = f"/tmp/shadow_plbench_{preset}"
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    tr = Trainer(f"plbench_{preset}", cache_dir, g, parsed, metrics,
                 logger, seed=0, use_device_ppr=None, prng_impl="rbg",
                 matmul_precision="bfloat16")
    tr._ensure_tables(TRAIN)
    t_init = time.time() - t0
    scfg = tr.branches[0]["cfg"][TRAIN]
    print(f"[{preset}] init+ppr {t_init:.0f}s; induction={scfg.induction} "
          f"cand_cap={scfg.cand_cap} deg_cap={scfg.deg_cap} "
          f"hub_slots={scfg.hub_slots} n_pad={scfg.n_pad}", file=sys.stderr)

    nb, roots, rows, labels, w, labels_np, w_np = tr._epoch_arrays(TRAIN)
    fn = tr._make_epoch_fn(TRAIN, nb, True)
    rng = jax.random.PRNGKey(0)
    arrays = tr._mode_arrays(TRAIN)
    pp, o = tr.params, tr.opt_state
    t0 = time.time()
    pp, o, losses, preds, ovf = fn(pp, o, rng, roots, rows, labels, w, arrays)
    _ = float(losses.sum())
    t_first = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        pp, o, losses, preds, ovf = fn(pp, o, rng, roots, rows, labels, w,
                                       arrays)
        _ = float(losses.sum())
        times.append(time.time() - t0)
    t_cold = min(times)
    overflow_cold = int(ovf)
    num_subg = int(w_np.sum())

    t0 = time.time()
    tr._ensure_caches(TRAIN)
    t_cache = time.time() - t0
    fn2 = tr._make_epoch_fn(TRAIN, nb, True)
    arrays2 = tr._mode_arrays(TRAIN)
    pp, o, losses, preds, ovf = fn2(pp, o, rng, roots, rows, labels, w,
                                    arrays2)
    _ = float(losses.sum())
    times = []
    for _ in range(5):
        t0 = time.time()
        pp, o, losses, preds, ovf = fn2(pp, o, rng, roots, rows, labels, w,
                                        arrays2)
        _ = float(losses.sum())
        times.append(time.time() - t0)
    t_sust = min(times)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if key in stats:
                mem[key + "_gb"] = round(stats[key] / 2**30, 2)
    except Exception:
        pass

    return {
        "preset": preset,
        "num_nodes": p["num_nodes"],
        "csr_entries": int(g.indices_full.size),
        "max_degree": int(deg.max()),
        "induction": scfg.induction,
        "cand_cap": int(scfg.cand_cap),
        "deg_cap": int(scfg.deg_cap),
        "hub_slots": int(scfg.hub_slots),
        "n_pad": int(scfg.n_pad),
        "overflow_dropped_edges": overflow_cold + int(ovf),
        "cold_subg_per_s": round(num_subg / t_cold, 1),
        "sustained_subg_per_s": round(num_subg / t_sust, 1),
        "cold_epoch_s": round(t_cold, 3),
        "sustained_epoch_s": round(t_sust, 3),
        "first_epoch_incl_compile_s": round(t_first, 1),
        "cache_build_s": round(t_cache, 1),
        "init_incl_ppr_s": round(t_init, 1),
        "graph_gen_s": round(t_gen, 1),
        "memory": mem,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), action="append",
                    required=True)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    out = [run(pre) for pre in args.preset]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""GAT at leaderboard shapes: step time + MFU/bandwidth breakdown.

VERDICT #5 closeout.  Round 1 never ran GAT at the shapes the reference
uses for its OGB leaderboard entries; the dense-attention blocks
([B, N, N, heads] scores, nn/layers.py:199) were flagged memory-risky
at the papers100M shape.  This measures the two shapes end to end:

  products_gat5  — GAT 5L dim=512 heads=4 PPR k=150 batch=128
                   (config_train/products/leaderboard/gat_ppr.yml)
  papers_gat3    — GAT 3L dim=800 heads=4 PPR k=400 batch=64
                   (config_train/papers100M/leaderboard/gat_ppr.yml)

both on a power-law synthetic graph (hub induction active), with the
reference's act=prelu, residue=max, pooling=max.  label_smoothen
(products) only widens the input features; it is omitted here because
the measured quantity is the model step at shape.

Reported per shape:
  * sustained step time + subgraphs/s,
  * FLOPs + bytes accessed from the COMPILED program (XLA
    cost_analysis), giving model FLOP utilization vs the v5e bf16 peak
    (197 TFLOP/s) and HBM bandwidth utilization vs 819 GB/s,
  * peak device memory when the backend exposes it,
  * optional per-op time breakdown from a jax.profiler trace
    (--trace: top ops by self time, parsed from trace.json.gz).

Usage:  python scripts/gat_bench.py --preset papers_gat3 [--trace]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9

PRESETS = {
    "products_gat5": dict(num_layers=5, dim=512, heads=4, k=150,
                          batch_size=128, dropout=0.4, dropedge=0.1,
                          aug="none", eps=1e-5),
    "papers_gat3": dict(num_layers=3, dim=800, heads=4, k=400,
                        batch_size=64, dropout=0.35, dropedge=0.1,
                        aug="hops", eps=1e-5),
    # CPU smoke shape
    "smoke_gat2": dict(num_layers=2, dim=64, heads=2, k=32,
                       batch_size=8, dropout=0.1, dropedge=0.1,
                       aug="hops", eps=1e-4),
    # the bench.py headline workload, for --trace breakdowns
    # (pass --aggr sage; graph/arch overrides reproduce bench.py exactly)
    "flagship_sage3": dict(num_layers=3, dim=256, heads=1, k=200,
                           batch_size=64, dropout=0.45, dropedge=0.05,
                           aug="hops", eps=1e-6, num_feat=500, avg_deg=10.0,
                           power_law=False, pooling="center", residue="none",
                           act="relu", graph_nodes=89_250),
}


def parse_trace(trace_dir: str, top: int = 12):
    """Sum per-op durations from a jax.profiler trace.json.gz."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    # keep complete events on TPU op lanes; bucket by op name up to the
    # first fusion-id suffix so repeated fusions aggregate
    by_op = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        if not isinstance(args, dict):
            args = {}
        # device op events carry a 'long_name' or run on a TensorCore pid
        if "long_name" not in args and "hlo_op" not in args and \
                not name.startswith(("fusion", "copy", "dynamic", "custom",
                                     "convolution", "dot", "rng", "scatter",
                                     "reduce", "all-", "transpose", "select",
                                     "while", "broadcast", "iota", "slice",
                                     "concatenate", "compare", "convert",
                                     "bitcast", "pad", "gather", "add",
                                     "multiply", "exponential", "tpu")):
            continue
        key = name.split(".")[0]
        by_op[key] = by_op.get(key, 0.0) + ev["dur"]
        total += ev["dur"]
    if not by_op:
        return None
    ranked = sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
    return {"total_us": round(total, 0),
            "top_ops_us": {k: round(v, 0) for k, v in ranked}}


def run(preset: str, n_roots: int, trace: bool, graph_nodes: int,
        compute_dtype: str = "float32", fused: bool = False,
        aggr: str = "gat", packed_adj: bool = False,
        feat_dtype: str = "float32") -> dict:
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
    g = make_synthetic_dataset(num_nodes=p.get("graph_nodes", graph_nodes),
                               avg_deg=p.get("avg_deg", 15.0),
                               num_feat=p.get("num_feat", 128),
                               num_classes=7, seed=0,
                               power_law=p.get("power_law", True))
    g.node_set[TRAIN] = g.node_set[TRAIN][:n_roots]
    cfg = {
        "data": {"transductive": True},
        "architecture": {
            "dim": p["dim"], "aggr": aggr, "heads": p["heads"],
            "loss": "softmax", "num_layers": p["num_layers"],
            "act": p.get("act", "prelu"),
            "feature_augment": p["aug"], "residue": p.get("residue", "max"),
            "pooling": p.get("pooling", "max"),
        },
        "hyperparameter": {"end": 1, "lr": 2e-4, "dropout": p["dropout"],
                           "dropedge": p["dropedge"],
                           "batch_size": p["batch_size"]},
        "sampler": [{"method": "ppr", "phase": "train", "k": [p["k"]],
                     "epsilon": [p["eps"]]}],
    }
    parsed = parse_config(cfg)
    metrics = Metrics("toy", False, "accuracy", 1)
    logger = Logger(metrics, "/tmp/bench_log", no_log=True)
    cache_dir = f"/tmp/shadow_gatbench_{preset}"
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    tr = Trainer(f"gatbench_{preset}", cache_dir, g, parsed, metrics,
                 logger, seed=0, use_device_ppr=None, prng_impl="rbg",
                 matmul_precision="bfloat16", compute_dtype=compute_dtype,
                 fused_gat=fused, packed_adj=packed_adj,
                 feat_dtype=feat_dtype)
    tr._ensure_tables(TRAIN)
    tr._ensure_caches(TRAIN)
    t_init = time.time() - t0
    scfg = tr.branches[0]["cfg"][TRAIN]
    print(f"[{preset}] init {t_init:.0f}s; n_pad={scfg.n_pad} "
          f"induction={scfg.induction}", file=sys.stderr)

    nb, roots, rows, labels, w, labels_np, w_np = tr._epoch_arrays(TRAIN)
    fn = tr._make_epoch_fn(TRAIN, nb, True)
    rng = jax.random.PRNGKey(0)
    arrays = tr._mode_arrays(TRAIN)
    pp, o = tr.params, tr.opt_state

    # Analytic per-step compute/traffic model of the dense-block GAT.
    # (XLA's compiled cost_analysis counts the scan body once and is
    # unreliable through this backend, so the MFU denominator is a hand
    # count of the einsums in nn/layers.py:GATConv.)
    B, N, f, L, H = (p["batch_size"], int(scfg.n_pad), p["dim"],
                     p["num_layers"], p["heads"])
    feat_dim = tr.dim_feat_smooth + tr.dim_label_smooth
    fwd_flops, f_in = 0.0, feat_dim
    for _l in range(L):
        if aggr == "gat":
            fwd_flops += 2.0 * B * N * f_in * f    # per-head transforms
            fwd_flops += 2.0 * B * N * N * f       # attention-weighted agg
        else:
            # sage-style: self + neigh transforms, then adj @ x
            fwd_flops += 2.0 * 2.0 * B * N * f_in * f
            fwd_flops += 2.0 * B * N * N * f_in
        f_in = f
    fwd_flops += 2.0 * B * f * tr.num_classes
    step_flops = 3.0 * fwd_flops      # bwd ~ 2x fwd (both matmul operands)
    # HBM floor per step: adjacency block + (GAT) the [B,N,N,H] score
    # tensor (written fwd, re-read + grad-written bwd) + layer activations
    sb = 2.0 if compute_dtype == "bfloat16" else 4.0
    score_bytes = 4 * sb * B * N * N * H if aggr == "gat" and not fused \
        else 0.0
    fb = 2.0 if tr.feat_dtype == "bfloat16" else 4.0
    step_bytes = (4.0 * B * N * N            # adj f32
                  + score_bytes              # scores fwd+bwd
                  + fb * B * N * feat_dim    # feature-table gather
                  + 4 * sb * B * N * f * L)  # activations fwd+bwd

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

    trace_info = None
    if trace:
        tdir = f"/tmp/gat_trace_{preset}"
        try:
            jax.profiler.start_trace(tdir)
            pp, o, losses, preds, ovf = fn(pp, o, rng, roots, rows, labels,
                                           w, arrays)
            _ = float(losses.sum())
            jax.profiler.stop_trace()
            trace_info = parse_trace(tdir)
        except Exception as exc:
            print(f"[{preset}] trace failed: {exc}", file=sys.stderr)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if key in stats:
                mem[key + "_gb"] = round(stats[key] / 2**30, 2)
    except Exception:
        pass

    out = {
        "preset": preset,
        "aggr": aggr,
        "fused_gat": fused,
        "packed_adj": packed_adj,
        "n_pad": int(scfg.n_pad),
        "batch_size": p["batch_size"],
        "steps_per_epoch": int(nb),
        "sustained_step_ms": round(t_epoch / nb * 1e3, 2),
        "sustained_subg_per_s": round(num_subg / t_epoch, 1),
        "overflow_dropped_edges": int(ovf),
        "first_epoch_incl_compile_s": round(t_first, 1),
        "memory": mem,
    }
    t_step = t_epoch / nb
    out["step_gflops_analytic"] = round(step_flops / 1e9, 1)
    out["achieved_tflop_s"] = round(step_flops / t_step / 1e12, 2)
    out["mfu_vs_bf16_peak"] = round(step_flops / t_step / V5E_BF16_PEAK, 4)
    out["step_gb_floor_analytic"] = round(step_bytes / 1e9, 2)
    out["achieved_gb_s_floor"] = round(step_bytes / t_step / 1e9, 1)
    out["hbm_bw_util_floor"] = round(step_bytes / t_step / V5E_HBM_BW, 4)
    if trace_info:
        out["trace"] = trace_info
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), action="append",
                    required=True)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--roots", type=int, default=4096)
    ap.add_argument("--graph_nodes", type=int, default=250_000)
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas masked-attention kernel "
                         "(ops/pallas_gat.py) instead of the dense "
                         "[B,N,N,H] score chain")
    ap.add_argument("--aggr", type=str, default="gat",
                    help="override the backbone aggr (e.g. sage) — the "
                         "preset only fixes the shape; PPR/subgraph "
                         "caches are shared across aggrs")
    ap.add_argument("--packed_adj", action="store_true",
                    help="fused Pallas bit-packed aggregation "
                         "(ops/pallas_packed.py; gcn/sage/gin only)")
    ap.add_argument("--feat_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="HBM feature-table storage dtype")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    out = [run(pre, args.roots, args.trace, args.graph_nodes,
               args.compute_dtype, args.fused, args.aggr, args.packed_adj,
               args.feat_dtype)
           for pre in args.preset]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

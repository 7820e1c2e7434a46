"""MEASURED reference C++ sampler throughput on this host.

Round 1's BENCH.md compared our device sampling against an
*extrapolated* python-loop estimate of the reference sampler.  With the
reference's own C++ engine now compiled (see scripts/reference_ab.py),
this script measures the real thing: `GraphSamplerEnsemble` driving
`ParallelSampler.parallel_sampler_ensemble` (OpenMP) on the same
flickr-scale synthetic ER graph as `bench.py`'s flagship workload
(89k nodes, ~890k directed edges), PPR k=200 and khop(2,10) samplers,
hops augmentation, batch protocol identical to the reference's
minibatch loop (num_subg_per_batch=500, shuffle_targets then repeated
par_sample_ensemble).

Reported numbers are sampling + subgraph extraction ONLY (no model, no
training) — the fair comparator for our "cold train throughput" row
(which additionally includes forward + backward + Adam).

Usage: python scripts/ref_sampler_bench.py [--threads 4] [--roots 8192]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))
import compat

compat.apply()

import numpy as np  # noqa: E402  (after compat)
import scipy.sparse as sp  # noqa: E402


def build_graph(num_nodes=89000, avg_deg=10, seed=0, power_law=False):
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    g = make_synthetic_dataset(num_nodes=num_nodes, avg_deg=avg_deg,
                               num_feat=8, num_classes=7, seed=seed,
                               power_law=power_law)
    n = g.indptr_full.size - 1
    adj = sp.csr_matrix(
        (np.broadcast_to(np.ones(1, dtype=bool), g.indices_full.size),
         g.indices_full, g.indptr_full), shape=(n, n))
    return adj, g


def bench_sampler(adj, cfg, aug, threads, root_ids, seed=42, epochs=2):
    """Construct a single-sampler ensemble and time epochs of batched
    sampling.  Returns (first_epoch_s, steady_epoch_s, construct_s —
    the latter includes PPR preprocessing for ppr configs)."""
    from graph_engine.frontend.samplers_ensemble import GraphSamplerEnsemble

    t0 = time.time()
    ens = GraphSamplerEnsemble(
        adj, None, [dict(cfg)], [set(aug)],
        max_num_threads=threads, num_subg_per_batch=500,
        bin_adj_files=None, seed_cpp=seed)
    preproc_s = time.time() - t0

    roots = root_ids.size
    times = []
    for _ in range(epochs):
        ens.shuffle_targets(root_ids.copy())
        got = 0
        t0 = time.time()
        while got < roots:
            out = ens.par_sample_ensemble("node")
            nb = len(out[0])
            assert nb > 0
            got += nb
        times.append(time.time() - t0)
    return times[0], times[-1], preproc_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--roots", type=int, default=8192)
    ap.add_argument("--nodes", type=int, default=89000)
    # papers100M-proxy shape: --nodes 10000000 --power_law --k 400
    # --epsilon 1e-5 --avg_deg 12 --skip_khop (cold_bench papers_nocache)
    ap.add_argument("--power_law", action="store_true")
    ap.add_argument("--avg_deg", type=float, default=10.0)
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--epsilon", type=float, default=1e-6)
    ap.add_argument("--skip_khop", action="store_true")
    args = ap.parse_args()

    work = os.path.join(REPO, "tmp", "ref_sampler_bench")
    # stale bin caches from interrupted runs trip the reference's
    # full-coverage assert (ParallelSampler.cpp:173) — start clean
    import shutil
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.join(work, "erbench", "ppr_float"), exist_ok=True)
    adj, _ = build_graph(num_nodes=args.nodes, avg_deg=args.avg_deg,
                         power_law=args.power_law)
    common = {"size_root": 1, "fix_target": True,
              "sequential_traversal": True}
    root_ids = np.random.default_rng(7).permutation(
        adj.shape[0])[:args.roots].astype(np.int64)

    out = {"host_threads": args.threads, "roots": args.roots,
           "nodes": args.nodes, "edges": int(adj.indices.size)}

    # same protocol as minibatch.py:366-390 — PPR preproc over this
    # mode's targets, then batched deterministic top-k sampling
    ppr_cfg = dict(common, method="ppr", k=args.k, epsilon=args.epsilon,
                   type_=0,
                   name_data="erbench", dir_data={"local": work, "remote": [],
                              "is_adj_changed": False},
                   is_transductive=True,
                   args_preproc={"preproc_targets": root_ids,
                                 "duplicate_modes": None})
    e0, e1, prep = bench_sampler(adj, ppr_cfg, {"hops"}, args.threads,
                                 root_ids)
    out["ppr_preproc_s"] = round(prep, 2)
    out["ppr_epoch0_s"] = round(e0, 2)
    out["ppr_subg_per_s"] = round(args.roots / e1, 1)

    if args.skip_khop:
        print(json.dumps(out))
        return
    khop_cfg = dict(common, method="khop", depth=2, budget=10)
    e0, e1, prep = bench_sampler(adj, khop_cfg, {"hops"}, args.threads,
                                 root_ids)
    out["khop_epoch0_s"] = round(e0, 2)
    out["khop_subg_per_s"] = round(args.roots / e1, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

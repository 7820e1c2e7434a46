"""Sharded PPR precompute CLI — the papers100M-scale offline pipeline.

The forward-push PPR precompute is the one host-bound stage of the
framework (everything after it runs on device).  The reference caps it
at one host's OpenMP threads (ParallelSampler.cpp:237-344); at
papers100M scale (1.2M train targets over a 111M-node graph) a single
4-core host takes ~45 min.  This tool shards the target set round-robin
across hosts:

  # on each host h of H (any order, concurrently):
  python scripts/ppr_precompute.py --data_dir DATA --dataset papers100M \
      --mode train --k 400 --epsilon 1e-5 --shard h --n_shards H
  # then once, on any host that sees all partials:
  python scripts/ppr_precompute.py ... --merge --n_shards H

Partials are .npz tables next to the final cache; --merge assembles the
standard reference-format ppr_float/{neighs,scores}_*.bin pair (readable
by BOTH frameworks) with the vectorized writer.  A single-host run
(--n_shards 1 + --merge) is the plain offline precompute.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadow_gnn_tpu import MODE2STR, TRAIN, VALID, TEST  # noqa: E402
from shadow_gnn_tpu.data import load_data  # noqa: E402
from shadow_gnn_tpu.sampling import ppr as ppr_mod  # noqa: E402

STR2MODE = {v: k for k, v in MODE2STR.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--mode", default="train",
                    choices=["train", "valid", "test"])
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--alpha", type=float, default=0.85,
                    help="config alpha (flipped internally like cpp:242)")
    ap.add_argument("--epsilon", type=float, default=1e-5)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--n_shards", type=int, default=1)
    ap.add_argument("--merge", action="store_true",
                    help="merge all shard partials into the final bins")
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--transductive", action="store_true", default=True)
    ap.add_argument("--inductive", dest="transductive", action="store_false")
    ap.add_argument("--valedges_as_input", action="store_true")
    args = ap.parse_args()

    cfg_data = {"to_undirected": False, "transductive": args.transductive,
                "valedges_as_input": args.valedges_as_input}
    raw = load_data(args.data_dir, args.dataset, cfg_data)
    mode = STR2MODE[args.mode]
    indptr, indices = raw.adj(mode)
    if raw.prediction_task == "link":
        targets = np.arange(raw.num_nodes, dtype=np.int64)
    else:
        targets = np.asarray(raw.node_set[mode], dtype=np.int64)
    variant = "wval" if args.valedges_as_input else ""
    fn, fs = ppr_mod.ppr_cache_paths(
        args.data_dir, args.dataset, args.transductive, args.mode,
        args.alpha, args.epsilon, args.k, variant=variant)

    if args.merge:
        t0 = time.time()
        ppr_mod.merge_ppr_shards(fn, fs, raw.num_nodes, args.n_shards,
                                 args.k, args.alpha, args.epsilon)
        print(f"[merge] {args.n_shards} shards -> {fn} "
              f"({time.time() - t0:.1f}s)")
        return

    sel = ppr_mod.shard_targets(targets, args.shard, args.n_shards)
    print(f"[shard {args.shard}/{args.n_shards}] {sel.size} of "
          f"{targets.size} targets, k={args.k}")
    t0 = time.time()
    try:
        from shadow_gnn_tpu.native import ppr_push_native
        tab_n, tab_s = ppr_push_native(indptr, indices, sel, args.k,
                                       1.0 - args.alpha, args.epsilon,
                                       n_threads=args.threads,
                                       as_dense=True)
    except (ImportError, OSError):
        nb, sb = ppr_mod.ppr_push_host(indptr, indices, sel, args.k,
                                       args.alpha, args.epsilon,
                                       use_native=False)
        tab_n, tab_s = ppr_mod.ppr_topk_tables(nb, sb, args.k)
    dt = time.time() - t0
    ppr_mod.write_ppr_shard(ppr_mod.ppr_shard_path(fn, args.shard,
                                                   args.n_shards),
                            sel, tab_n, tab_s, args.k, args.alpha,
                            args.epsilon)
    print(f"[shard {args.shard}/{args.n_shards}] done: "
          f"{sel.size / max(dt, 1e-9):.0f} targets/s ({dt:.1f}s)")


if __name__ == "__main__":
    main()

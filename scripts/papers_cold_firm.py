"""Firm the cold papers100M-shape number (VERDICT r4 next #7).

Round 4's 1,708 subg/s full-cold-train figure was a median of 3 epochs
with 33% spread, and its reference-engine comparator ran in a different
session.  This harness measures BOTH arms in ONE process, epoch-
interleaved (ours-epoch then reference-epoch, repeated), so tunnel and
host conditions are shared sample-for-sample:

  ours  the monolithic TRAIN scan over the 10M-node power-law proxy
        (PPR k=400 threshold 0.002, GAT-3 dim 800 heads 4, batch 64 —
        cold_bench.py's papers_nocache preset): sample + induce +
        forward + backward + Adam EVERY step, on the TPU
  ref   the UNMODIFIED reference C++ engine (GraphSamplerEnsemble ->
        ParallelSampler, OpenMP --threads) sampling + extracting the
        same-shape subgraphs on the host — sampling ONLY, no model

Reports per-arm median + spread over --epochs (default 12) and the
per-epoch raw samples.

Usage: python scripts/papers_cold_firm.py [--epochs 12] [--threads 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))


def build_ours():
    from cold_bench import PRESETS, build_trainer
    import jax
    from shadow_gnn_tpu import TRAIN

    p = PRESETS["papers_nocache"]
    os.makedirs("/tmp/shadow_cold_cache", exist_ok=True)
    tr = build_trainer(p, dict(prng_impl="rbg",
                               matmul_precision="bfloat16"))
    tr._ensure_tables(TRAIN)
    nb, roots, rows, labels, w, labels_np, w_np = tr._epoch_arrays(TRAIN)
    num_subg = int(w_np.sum())
    fn = tr._make_epoch_fn(TRAIN, nb, True)
    arrays = tr._mode_arrays(TRAIN)
    rng = jax.random.PRNGKey(0)
    state = [tr.params, tr.opt_state]

    def run_epoch():
        t0 = time.time()
        o = fn(state[0], state[1], rng, roots, rows, labels, w, arrays)
        state[:] = o[:2]
        _ = float(o[2].sum())
        return time.time() - t0

    return run_epoch, num_subg


def build_ref(threads, roots_n):
    import compat
    compat.apply()
    import scipy.sparse as sp
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from graph_engine.frontend.samplers_ensemble import GraphSamplerEnsemble

    # same proxy graph family as cold_bench papers_nocache
    g = make_synthetic_dataset(num_nodes=10_000_000, avg_deg=12.0,
                               num_feat=8, num_classes=7, seed=0,
                               power_law=True)
    n = g.indptr_full.size - 1
    adj = sp.csr_matrix(
        (np.broadcast_to(np.ones(1, dtype=bool), g.indices_full.size),
         g.indices_full, g.indptr_full), shape=(n, n))
    work = os.path.join(REPO, "tmp", "cold_firm_ref")
    import shutil
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.join(work, "papersproxy", "ppr_float"),
                exist_ok=True)
    rng = np.random.default_rng(7)
    root_ids = rng.permutation(n)[:roots_n].astype(np.int64)
    cfg = {"size_root": 1, "fix_target": True,
           "sequential_traversal": True,
           "method": "ppr", "k": 400, "epsilon": 1e-5, "threshold": 0.002,
           "type_": 0, "name_data": "papersproxy",
           "dir_data": {"local": work, "remote": [],
                        "is_adj_changed": False},
           "is_transductive": True,
           "args_preproc": {"preproc_targets": root_ids,
                            "duplicate_modes": None}}
    t0 = time.time()
    ens = GraphSamplerEnsemble(adj, None, [cfg], [{"hops"}],
                               max_num_threads=threads,
                               num_subg_per_batch=500,
                               bin_adj_files=None, seed_cpp=42)
    preproc_s = time.time() - t0

    def run_epoch():
        ens.shuffle_targets(root_ids.copy())
        got = 0
        t0 = time.time()
        while got < roots_n:
            out = ens.par_sample_ensemble("node")
            got += len(out[0])
        return time.time() - t0

    return run_epoch, preproc_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    t0 = time.time()
    ours_epoch, num_subg = build_ours()
    print(f"[firm] ours ready ({time.time() - t0:.0f}s), "
          f"{num_subg} subg/epoch", file=sys.stderr, flush=True)
    # compile epoch (not measured)
    t_compile = ours_epoch()
    t0 = time.time()
    ref_epoch, ref_preproc = build_ref(args.threads, num_subg)
    print(f"[firm] ref ready ({time.time() - t0:.0f}s, "
          f"ppr preproc {ref_preproc:.0f}s)", file=sys.stderr, flush=True)
    ref_warm = ref_epoch()

    ours_t, ref_t = [], []
    for e in range(args.epochs):
        ours_t.append(ours_epoch())
        ref_t.append(ref_epoch())
        print(f"[firm] epoch {e}: ours {ours_t[-1]:.2f}s "
              f"ref {ref_t[-1]:.2f}s", file=sys.stderr, flush=True)

    def stats(ts):
        med = float(np.median(ts))
        return {"epoch_s_median": round(med, 2),
                "spread": round((max(ts) - min(ts)) / med, 3),
                "subg_per_s": round(num_subg / med, 1),
                "raw_s": [round(t, 2) for t in ts]}

    out = {"task": "cold papers100M-shape, epoch-interleaved A/B",
           "subg_per_epoch": num_subg, "epochs": args.epochs,
           "ours_full_train": stats(ours_t),
           "ref_sampling_only": stats(ref_t),
           "ours_first_epoch_incl_compile_s": round(t_compile, 1),
           "ref_ppr_preproc_s": round(ref_preproc, 1),
           "ref_threads": args.threads,
           "ref_warm_epoch_s": round(ref_warm, 2)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

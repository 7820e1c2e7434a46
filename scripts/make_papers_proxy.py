"""Write a papers100M-like synthetic dataset in shaDow on-disk format
for the VERBATIM-config CLI run (VERDICT r4 next #8).

Shape: 10M-node power-law graph (the BENCH.md papers100M proxy shape,
hub induction active), raw feature dim 128 = ogbn-papers100M's, 172
classes, and the real dataset's SPARSE split geometry scaled 1/10
(papers100M labels ~1.4% of nodes: 1,207,179 train / 125,265 valid /
214,338 test of 111M) — most nodes carry no label, exactly like the
real set.  Community-planted features/labels so the training curve is
meaningful.  The export includes the pre-symmetrized adjacency as the
``adj_full_undirected`` cache so `to_undirected: True` configs skip the
conversion pass (the graph is generated symmetric).

Usage: python scripts/make_papers_proxy.py [--nodes 10000000]
           [--out tmp/papers_proxy_data]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shadow_gnn_tpu import TRAIN, VALID, TEST  # noqa: E402
from shadow_gnn_tpu.data.format import save_shadow_format  # noqa: E402
from shadow_gnn_tpu.data.synthetic import make_random_graph  # noqa: E402

NUM_FEAT = 128
NUM_CLASSES = 172
SPLIT_FRAC = {"train": 1_207_179 / 111_059_956,
              "valid": 125_265 / 111_059_956,
              "test": 214_338 / 111_059_956}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--avg_deg", type=float, default=12.0)
    ap.add_argument("--out", default=os.path.join(REPO, "tmp",
                                                  "papers_proxy_data"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    n = args.nodes
    t0 = time.time()
    rng = np.random.default_rng(args.seed)
    indptr, indices = make_random_graph(n, args.avg_deg, seed=args.seed,
                                        power_law=True)
    print(f"[proxy] graph {n} nodes {indices.size} edges "
          f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    comm = rng.integers(0, NUM_CLASSES, size=n).astype(np.int32)
    centers = rng.normal(size=(NUM_CLASSES, NUM_FEAT)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    feat = np.empty((n, NUM_FEAT), np.float32)
    chunk = 1_000_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        feat[lo:hi] = (0.8 * centers[comm[lo:hi]]
                       + rng.normal(size=(hi - lo, NUM_FEAT))
                       .astype(np.float32))
    print(f"[proxy] features ({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)
    # one neighborhood smoothing step ties labels to graph structure
    # (chunked over edges to bound the temporaries at 120M edges)
    onehot_agg = np.zeros((n, 8), np.float32)   # 8 coarse groups for speed
    grp = (comm % 8).astype(np.int32)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    for lo in range(0, src.size, 20_000_000):
        hi = min(lo + 20_000_000, src.size)
        np.add.at(onehot_agg, src[lo:hi], np.eye(8, dtype=np.float32)[
            grp[indices[lo:hi]]])
    del src
    deg = np.maximum(np.diff(indptr), 1)
    # nodes whose neighborhood majority group disagrees flip to it,
    # keeping a fine class within the group — labels become partly
    # structure-determined (GNN beats MLP) without a full [n, 172] pass
    maj = onehot_agg.argmax(1).astype(np.int32)
    flip = (onehot_agg.max(1) / deg > 0.5) & (grp != maj)
    comm = np.where(flip, maj + 8 * (comm // 8 % (NUM_CLASSES // 8)), comm)
    comm = np.minimum(comm, NUM_CLASSES - 1)
    label = comm.astype(np.int64)
    print(f"[proxy] labels ({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)

    n_tr = int(SPLIT_FRAC["train"] * n)
    n_va = int(SPLIT_FRAC["valid"] * n)
    n_te = int(SPLIT_FRAC["test"] * n)
    perm = rng.permutation(n)
    node_set = {
        TRAIN: np.sort(perm[:n_tr]).astype(np.int64),
        VALID: np.sort(perm[n_tr:n_tr + n_va]).astype(np.int64),
        TEST: np.sort(perm[n_tr + n_va:n_tr + n_va + n_te]).astype(np.int64),
    }
    d = save_shadow_format(args.out, "papers100M", indptr=indptr,
                           indices=indices, feat=feat, label=label,
                           node_set=node_set, write_bin=False)
    # the generator emits a symmetric CSR: register it as the
    # undirected cache so `to_undirected: True` skips the conversion
    np.save(f"{d}/adj_full_undirected.npy",
            {"indptr": indptr, "indices": indices})
    print(json.dumps({"nodes": n, "edges": int(indices.size),
                      "train": n_tr, "valid": n_va, "test": n_te,
                      "dir": d, "s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()

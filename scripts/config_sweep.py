"""Run EVERY shipped reference training yml end-to-end.

Real flickr/reddit/yelp/arxiv/products/papers100M/collab data is
unreachable in this environment (no network egress — BENCH.md documents
the failure mode), so each reference dataset gets a tiny synthetic
stand-in written in shaDow on-disk format with the matching task
structure:

    flickr / reddit          inductive node classification (adj_train)
    yelp                     inductive multilabel (sigmoid + f1)
    arxiv / products /
    papers100M               transductive node classification
    collab                   link prediction (pos/neg edge splits,
                             eval positives held out of the message graph)

Every yml under /root/reference/config_train/ is then taken VERBATIM —
architecture (aggr/heads/pooling/residue/augments/activation), sampler
stack (ppr / ppr_st / khop, k / threshold / epsilon / budget, preprocess
phases), data flags (to_undirected, transductive, norm_feat), use_label
and label_smoothen — except the three smoke-size knobs (epochs, batch
size, percent_per_epoch), and driven through the full CLI
(``python -m shadow_gnn_tpu.main``): loader (undirected caches,
inductive adj selection, feature normalization), PPR precompute + bin
caches, preprocess smoothening, jitted train epochs, window
checkpointing, final evals, FINAL SUMMARY contract, run-dir lifecycle.

This is the capability-surface sweep: a reference user's config — any
of them — drives this framework end to end.

Usage:  python scripts/config_sweep.py [--ref /root/reference]
            [--work /tmp/shadow_config_sweep] [--timeout 900] [--only PAT]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadow_gnn_tpu import TRAIN, VALID, TEST                     # noqa: E402
from shadow_gnn_tpu.data.format import save_shadow_format        # noqa: E402
from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402

# (num_classes, inductive, multilabel, task)
DATASET_SPECS = {
    "flickr": (7, True, False, "node"),
    "reddit": (10, True, False, "node"),
    "yelp": (10, True, True, "node"),
    "arxiv": (8, False, False, "node"),
    "products": (10, False, False, "node"),
    "papers100M": (12, False, False, "node"),
    "collab": (0, False, False, "link"),
    "ppa": (0, False, False, "link"),
}

NUM_NODES = 1500
AVG_DEG = 8.0
NUM_FEAT = 32


def induced_train_adj(indptr, indices, train_nodes, num_nodes):
    """adj_train = edges with BOTH endpoints in the train split, global
    node numbering kept (GraphSAINT inductive layout)."""
    is_tr = np.zeros(num_nodes, bool)
    is_tr[train_nodes] = True
    src = np.repeat(np.arange(num_nodes), np.diff(indptr))
    keep = is_tr[src] & is_tr[indices]
    new_indices = indices[keep]
    new_indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(src[keep], minlength=num_nodes))]
    ).astype(indptr.dtype)
    return new_indptr, new_indices.astype(indices.dtype)


def build_datasets(data_dir: str, names):
    for i, name in enumerate(sorted(names)):
        n_cls, inductive, multilabel, task = DATASET_SPECS[name]
        g = make_synthetic_dataset(
            num_nodes=NUM_NODES, avg_deg=AVG_DEG, num_feat=NUM_FEAT,
            num_classes=max(n_cls, 2), seed=100 + i,
            multilabel=multilabel, task=task)
        kw = {}
        if inductive:
            tr_ptr, tr_idx = induced_train_adj(
                g.indptr_full, g.indices_full, g.node_set[TRAIN], NUM_NODES)
            kw = dict(indptr_train=tr_ptr, indices_train=tr_idx)
        save_shadow_format(
            data_dir, name, indptr=g.indptr_full, indices=g.indices_full,
            feat=g.feat_full, label=g.label_full, node_set=g.node_set,
            edge_set=g.edge_set, **kw)
        print(f"[sweep] dataset {name}: {NUM_NODES} nodes, "
              f"{g.indices_full.size} directed edges, task={task}"
              + (" inductive" if inductive else ""))


def smoke_yml(src_path: str, dst_path: str):
    """Copy a reference yml with ONLY the smoke-size knobs overridden."""
    with open(src_path) as f:
        raw = yaml.safe_load(f)
    hp = raw["hyperparameter"]
    hp["end"] = 1
    hp["batch_size"] = int(min(hp.get("batch_size", 8), 8))
    hp["percent_per_epoch"] = {"train": 0.15, "valid": 0.35, "test": 0.35}
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    with open(dst_path, "w") as f:
        yaml.safe_dump(raw, f)
    return raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--work", default="/tmp/shadow_config_sweep")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--only", default=None,
                    help="substring filter on config relpaths")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the work dir (incl. dataset + PPR caches)")
    args = ap.parse_args()

    cfgs = sorted(glob.glob(f"{args.ref}/config_train/**/*.yml",
                            recursive=True))
    if args.only:
        cfgs = [c for c in cfgs if args.only in c]
    assert cfgs, "no reference configs found"

    if args.fresh and os.path.isdir(args.work):
        shutil.rmtree(args.work)
    data_dir = f"{args.work}/data"
    names = {c.split("config_train/")[1].split("/")[0] for c in cfgs}
    if not all(os.path.isfile(f"{data_dir}/{n}/split.npy") for n in names):
        os.makedirs(data_dir, exist_ok=True)
        build_datasets(data_dir, names)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = f"{args.work}/jax_cache"
    env.pop("XLA_FLAGS", None)

    results = []
    t_sweep = time.time()
    for c in cfgs:
        rel = c.split("config_train/")[1]
        dataset = rel.split("/")[0]
        dst = f"{args.work}/cfgs/{rel}"
        smoke_yml(c, dst)
        cmd = [sys.executable, "-m", "shadow_gnn_tpu.main",
               "--configs", dst, "--dataset", dataset,
               "--data_dir", data_dir, "--log_dir", f"{args.work}/logs",
               "--seed", "0", "--platform", "cpu"]
        t0 = time.time()
        try:
            r = subprocess.run(cmd, env=env, timeout=args.timeout,
                               capture_output=True, text=True,
                               cwd=os.path.dirname(os.path.dirname(
                                   os.path.abspath(__file__))))
            out = r.stdout + r.stderr
            ok = r.returncode == 0
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode(errors="replace")
                   + (e.stderr or b"").decode(errors="replace"))
            ok = False
        dt = time.time() - t0
        m = re.search(r"FINAL SUMMARY:.*", out)
        final = m.group(0) if m else None
        ok = ok and final is not None
        metric = None
        if final:
            nums = re.findall(r"(\w+)\s*=\s*([0-9.]+)", final)
            metric = {k: float(v) for k, v in nums} or final
        results.append({"config": rel, "ok": ok, "seconds": round(dt, 1),
                        "final": metric})
        status = "OK " if ok else "FAIL"
        print(f"[sweep] {status} {rel:55s} {dt:6.1f}s "
              f"{'' if ok else '-> ' + out[-800:]}")
        sys.stdout.flush()

    n_ok = sum(r["ok"] for r in results)
    print(f"\n[sweep] {n_ok}/{len(results)} reference configs ran "
          f"end-to-end in {time.time() - t_sweep:.0f}s total")
    with open(f"{args.work}/results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"[sweep] results -> {args.work}/results.json")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())

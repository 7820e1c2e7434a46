"""Head-to-head convergence A/B: this framework vs the ACTUAL reference.

Real flickr/arxiv data is unreachable in this environment (no network
egress — documented in BENCH.md), so published accuracy targets cannot
be reproduced directly.  This harness does the next-strongest thing:
run the reference implementation itself (`/root/reference/shaDow/main.py`,
unmodified, torch CPU + its own C++ ParallelSampler compiled from
`para_graph_sampler/graph_engine/backend/`) and this framework on the
IDENTICAL planted-SBM dataset written once in shaDow's on-disk format,
with the same flickr `sage_3_ppr` hyperparameters, and compare final
test accuracy seed-for-seed.

Both sides read the SAME files (`<work>/data/flickr/`): the reference
through `graph_engine.frontend.loader.load_data`, ours through
`shadow_gnn_tpu.data.loader.load_data` — which doubles as an on-disk
format interop proof.

Prereqs handled automatically:
* the reference's pybind11 sampler is compiled out-of-tree with torch's
  vendored pybind11 headers (the repo's pybind11 submodule is empty);
* `scripts/ref_shims/` supplies torch_scatter / torch_geometric / ogb
  stand-ins (not installed here); `scripts/ref_launcher.py` restores
  numpy aliases numpy 2.x removed.

Usage:
  python scripts/reference_ab.py [--seeds 3] [--epochs 30] [--nodes 20000]
         [--stage all|data|ref|ours] [--platform tpu|cpu]  # ours' backend
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_ROOT = os.environ.get("REF_ROOT", "/root/reference")
WORK = os.path.join(REPO, "tmp", "ab_workdir")
ENGINE_DIR = os.path.join(REPO, "tmp", "ref_engine")

CONFIG_YML = """\
data:
  dir:
    local: ./data
  metric:
    flickr: accuracy
algorithm:
  sampler:
    deterministic:
      - ppr
    stochastic:
      - khop
device:
  cpu:
    max_threads: 4
  software:
    os: linux
logging:
  logger:
    name: logging_base.LoggerBase
    no_server: True
  dir:
    local: ./logs
  ignore_config_name: []
"""

# flickr/vanilla/sage_3_ppr.yml hyperparameters (reference lines 1-25),
# except: transductive on the one planted graph, adjacency exported
# pre-symmetrized (to_undirected: False), end = --epochs.
TRAIN_YML = """\
data:
  to_undirected: False
  transductive: True
architecture:
  dim: 256
  aggr: sage
  loss: softmax
  num_layers: 3
  act: relu
  use_label: none
  feature_smoothen: none
  label_smoothen: none
  feature_augment: hops
  residue: none
  pooling: center
hyperparameter:
  end: {end}
  lr: 0.0005
  dropout: 0.45
  dropedge: 0.05
  batch_size: 64
sampler:
  - method: ppr
    phase: train
    k: [200]
    epsilon: [1e-6]
"""


def ensure_engine() -> str:
    so = os.path.join(
        ENGINE_DIR,
        "ParallelSampler" + subprocess.check_output(
            ["python3-config", "--extension-suffix"]).decode().strip())
    if os.path.isfile(so):
        return so
    os.makedirs(ENGINE_DIR, exist_ok=True)
    import sysconfig
    import torch
    pyinc = sysconfig.get_paths()["include"]
    tinc = os.path.join(os.path.dirname(torch.__file__), "include")
    b = os.path.join(REF_ROOT, "para_graph_sampler/graph_engine/backend")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
           f"-I{pyinc}", f"-I{tinc}",
           os.path.join(b, "ParallelSampler.cpp"),
           os.path.join(b, "Graph.cpp"), "-o", so]
    print("compiling reference ParallelSampler:", " ".join(cmd))
    subprocess.check_call(cmd)
    return so


def export_data(nodes: int) -> float:
    """Write the planted-SBM graph in shaDow on-disk format; return the
    feature-only Bayes ceiling."""
    import numpy as np
    from shadow_gnn_tpu.data.format import save_shadow_format
    from shadow_gnn_tpu.data.synthetic import make_planted_dataset

    import shutil
    d = os.path.join(WORK, "data", "flickr")
    if os.path.isdir(d):
        shutil.rmtree(d)  # stale exports/PPR bin caches must not leak
    raw, ceiling = make_planted_dataset(num_nodes=nodes, seed=0)
    num_cls = int(raw.label_full.max()) + 1
    onehot = np.zeros((nodes, num_cls), dtype=bool)
    onehot[np.arange(nodes), raw.label_full] = True
    save_shadow_format(
        os.path.join(WORK, "data"), "flickr",
        indptr=raw.indptr_full, indices=raw.indices_full,
        feat=raw.feat_full, label=onehot, node_set=raw.node_set)
    return ceiling


def run_reference(seed: int, epochs: int) -> float:
    cfg = os.path.join(WORK, "ab_sage.yml")
    env = dict(os.environ, REF_ENGINE_DIR=ENGINE_DIR, REF_ROOT=REF_ROOT,
               OMP_NUM_THREADS="4")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ref_launcher.py"),
         "--dataset", "flickr", "--configs", cfg, "--gpu", "-1",
         "--seed", str(seed), "--no_pbar"],
        cwd=WORK, env=env, capture_output=True, text=True, timeout=7200)
    out = proc.stdout
    with open(os.path.join(WORK, f"ref_seed{seed}.log"), "w") as f:
        f.write(out + "\n===STDERR===\n" + proc.stderr)
    if proc.returncode != 0:
        sys.stderr.write(out[-4000:] + "\n" + proc.stderr[-4000:])
        raise RuntimeError(f"reference run failed (seed {seed})")
    m = re.search(r"FINAL SUMMARY:.*?test accuracy ([0-9.eE+-]+)", out)
    if not m:
        sys.stderr.write(out[-4000:])
        raise RuntimeError("no FINAL SUMMARY in reference output")
    acc = float(m.group(1))
    print(f"[reference seed {seed}] test acc = {acc:.4f} "
          f"({time.time() - t0:.0f}s)")
    return acc


def run_ours(seed: int, epochs: int) -> float:
    from shadow_gnn_tpu import TEST
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    raw = load_data(os.path.join(WORK, "data"), "flickr",
                    {"to_undirected": False, "transductive": True,
                     "norm_feat": True})
    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": 256, "aggr": "sage", "loss": "softmax",
            "num_layers": 3, "act": "relu", "feature_augment": "hops",
            "residue": "none", "pooling": "center",
        },
        "hyperparameter": {
            "end": epochs, "lr": 0.0005, "dropout": 0.45,
            "dropedge": 0.05, "batch_size": 64,
        },
        "sampler": [{"method": "ppr", "phase": "train", "k": [200],
                     "epsilon": [1e-6]}],
    }
    parsed = parse_config(cfg)
    metrics = Metrics("flickr", False, "accuracy", 1)
    # dir_data points at the SHARED export: our PPR-cache discovery picks
    # up the bin files the reference's C++ engine wrote (byte-compatible
    # cache contract) — or writes ones the reference then reuses.
    tr = Trainer("flickr", os.path.join(WORK, "data"), raw, parsed, metrics,
                 Logger(metrics, f"/tmp/ab_ours_{seed}", no_log=True),
                 seed=seed)
    t0 = time.time()
    tr.train()
    acc = tr.logger.final_stats[TEST]["accuracy"]
    print(f"[ours seed {seed}] test acc = {acc:.4f} "
          f"({time.time() - t0:.0f}s)")
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed_start", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--stage", default="all",
                    choices=["all", "data", "ref", "ours"])
    ap.add_argument("--platform", default="cpu",
                    help="backend for OUR side (reference is torch cpu)")
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    with open(os.path.join(WORK, "CONFIG.yml"), "w") as f:
        f.write(CONFIG_YML)
    with open(os.path.join(WORK, "ab_sage.yml"), "w") as f:
        f.write(TRAIN_YML.format(end=args.epochs))

    out = {"task": "planted-SBM A/B vs reference", "nodes": args.nodes,
           "epochs": args.epochs, "seeds": args.seeds}
    if args.stage in ("all", "data"):
        ceiling = export_data(args.nodes)
        out["feature_only_ceiling"] = round(ceiling, 4)
        print(f"exported {WORK}/data/flickr (ceiling {ceiling:.4f})")
    if args.stage in ("all", "ref"):
        ensure_engine()
        accs = [run_reference(s, args.epochs)
                for s in range(args.seed_start,
                               args.seed_start + args.seeds)]
        import numpy as np
        out["reference_test_acc_mean"] = round(float(np.mean(accs)), 4)
        out["reference_test_acc_std"] = round(float(np.std(accs)), 4)
        out["reference_test_accs"] = [round(a, 4) for a in accs]
    if args.stage in ("all", "ours"):
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
        import numpy as np
        accs = [run_ours(s, args.epochs)
                for s in range(args.seed_start,
                               args.seed_start + args.seeds)]
        out["ours_test_acc_mean"] = round(float(np.mean(accs)), 4)
        out["ours_test_acc_std"] = round(float(np.std(accs)), 4)
        out["ours_test_accs"] = [round(a, 4) for a in accs]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

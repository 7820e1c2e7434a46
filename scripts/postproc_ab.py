"""Postprocessing A/B vs the ACTUAL reference (VERDICT r4 next #2).

The two postproc paths — Correct&Smooth (`shaDow/postproc_CnS.py`) and
subgraph-ensemble (`shaDow/postproc_ens.py`) — are oracle-tested but
were never run head-to-head against the reference's own code on
identical stored matrices.  This harness closes that:

  data  export a planted-SBM graph in shaDow format, train single-branch
        models with THIS framework (2 runs x {ppr, khop} samplers),
        store their full-graph embedding matrices (tr.embed_full) and a
        prediction matrix (tr.predict_full) — the "stored run
        artifacts" both postproc implementations consume
  ref   run the UNMODIFIED reference postproc code on those artifacts
        (subprocess scripts/postproc_ref_driver.py: postproc_ens's
        ensemble trainer with the real reference LoggerBase; C&S through
        the functional dgl + ogb.DglNodePropPredDataset shims reading
        the same on-disk export)
  ours  run shadow_gnn_tpu.postproc.{ens,cns} on the same artifacts

C&S is deterministic given the prediction matrix, so the accs must
match to float precision; the post-ensemble trainer is stochastic, so
the comparison is mean +/- std over repeats.

Usage: python scripts/postproc_ab.py [--stage all|data|ref|ours]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = os.path.join(REPO, "tmp", "postproc_ab")

ARCH = {"dim": 64, "act": "leakyrelu"}
ENS_PARAMS = dict(end=20, lr=0.01, batch_size=256, repeat=2)
CNS_CONFIGS = [dict(use_norm=False, alpha=0.8),
               dict(use_norm=True, alpha=0.9)]
SAMPLERS = {
    "ppr": [{"method": "ppr", "phase": "train", "k": [50],
             "epsilon": [1e-5]}],
    "khop": [{"method": "khop", "phase": "train", "depth": [2],
              "budget": [10]}],
}
N_RUNS = 2


def _train_one(raw, sampler, seed, epochs):
    from shadow_gnn_tpu import TRAIN, VALID, TEST
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    cfg = {
        "data": {"to_undirected": False, "transductive": True},
        "architecture": {
            "dim": ARCH["dim"], "aggr": "sage", "loss": "softmax",
            "num_layers": 3, "act": "relu", "feature_augment": "hops",
            "residue": "none", "pooling": "center",
        },
        "hyperparameter": {
            "end": epochs, "lr": 0.001, "dropout": 0.2, "dropedge": 0.0,
            "batch_size": 64,
        },
        "sampler": sampler,
    }
    metrics = Metrics("flickr", False, "accuracy", 1)
    tr = Trainer("flickr", "", raw, parse_config(cfg), metrics,
                 Logger(metrics, f"/tmp/postproc_ab_{seed}", no_log=True),
                 seed=seed)
    tr.train()
    accs = [tr.logger.final_stats[m]["accuracy"]
            for m in (TRAIN, VALID, TEST)]
    return tr, accs


def stage_data(nodes, epochs):
    import shutil
    from shadow_gnn_tpu.data.format import save_shadow_format
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.data.synthetic import make_planted_dataset

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(os.path.join(WORK, "emb"), exist_ok=True)
    raw, ceiling = make_planted_dataset(num_nodes=nodes, seed=0)
    num_cls = int(raw.label_full.max()) + 1
    onehot = np.zeros((nodes, num_cls), dtype=bool)
    onehot[np.arange(nodes), raw.label_full] = True
    save_shadow_format(os.path.join(WORK, "data"), "flickr",
                       indptr=raw.indptr_full, indices=raw.indices_full,
                       feat=raw.feat_full, label=onehot,
                       node_set=raw.node_set)
    raw = load_data(os.path.join(WORK, "data"), "flickr",
                    {"to_undirected": False, "transductive": True,
                     "norm_feat": True})

    meta = {"arch": ARCH, "runs": {}, "feature_only_ceiling": ceiling}
    for sname, sampler in SAMPLERS.items():
        meta["runs"][sname] = []
        for i in range(N_RUNS):
            tr, accs = _train_one(raw, sampler, seed=i, epochs=epochs)
            embs = tr.embed_full()
            paths = []
            for b, e in enumerate(embs):
                p = os.path.join(WORK, "emb", f"{sname}_run{i}_b{b}.npy")
                np.save(p, e)
                paths.append(p)
            meta["runs"][sname].append({"emb": paths, "accs": accs})
            if sname == "ppr" and i == 0:
                np.save(os.path.join(WORK, "pred_mat.npy"),
                        tr.predict_full())
            print(f"[data] {sname} run {i}: final accs "
                  f"{[round(a, 4) for a in accs]}", flush=True)
    np.save(os.path.join(WORK, "emb", "label.npy"), raw.label_full)
    np.savez(os.path.join(WORK, "emb", "node_set.npz"),
             **{str(m): raw.node_set[m] for m in raw.node_set})
    with open(os.path.join(WORK, "emb", "meta.json"), "w") as f:
        json.dump(meta, f)


def stage_ref():
    out = {}
    env = dict(os.environ, OMP_NUM_THREADS="4")
    for cfg in CNS_CONFIGS:
        cmd = [sys.executable,
               os.path.join(REPO, "scripts", "postproc_ref_driver.py"),
               "--part", "cns", "--work", WORK, "--alpha", str(cfg["alpha"])]
        if cfg["use_norm"]:
            cmd.append("--use_norm")
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=3600)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
            raise RuntimeError("reference C&S failed")
        out[f"cns_norm{cfg['use_norm']}_a{cfg['alpha']}"] = json.loads(
            r.stdout.strip().splitlines()[-1])
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "postproc_ref_driver.py"),
           "--part", "ens", "--work", WORK,
           "--end", str(ENS_PARAMS["end"]), "--lr", str(ENS_PARAMS["lr"]),
           "--batch_size", str(ENS_PARAMS["batch_size"]),
           "--repeat", str(ENS_PARAMS["repeat"])]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=3600)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        raise RuntimeError("reference post-ensemble failed")
    out["ens"] = json.loads(r.stdout.strip().splitlines()[-1])
    with open(os.path.join(WORK, "ref_out.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


def stage_ours():
    from shadow_gnn_tpu import TRAIN, VALID, TEST
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.postproc.cns import correct_smooth
    from shadow_gnn_tpu.postproc.ens import ensemble_multirun

    raw = load_data(os.path.join(WORK, "data"), "flickr",
                    {"to_undirected": False, "transductive": True})
    pred = np.load(os.path.join(WORK, "pred_mat.npy"))
    # the export stores one-hot labels (reference DATA_ZOO convention);
    # C&S consumes class indices
    label_idx = (raw.label_full.argmax(1) if raw.label_full.ndim == 2
                 else raw.label_full)
    out = {}
    for cfg in CNS_CONFIGS:
        acc_orig, acc_cs = correct_smooth(
            raw.indptr_full, raw.indices_full, label_idx,
            raw.node_set, [pred], cfg["use_norm"], cfg["alpha"])
        out[f"cns_norm{cfg['use_norm']}_a{cfg['alpha']}"] = {
            "acc_orig": {str(m): acc_orig[m] for m in acc_orig},
            "acc_cs": {str(m): acc_cs[m] for m in acc_cs}}

    with open(os.path.join(WORK, "emb", "meta.json")) as f:
        meta = json.load(f)
    emb_pipeline = {s: [[np.load(p) for p in r["emb"]] for r in runs]
                    for s, runs in meta["runs"].items()}
    acc = ensemble_multirun(
        raw.node_set, emb_pipeline, raw.label_full,
        {"dim": ARCH["dim"], "act": ARCH["act"], "loss": "softmax"},
        {"lr": ENS_PARAMS["lr"], "batch_size": ENS_PARAMS["batch_size"],
         "end": ENS_PARAMS["end"], "dropout": 0.0,
         "ensemble_dropout": "none"},
        repeat=ENS_PARAMS["repeat"])
    out["ens"] = {"acc_ens": {str(m): acc[m] for m in acc}}
    with open(os.path.join(WORK, "ours_out.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


def stage_compare():
    from shadow_gnn_tpu import TEST

    with open(os.path.join(WORK, "ref_out.json")) as f:
        ref = json.load(f)
    with open(os.path.join(WORK, "ours_out.json")) as f:
        ours = json.load(f)
    t = str(TEST)
    rows = []
    for k in (f"cns_norm{c['use_norm']}_a{c['alpha']}" for c in CNS_CONFIGS):
        r_orig = ref[k]["acc_orig"][t][0]
        r_cs = ref[k]["acc_cs"][t][0]
        o_orig = ours[k]["acc_orig"][t][0]
        o_cs = ours[k]["acc_cs"][t][0]
        rows.append({"workload": k, "ref_test": r_cs, "ours_test": o_cs,
                     "orig_diff": abs(r_orig - o_orig),
                     "cs_diff": abs(r_cs - o_cs)})
    re_ = np.array(ref["ens"]["acc_ens"][t], dtype=float)
    oe = np.array(ours["ens"]["acc_ens"][t], dtype=float)
    rows.append({"workload": "post-ensemble",
                 "ref_test": f"{re_.mean():.4f}+/-{re_.std():.4f}",
                 "ours_test": f"{oe.mean():.4f}+/-{oe.std():.4f}",
                 "mean_diff": abs(re_.mean() - oe.mean()),
                 "pooled_sigma": float(max(re_.std(), oe.std(), 1e-9)),
                 "within_1sigma": bool(abs(re_.mean() - oe.mean())
                                       <= max(re_.std(), oe.std()))})
    print(json.dumps({"task": "postproc A/B vs reference", "rows": rows}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "data", "ref", "ours", "compare"])
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--platform", default="cpu",
                    help="backend for OUR side ('default' = session TPU)")
    args = ap.parse_args()
    if args.platform != "default":
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.stage in ("all", "data"):
        stage_data(args.nodes, args.epochs)
    if args.stage in ("all", "ref"):
        stage_ref()
    if args.stage in ("all", "ours"):
        stage_ours()
    if args.stage in ("all", "compare"):
        stage_compare()


if __name__ == "__main__":
    main()

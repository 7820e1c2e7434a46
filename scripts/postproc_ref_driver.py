"""Reference-side process of the postproc A/B (invoked by
scripts/postproc_ab.py): runs the UNMODIFIED reference postprocessing
code — ``shaDow/postproc_ens.py`` (ensemble trainer) and
``shaDow/postproc_CnS.py`` (Correct&Smooth, through the dgl/ogb shims)
— on the STORED matrices the orchestrator wrote, and prints one JSON
line of resulting accuracies.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))
sys.path.insert(0, os.path.join(REPO, "scripts"))
import compat  # noqa: E402

compat.apply()

import numpy as np  # noqa: E402
import torch  # noqa: E402


def run_cns(work, use_norm, alpha):
    os.environ["SHADOW_AB_OGB_DATA"] = os.path.join(work, "data", "flickr")
    from shaDow.postproc_CnS import correct_smooth

    pred = torch.from_numpy(
        np.load(os.path.join(work, "pred_mat.npy")).astype(np.float32))
    # 'arxiv' routes to the shimmed DglNodePropPredDataset; the planted
    # export is what it loads (postproc_CnS.py:127-141)
    acc_orig, acc_cs = correct_smooth("arxiv", "cpu", [pred], use_norm, alpha)
    return ({str(k): v for k, v in acc_orig.items()},
            {str(k): v for k, v in acc_cs.items()})


def run_ens(work, end, lr, batch_size, repeat):
    # shaDow.globals is an import-time side-effect module: it parses
    # CONFIG.yml from the cwd and argparse from sys.argv (globals.py:14-63)
    from reference_ab import CONFIG_YML
    with open(os.path.join(work, "CONFIG.yml"), "w") as f:
        f.write(CONFIG_YML)
    os.chdir(work)
    sys.argv = [sys.argv[0], "--dataset", "flickr", "--gpu", "-1",
                "--no_pbar"]
    from graph_engine.frontend import TRAIN, VALID, TEST
    from shaDow.metric import Metrics
    from shaDow.logging_base import LoggerBase
    from shaDow.postproc_ens import ensemble_multirun

    with open(os.path.join(work, "emb", "meta.json")) as f:
        meta = json.load(f)
    emb_pipeline, acc_record = {}, {}
    for sname, runs in meta["runs"].items():
        emb_pipeline[sname] = []
        acc_record[sname] = []
        for r in runs:
            embs = [torch.from_numpy(np.load(p).astype(np.float32))
                    for p in r["emb"]]
            emb_pipeline[sname].append(embs)
            acc_record[sname].append(
                {m: {"loss": 0.0, "accuracy": a}
                 for m, a in zip((TRAIN, VALID, TEST), r["accs"])})
    label = torch.from_numpy(
        np.load(os.path.join(work, "emb", "label.npy")).astype(np.int64))
    ns = np.load(os.path.join(work, "emb", "node_set.npz"))
    node_set = {m: torch.from_numpy(ns[str(m)].astype(np.int64))
                for m in (TRAIN, VALID, TEST)}

    dir_log = os.path.join(work, "ref_ens_log")
    os.makedirs(dir_log, exist_ok=True)
    # Latent reference bug (postproc is WIP per main.py:218-220):
    # LoggerBase.reset() recreates info_epoch but leaves model_candy
    # from the previous ensemble() run, so the sliding-window assert at
    # logging_base.py:279-283 fires on the SECOND ensemble() call of
    # ensemble_multirun.  Clear the window on reset like a fresh logger
    # — this only un-crashes the loop, the training numerics are
    # untouched reference code.
    _orig_reset = LoggerBase.reset

    def _reset_fix(self):
        self.model_candy = {}
        self.optim_candy = {}
        _orig_reset(self)

    LoggerBase.reset = _reset_fix
    metrics = Metrics("flickr", False, "accuracy", 1)
    logger = LoggerBase("node", {}, dir_log, metrics,
                        {"window_size": 1, "window_aggr": "center"},
                        timestamp="ab", no_pbar=True)
    config_arch = {"dim": meta["arch"]["dim"], "act": meta["arch"]["act"],
                   "loss": "softmax"}
    config_param = {"lr": lr, "batch_size": batch_size, "end": end,
                    "dropout": 0.0, "ensemble_dropout": "none",
                    "repeat_per_emb": repeat}
    torch.manual_seed(0)
    np.random.seed(0)
    acc_orig, acc_ens = ensemble_multirun(
        node_set, emb_pipeline, label, config_arch, config_param, logger,
        "cpu", acc_record)
    return {str(k): v for k, v in acc_ens.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", required=True, choices=["ens", "cns"])
    ap.add_argument("--work", required=True)
    ap.add_argument("--use_norm", action="store_true")
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--end", type=int, default=20)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    args.work = os.path.abspath(args.work)
    if args.part == "cns":
        orig, cs = run_cns(args.work, args.use_norm, args.alpha)
        print(json.dumps({"part": "cns", "use_norm": args.use_norm,
                          "alpha": args.alpha, "acc_orig": orig,
                          "acc_cs": cs}))
    else:
        acc = run_ens(args.work, args.end, args.lr, args.batch_size,
                      args.repeat)
        print(json.dumps({"part": "ens", "acc_ens": acc}))


if __name__ == "__main__":
    main()

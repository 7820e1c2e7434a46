"""Fresh-compile cost of a full training run — VERDICT #9 closeout.

Compiles on this backend cost minutes PER PROGRAM almost independently
of program size (the round-1 epoch program is ~3k HLO ops yet takes
3-5 min), so the round-1 design — one monolithic scan program per
(mode, batch-count, train) — paid 4+ fresh compiles per run:
train-TRAIN, eval-VALID, eval-TRAIN(final), eval-TEST(final).

The chunked EVAL path (`train/pipeline.py:_chunk_fn`) collapses these
to TWO: per-mode table/cache rows are pre-gathered outside the program
(shapes stop depending on the mode's entity count), induction caps are
bucketed so VALID/TEST agree, and the label-zeroing mode flag is
traced, so ONE eval chunk program serves all three eval passes; TRAIN
keeps its monolithic scan program (chunk dispatch round-trips through
the axon tunnel measured ~7ms each — a fully-chunked train epoch was
8x slower sustained, which is why chunking applies to eval only).

This script measures both variants on identical workloads with a FRESH
compilation cache (fresh tmpdir per variant), capturing per-program
compile seconds from jax's compile logs, and reports:
  * wall-clock of trainer.train() (2 epochs + final evals),
  * number of >1s XLA compiles and their total seconds,
  * sustained train-epoch time (must match between variants).

Usage:  python scripts/compile_bench.py [--nodes 30000] [--variant both]
"""
import argparse
import json
import logging
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CompileLogCatcher(logging.Handler):
    """Collect 'Finished XLA compilation of <name> in <s> sec' events."""

    RE = re.compile(r"Finished XLA compilation of (.+?) in ([0-9.eE+-]+) sec")

    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        m = self.RE.search(record.getMessage())
        if m:
            self.events.append((m.group(1), float(m.group(2))))


CFG = {
    "data": {"to_undirected": False, "transductive": True},
    "architecture": {
        "dim": 128, "aggr": "sage", "loss": "softmax", "num_layers": 3,
        "act": "relu", "residue": "none", "pooling": "center",
    },
    "hyperparameter": {"end": 2, "lr": 0.01, "dropout": 0.1,
                       "batch_size": 64},
    "sampler": [{"method": "ppr", "phase": "train", "k": [100],
                 "epsilon": [1e-5]}],
}


def run_variant(g, data_dir, log_dir, chunk_batches):
    import jax
    jax.config.update("jax_log_compiles", True)
    cache = tempfile.mkdtemp(prefix=f"jaxcache_c{chunk_batches}_")
    jax.config.update("jax_compilation_cache_dir", cache)
    catcher = CompileLogCatcher()
    logging.getLogger("jax").addHandler(catcher)
    logging.getLogger("jax").setLevel(logging.DEBUG)

    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    parsed = parse_config(CFG)
    metrics = Metrics("cb", False, "accuracy", 1)
    logger = Logger(metrics, log_dir, no_log=True)
    tr = Trainer("cb", data_dir, g, parsed, metrics, logger,
                 seed=0, use_device_ppr=None)
    tr.chunk_batches = chunk_batches
    n0 = len(catcher.events)
    t0 = time.time()
    tr.train()
    wall = time.time() - t0
    # sustained epoch (everything compiled): one more train epoch
    t1 = time.time()
    tr.run_epoch(99, 0)                                  # TRAIN
    sustained = time.time() - t1
    big = [(n, s) for n, s in catcher.events[n0:] if s > 1.0]
    logging.getLogger("jax").removeHandler(catcher)
    return {
        "chunk_batches": chunk_batches,
        "train_wall_s": round(wall, 1),
        "sustained_train_epoch_s": round(sustained, 3),
        "big_compiles": len(big),
        "big_compile_s": round(sum(s for _, s in big), 1),
        "programs": sorted({n for n, _ in big}),
        "epoch_fns": len(tr._epoch_fns),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=30_000)
    ap.add_argument("--variant", choices=["both", "chunked", "monolithic"],
                    default="both")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    g = make_synthetic_dataset(num_nodes=args.nodes, avg_deg=10.0,
                               num_feat=128, num_classes=8, seed=7)
    data_dir = tempfile.mkdtemp(prefix="cb_data_")     # shared PPR cache
    out = []
    variants = {"both": (16, 0), "chunked": (16,), "monolithic": (0,)}
    for cb in variants[args.variant]:
        out.append(run_variant(g, data_dir,
                               tempfile.mkdtemp(prefix="cb_log_"), cb))
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps(out, indent=1))

"""CLI driver: train / inference on a shaDow-format dataset.

Task surface mirrors reference ``shaDow/main.py`` + ``globals.py``:

    python -m shadow_gnn_tpu.main --configs config_train/flickr/vanilla/sage_3_ppr.yml \
        --dataset flickr --data_dir ./data --log_dir ./logs --seed 1

    python -m shadow_gnn_tpu.main --inference_dir <run_dir> --dataset flickr ...

Differences from the reference CLI: the machine meta-config (CONFIG.yml
data/log dirs, per-dataset metric) is provided by flags with the same
defaults; GPU selection is replaced by JAX platform selection
(--platform cpu|tpu for debugging; default = whatever JAX picks).
"""
from __future__ import annotations

import argparse
import os
import random
import string
import time
import traceback


def build_argparser():
    p = argparse.ArgumentParser(description="shaDow-GNN TPU trainer")
    p.add_argument("--configs", type=str, default=None)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--no_log", action="store_true")
    p.add_argument("--inference_dir", type=str, default=None)
    p.add_argument("--inference_configs", type=str, default=None)
    p.add_argument("--is_inf_train", action="store_true")
    p.add_argument("--postproc_configs", type=str, default=None)
    p.add_argument("--postproc_dir", type=str, default=None)
    p.add_argument("--compute_complexity_only", action="store_true")
    p.add_argument("--inference_budget", type=int, default=0)
    p.add_argument("--nocache", type=str, default=None)
    p.add_argument("--log_test_convergence", type=int, default=-1)
    p.add_argument("--eval_train_every", type=int, default=1,
                   help="compute train metrics from every Nth batch only "
                        "(reference PERIOD_LOG subsampling)")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (cpu for debugging)")
    p.add_argument("--chunk_batches", type=int, default=16,
                   help="batches per compiled EVAL chunk program; one "
                        "shared program serves VALID/TEST/final-TRAIN "
                        "passes (2 compiles per run instead of 4+). "
                        "0 = monolithic per-(mode, batch-count) eval "
                        "programs (round-1 behavior)")
    p.add_argument("--device_ppr", type=str, default="auto",
                   choices=["auto", "device", "host"],
                   help="PPR precompute backend")
    p.add_argument("--matmul_precision", type=str, default=None,
                   choices=["bfloat16", "tensorfloat32", "float32"])
    p.add_argument("--prng", type=str, default=None,
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="PRNG impl for dropout/dropedge masks; rbg is "
                        "~40%% faster end-to-end on TPU")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype (params/logits stay f32)")
    p.add_argument("--feat_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="HBM feature-table storage dtype; bfloat16 "
                        "halves the resident table and gather traffic "
                        "(papers100M: 57GB -> 28GB), upcast after gather")
    p.add_argument("--packed_adj", action="store_true",
                   help="fused Pallas aggregation over the bit-packed "
                        "subgraph cache (gcn/sage/gin)")
    p.add_argument("--fused_gat", default="auto", nargs="?", const="on",
                   choices=["auto", "on", "off"],
                   help="fused Pallas masked-attention kernel for "
                        "gat/gatscat (keeps the [B,N,N,H] score chain "
                        "in VMEM); auto = on for GAT on accelerators")
    # reference-CLI compat no-ops (globals.py flags a migrating user's
    # launch scripts will pass): progress bars don't exist here, and
    # device selection is JAX-native (--platform)
    p.add_argument("--no_pbar", action="store_true",
                   help="accepted for reference-CLI compatibility (no-op)")
    p.add_argument("--gpu", type=int, default=None,
                   help="accepted for reference-CLI compatibility; use "
                        "--platform to pick the backend")
    p.add_argument("--data_tarball", type=str, default=None,
                   help="ingest a user-provided dataset archive (shaDow/"
                        "GraphSAINT/OGB-raw layout; zero egress) into "
                        "<data_dir>/<dataset>/ before loading, if the "
                        "dataset files are not already present")
    p.add_argument("--meta_config", type=str, default=None,
                   help="machine meta-config yml (reference CONFIG.yml "
                        "schema: data/logging dirs, per-dataset metric)")
    p.add_argument("--reload_model_dir", type=str, default=None)
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler device trace of one "
                        "train epoch into this dir (TensorBoard-viewable)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed (multi-host) from "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID or TPU-pod auto-detection")
    p.add_argument("--partition", type=str, default="none",
                   choices=["none", "dp", "feat", "edge"],
                   help="multi-device TRAIN epochs: dp = data-parallel "
                        "(replicated storage), feat = + row-sharded "
                        "feature table, edge = fully edge-partitioned "
                        "graph (CSR + features + PPR tables sharded, "
                        "collective row fetches)")
    p.add_argument("--partition_devices", type=int, default=0,
                   help="mesh size for --partition (0 = all devices)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        from shadow_gnn_tpu.parallel.multihost import initialize
        initialize()        # must run before the first backend use
    import numpy as np
    from shadow_gnn_tpu import TRAIN, VALID, TEST
    from shadow_gnn_tpu.data.loader import load_data
    from shadow_gnn_tpu.train.config import DATA_METRIC, parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    if args.seed >= 0:
        np.random.seed(args.seed)
        random.seed(args.seed)

    # task dispatch (reference main.py:453-463)
    if args.inference_dir is None and args.inference_configs is None \
            and args.postproc_configs is None:
        task = "train"
        config_path = args.configs
    elif args.inference_dir is not None or args.inference_configs is not None:
        task = "inference"
        if args.inference_dir is not None:
            ymls = [f for f in os.listdir(args.inference_dir)
                    if f.rsplit(".", 1)[-1] in ("yml", "yaml")]
            assert len(ymls) == 1, "inference dir must hold exactly one yml"
            config_path = f"{args.inference_dir}/{ymls[0]}"
        else:
            config_path = args.inference_configs
    else:
        task = "postproc"
        config_path = args.postproc_configs
    print(f"# {'*' * (len(task) + 15)} #\n* PERFORM {task.upper()} TASK *")

    if task == "postproc":
        from shadow_gnn_tpu.postproc.driver import run_postproc
        return run_postproc(args)

    # optional machine meta-config (reference CONFIG_TEMPLATE.yml schema)
    metric_map = dict(DATA_METRIC)
    if args.meta_config:
        import yaml as _y
        with open(args.meta_config) as _f:
            meta = _y.safe_load(_f)
        if meta.get("data", {}).get("dir", {}).get("local"):
            args.data_dir = meta["data"]["dir"]["local"]
        if meta.get("logging", {}).get("dir", {}).get("local"):
            args.log_dir = meta["logging"]["dir"]["local"]
        metric_map.update(meta.get("data", {}).get("metric", {}) or {})
        # dev-run convention: configs matching ignore patterns leave no
        # artifacts (globals.py:88-96)
        ignores = meta.get("logging", {}).get("ignore_config_name", []) or []
        base = os.path.basename(str(args.configs or ""))
        if base in ignores:
            args.no_log = True
        # pluggable logger class (reference CONFIG.yml logging.logger.name,
        # dynamically imported at globals.py:29-34); accepts
        # "module.path:ClassName" or "module.path.ClassName"
        lg = (meta.get("logging", {}).get("logger", {}) or {}).get("name")
        if lg and lg not in ("Logger", "LoggerBase"):
            import importlib
            modname, _, clsname = (lg.rpartition(":") if ":" in lg
                                   else lg.rpartition("."))
            Logger = getattr(importlib.import_module(modname), clsname)
    parsed = parse_config(config_path)
    metric_name = metric_map.get(args.dataset, "accuracy")
    metrics = Metrics(args.dataset, parsed["arch_gnn"]["loss"] == "sigmoid",
                      metric_name,
                      int(parsed["params_train"]["term_window_size"]))
    timestamp = time.strftime("%Y-%m-%d %H-%M-%S")
    tie = "".join(random.sample(string.ascii_letters + string.digits, 4))
    dir_log = (f"{args.log_dir}/{args.dataset}/running/"
               f"{timestamp.replace(' ', '_')}-RAND{tie}")
    # archive the raw training yml into the run dir (utils.py:185-201) so
    # --inference_dir / --postproc_dir can re-parse it later
    import yaml as _yaml
    with open(config_path) as _f:
        raw_cfg_dump = _yaml.safe_load(_f)
    logger = Logger(metrics, dir_log,
                    term_window_size=int(parsed["params_train"]["term_window_size"]),
                    term_window_aggr=parsed["params_train"]["term_window_aggr"],
                    timestamp=timestamp, no_log=args.no_log,
                    config_dump=raw_cfg_dump)
    if args.data_tarball:
        from shadow_gnn_tpu.data.converter import DATA_ZOO, ingest_tarball
        spec = DATA_ZOO.get(args.dataset)
        have = spec is not None and spec["ALL"].have_all_files(
            args.data_dir, args.dataset)
        if not have:
            print(f"ingesting {args.data_tarball} -> "
                  f"{args.data_dir}/{args.dataset}")
            ingest_tarball(args.data_tarball, args.dataset, args.data_dir)
    raw = load_data(args.data_dir, args.dataset, parsed["config_data"])
    use_device_ppr = {"auto": None, "device": True, "host": False}[args.device_ppr]
    trainer = Trainer(args.dataset, args.data_dir, raw, parsed, metrics,
                      logger, seed=max(args.seed, 0),
                      use_device_ppr=use_device_ppr,
                      matmul_precision=args.matmul_precision,
                      packed_adj=args.packed_adj,
                      fused_gat={"auto": None, "on": True,
                                 "off": False}[args.fused_gat],
                      compute_dtype=args.compute_dtype,
                      feat_dtype=args.feat_dtype,
                      prng_impl=args.prng,
                      partition=args.partition,
                      partition_devices=args.partition_devices)
    trainer.trace_dir = args.trace_dir
    trainer.eval_train_every = max(1, args.eval_train_every)
    trainer.chunk_batches = max(0, args.chunk_batches)
    print(f"TOTAL NUM OF PARAMS = "
          f"{sum(x.size for x in __import__('jax').tree_util.tree_leaves(trainer.params))}")
    if args.nocache:
        from shadow_gnn_tpu import STR2MODE
        modes = ((TRAIN, VALID, TEST) if args.nocache.lower() == "all"
                 else (STR2MODE[args.nocache.lower()],))
        for m in modes:
            trainer.disable_cache(m)
    if task == "train":
        try:
            if args.reload_model_dir:
                import glob as _g
                pm = sorted(_g.glob(
                    f"{args.reload_model_dir}/saved_model_*.msgpack"))
                po = sorted(_g.glob(
                    f"{args.reload_model_dir}/saved_optimizer_*.msgpack"))
                trainer.params, trainer.opt_state = Logger.load_checkpoint(
                    trainer.params, trainer.opt_state, pm[-1],
                    po[-1] if po else None)
                logger.record_loaded_checkpoint(pm[-1],
                                                po[-1] if po else None)
            trainer.train(log_test_convergence=args.log_test_convergence)
            status = "finished"
        except KeyboardInterrupt:
            status = "killed"
            print("Pressed CTRL-C! Stopping.")
        except Exception:
            status = "crashed"
            traceback.print_exc()
        finally:
            logger.end_training(status)
        return 0 if status == "finished" else 1
    elif args.compute_complexity_only:
        from shadow_gnn_tpu.train.complexity import compute_complexity
        compute_complexity(trainer, num_roots_budget=args.inference_budget)
        return 0
    else:   # inference
        import glob
        pm = sorted(glob.glob(f"{args.inference_dir}/saved_model_*.msgpack"))
        assert pm, f"no checkpoint in {args.inference_dir}"
        trainer.params, _ = Logger.load_checkpoint(trainer.params, None, pm[-1])
        modes = (TRAIN, VALID, TEST) if args.is_inf_train else (VALID, TEST)
        trainer.inference(modes)
        return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Repeat a training config N times; aggregate mean/std of final metrics.

Equivalent of reference ``scripts/train_multiple_runs.py``: launches
``shadow_gnn_tpu.main`` as subprocesses and scrapes the machine-readable
"FINAL SUMMARY:" stdout line each run emits.

    python scripts/train_multiple_runs.py --repetition 5 \
        --configs configs/flickr_sage3_ppr.yml --dataset flickr \
        --data_dir ./data --log_dir ./logs
"""
import argparse
import re
import subprocess
import sys

import numpy as np


def parse_summary(line: str):
    # "FINAL SUMMARY: best epoch 29 | train: loss=..., accuracy=... | ..."
    out = {}
    for part in line.split("|")[1:]:
        mode, kvs = part.split(":", 1)
        out[mode.strip()] = {
            k.strip(): float(v)
            for k, v in (kv.split("=") for kv in kvs.split(","))
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repetition", type=int, default=5)
    p.add_argument("--configs", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--log_dir", default="./logs")
    args, extra = p.parse_known_args()
    args.extra = extra      # unknown flags forward to shadow_gnn_tpu.main

    results = []
    for rep in range(args.repetition):
        cmd = [sys.executable, "-m", "shadow_gnn_tpu.main",
               "--configs", args.configs, "--dataset", args.dataset,
               "--data_dir", args.data_dir, "--log_dir", args.log_dir,
               "--seed", str(rep)] + args.extra
        print(f"=== run {rep + 1}/{args.repetition} ===", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        sys.stdout.write(proc.stdout[-2000:])
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            print(f"run {rep} FAILED")
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("FINAL SUMMARY:"):
                results.append(parse_summary(line))
                break
    if not results:
        print("no successful runs")
        return 1
    print(f"\n===== AGGREGATE over {len(results)} runs =====")
    for mode in ("valid", "test"):
        keys = results[0].get(mode, {}).keys()
        for k in keys:
            vals = np.array([r[mode][k] for r in results])
            print(f"{mode:>6s} {k:>10s}: avg {vals.mean():.4f}  "
                  f"std {vals.std():.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
